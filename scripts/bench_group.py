"""A/B the lockstep width (group = blocks per kernel instance)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def run(group, cell, N=4096, B=4096, compact=False):
    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    base = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)
    f = jax.jit(lambda b, l: encode_pallas.encode_blocks_fixed_tpu(
        b, l, B, group=group, cell=cell, compact=compact))
    dl = jnp.asarray(lens)
    try:
        out = f(jnp.asarray(base), dl)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"group={group:5d} cell={cell:4d} compact={compact}: FAILED "
              f"({type(e).__name__}: {str(e)[:120]})", flush=True)
        return
    best = float("inf")
    for rep in range(3):
        var = base.copy(); var[0, 0] = rep + 1
        db = jnp.asarray(var); jax.block_until_ready(db)
        t0 = time.perf_counter()
        bufs, lengths = f(db, dl)
        np.asarray(lengths)
        best = min(best, time.perf_counter() - t0)
    print(f"group={group:5d} cell={cell:4d} compact={compact}: "
          f"{N*B/best/2**20:6.0f} MiB/s ({best*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run(2048, 512, N=8192, compact="bucket")
    run(2048, 512, N=8192, compact=False)
