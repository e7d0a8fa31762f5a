"""Bench-scale pipeline profile with cache-defeating varied inputs."""

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


def main():
    print("devices:", jax.devices(), flush=True)
    B, N = 4096, 16384  # 64 MiB
    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    base = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)
    f = jax.jit(lambda b, l: encode_pallas.encode_blocks_fixed_tpu(b, l, B))

    # compile
    db = jnp.asarray(base)
    dl = jnp.asarray(lens)
    out = f(db, dl)
    jax.block_until_ready(out)
    print("compiled", flush=True)

    for rep in range(3):
        var = base.copy()
        var[:, 0] = rep + 1  # defeat any result caching
        t0 = time.perf_counter()
        db = jnp.asarray(var)
        jax.block_until_ready(db)
        t1 = time.perf_counter()
        bufs, lengths = f(db, dl)
        jax.block_until_ready((bufs, lengths))
        t2 = time.perf_counter()
        pb = np.asarray(bufs)
        ln = np.asarray(lengths)
        t3 = time.perf_counter()
        payloads = [pb[i, : ln[i]].tobytes() for i in range(N)]
        cont = b"".join(payloads)
        t4 = time.perf_counter()
        total = t4 - t0
        print(
            f"rep{rep}: H2D {t1-t0:.3f}s  device {t2-t1:.3f}s  "
            f"D2H {t3-t2:.3f}s  host {t4-t3:.3f}s  total {total:.3f}s  "
            f"= {N*B/total/2**20:.0f} MiB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
