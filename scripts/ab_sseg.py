"""A/B the stage-scan segment bound (sseg) on chip: fixed-12 @ 4 KiB.

Measures the staged-append kernel with the stage sweep bounded by the step
index at several segment sizes, input-perturbed per rep (the dev relay
caches identical executions)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import Endianness, LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    enable_compilation_cache()
    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = ep.BLOCK_SIZE
    MB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = (MB << 20) // B
    N = (N // ep.GROUP) * ep.GROUP

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    blocks = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)
    db = jnp.asarray(blocks)
    np.asarray(db[0, :4])
    dl = jnp.asarray(lens)
    print(f"corpus on device: {N*B/2**20:.0f} MiB", flush=True)

    variants = [(ep.CELL, None), (ep.CELL, 256), (ep.CELL, 128),
                (ep.CELL, 64)]
    if len(sys.argv) > 2:  # "cell:sseg,cell:sseg,..." (sseg 'none' allowed)
        variants = []
        for v in sys.argv[2].split(","):
            c, s = v.split(":")
            variants.append((int(c), None if s == "none" else int(s)))
    for cell, sseg in variants:
        f = jax.jit(lambda b, l, c=cell, s=sseg: ep.encode_blocks_fixed_tpu(
            b, l, B, compact="stage", cell=c, sseg=s))
        t0 = time.perf_counter()
        pay, ln = f(db, dl)
        np.asarray(ln[:4])
        tc = time.perf_counter() - t0
        # Spot-check first / middle / last blocks against the oracle (a
        # variant that corrupts later blocks or group boundaries must fail).
        for i in (0, N // 2, N - 1):
            exp = oracle.encode_bytes(blocks[i].tobytes(), spec)
            got = np.asarray(pay[i])[: int(np.asarray(ln[i]))].tobytes()
            assert got == exp, f"sseg={sseg} mismatch at block {i}"
        best = float("inf")
        for rep in range(3):
            dvar = db.at[0, 0].set((rep + 1) % 251)
            np.asarray(dvar[0, :4])
            t0 = time.perf_counter()
            pay, ln = f(dvar, dl)
            np.asarray(ln[:4])
            best = min(best, time.perf_counter() - t0)
        rate = N * B / best
        print(f"cell={cell:>4} sseg={str(sseg):>5}: {rate/2**20:6.1f} MiB/s "
              f"({rate/(120*2**20):.2f}x ref)  compile {tc:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
