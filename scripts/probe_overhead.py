"""Locate the encode kernel's per-step overhead floor on chip.

Three corpora stress the scan differently at identical step counts:
  zeros  — table stays ~2 entries; scan ~1 segment  -> per-step floor
  tokyo  — typical live table (~1.1k rows)          -> shipped rate
  random — table saturates (~3.8k rows)             -> scan ceiling
rate(corpus) vs scanned-rows(corpus) separates the scan term (K/rows) from
the fixed per-step cost — the number that says whether further scan-op
tricks can pay at 4 KiB.
"""

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
    MB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = ((MB << 20) // B // ep.GROUP) * ep.GROUP

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    rng = np.random.default_rng(0)
    corpora = {
        "zeros": np.zeros(N * B, np.uint8),
        "tokyo": np.frombuffer(
            (tokyo * (N * B // len(tokyo) + 1))[: N * B], np.uint8
        ),
        "random": rng.integers(0, 256, size=N * B).astype(np.uint8),
    }
    dl = jnp.asarray(np.full(N, B, np.int32))
    f = jax.jit(lambda b, l: ep.encode_blocks_fixed_tpu(
        b, l, B, compact="stage"))

    for name, flat in corpora.items():
        blocks = flat.reshape(N, B)
        db = jnp.asarray(blocks)
        np.asarray(db[0, :4])
        t0 = time.perf_counter()
        pay, ln = f(db, dl)
        np.asarray(ln[:4])
        tc = time.perf_counter() - t0
        exp = oracle.encode_bytes(blocks[0].tobytes(), spec)
        got = np.asarray(pay[0])[: int(np.asarray(ln[0]))].tobytes()
        assert got == exp, f"{name}: wire mismatch"
        best = float("inf")
        for rep in range(3):
            dv = db.at[0, 0].set((rep + 1) % 251)
            np.asarray(dv[0, :4])
            t0 = time.perf_counter()
            pay, ln = f(dv, dl)
            np.asarray(ln[:4])
            best = min(best, time.perf_counter() - t0)
        rate = N * B / best
        steps = (N // ep.GROUP) * (B + ep.CELL)
        print(f"{name:>6}: {rate/2**20:6.1f} MiB/s   "
              f"{best/steps*1e6:6.2f} us/step  compile {tc:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
