"""A/B the fixed-12 encoder at the 4 KiB device block size.

Variants from argv:
    stage[:cell:sseg]            single-launch staged-append kernel
    chunked:chunk:cell:sseg      chunked driver forced at 4 KiB (eq-region
                                 code-indexed scan past each recompaction)

e.g.  python scripts/ab_fixed.py stage chunked:2048:512:128 chunked:1024:512:128
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
BASE = 120 * (1 << 20)  # reference fixed-12 encode anchor, README.md:27


def main():
    enable_compilation_cache()
    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = 4096
    N = int(sys.argv[1]) if sys.argv[1:2] and sys.argv[1].isdigit() else 8192
    variants = [a for a in sys.argv[1:] if not a.isdigit()] or ["stage"]

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    blocks = np.frombuffer(data, np.uint8).reshape(N, B)
    db, dl = jnp.asarray(blocks), jnp.full((N,), B, jnp.int32)
    np.asarray(db[0, :4])
    print(f"corpus on device: {N * B / 2**20:.0f} MiB", flush=True)

    for v in variants:
        parts = v.split(":")
        if parts[0] == "stage":
            cell = int(parts[1]) if len(parts) > 1 else ep.CELL
            sseg = None if len(parts) > 2 and parts[2] == "none" else (
                int(parts[2]) if len(parts) > 2 else ep.SSEG)
            kw = dict(chunked=False, cell=cell, sseg=sseg)
        else:
            chunk, cell = int(parts[1]), int(parts[2])
            sseg = None if parts[3] == "none" else int(parts[3])
            kw = dict(chunked=True, chunk=chunk, cell=cell, sseg=sseg)

        def f(d, kw=kw):
            return ep.encode_blocks_fixed_tpu(d, dl, B, **kw)

        t0 = time.perf_counter()
        pay, ln = f(db)
        np.asarray(ln[:4])  # block_until_ready does NOT sync the relay
        tc = time.perf_counter() - t0
        pl_np, ln_np = np.asarray(pay), np.asarray(ln)
        for i in (0, N // 2, N - 1):
            exp = oracle.encode_bytes(blocks[i].tobytes(), spec)
            got = pl_np[i, : ln_np[i]].tobytes()
            assert got == exp, f"{v}: mismatch at block {i}"
        best = float("inf")
        for rep in range(3):
            dv = db.at[0, 0].set((rep + 1) % 120)
            np.asarray(dv[0, :4])
            t0 = time.perf_counter()
            out = f(dv)
            np.asarray(out[1][:4])
            best = min(best, time.perf_counter() - t0)
        rate = N * B / best
        print(f"{v:>24}: {rate/2**20:6.1f} MiB/s ({rate/BASE:.2f}x ref)  "
              f"compile {tc:.0f}s", flush=True)


if __name__ == "__main__":
    main()
