"""Measure the scan match-test form: "full" (d>=0)&(d<dyn), "drop_ge"
(d<dyn alone — negative deltas lose the running max), or "maxval" (3
ops/row: max table value below tbase+dyn, range-validated once per step on
the accumulator).  All variants run the ONE shared `_stage_step_fn`
implementation (its ``range_test`` parameter), so the A/B can never drift
from the real kernel; the partial is applied before any trace so the
persistent cache keys on distinct HLO.

Usage: python scripts/ab_rangetest.py [MB] [full|drop|maxval]
"""

import functools
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

FORM = sys.argv[2] if len(sys.argv) > 2 else "full"
FORM = {"drop": "drop_ge"}.get(FORM, FORM)

ep._stage_step_fn = functools.partial(ep._stage_step_fn, range_test=FORM)


def check_blocks(pay, ln, blocks, spec):
    """Oracle spot-check on first / middle / last blocks (a corruption that
    only shows up late in the batch or at group boundaries must fail)."""
    n = blocks.shape[0]
    for i in (0, n // 2, n - 1):
        exp = oracle.encode_bytes(blocks[i].tobytes(), spec)
        got = np.asarray(pay[i])[: int(np.asarray(ln[i]))].tobytes()
        assert got == exp, f"wire mismatch at block {i}"


def main():
    enable_compilation_cache()
    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = ep.BLOCK_SIZE
    MB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = ((MB << 20) // B // ep.GROUP) * ep.GROUP

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    blocks = np.frombuffer(data, np.uint8).reshape(N, B)
    db = jnp.asarray(blocks)
    np.asarray(db[0, :4])
    dl = jnp.asarray(np.full(N, B, np.int32))

    f = jax.jit(lambda b, l: ep.encode_blocks_fixed_tpu(
        b, l, B, compact="stage"))
    t0 = time.perf_counter()
    pay, ln = f(db, dl)
    np.asarray(ln[:4])
    tc = time.perf_counter() - t0
    check_blocks(pay, ln, blocks, spec)
    best = float("inf")
    for rep in range(3):
        dv = db.at[0, 0].set((rep + 1) % 251)
        np.asarray(dv[0, :4])
        t0 = time.perf_counter()
        pay, ln = f(dv, dl)
        np.asarray(ln[:4])
        best = min(best, time.perf_counter() - t0)
    rate = N * B / best
    tag = f"{FORM:7}"
    print(f"{tag}: {rate/2**20:6.1f} MiB/s ({rate/(120*2**20):.2f}x) "
          f"compile {tc:.0f}s", flush=True)


if __name__ == "__main__":
    main()
