"""A/B the chunked variable encoder at the container default (64 KiB, gif7).

Uploads a few MiB through the dev relay, tiles device-side to GROUP_CHUNKED
blocks, and times encode codes + device pack HBM-to-HBM, oracle-checked on
first/middle/last blocks.  Variants from argv: "chunk:cell:sseg[:group]"
(sseg 'none' allowed), e.g.

    python scripts/ab_var64k.py 2048:512:128 4096:512:128 2048:512:64
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep, schedule as sc
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"
BASE = 70 * (1 << 20)  # reference variable-encode anchor, README.md:27


def main():
    enable_compilation_cache()
    spec = LzwSpec.gif(7)
    BV = 1 << 16
    Nv = ep.GROUP_CHUNKED

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    up_bytes = 4 << 20
    host = np.frombuffer(
        (tokyo * (up_bytes // len(tokyo) + 1))[:up_bytes], np.uint8
    ) % 128
    # 1 MiB chunks with forced syncs: one big transfer crawls on the relay.
    parts = []
    for i in range(0, up_bytes, 1 << 20):
        p = jnp.asarray(host[i : i + (1 << 20)])
        np.asarray(p[:4])
        parts.append(p)
        print(f"uploaded {(i + (1 << 20)) / 2**20:.0f} MiB", flush=True)
    dup = jnp.concatenate(parts)
    np.asarray(dup[:4])
    reps = -(-(Nv * BV) // up_bytes)
    dbv = jnp.tile(dup, reps)[: Nv * BV].reshape(Nv, BV)
    np.asarray(dbv[0, :4])
    dlv = jnp.full((Nv,), BV, jnp.int32)
    print(f"corpus on device: {Nv * BV / 2**20:.0f} MiB "
          f"(uploaded {up_bytes / 2**20:.0f})", flush=True)

    variants = sys.argv[1:] or ["2048:512:128"]
    blocks_host = np.asarray(dbv)  # for oracle checks
    for v in variants:
        parts = v.split(":")
        chunk, cell = int(parts[0]), int(parts[1])
        sseg = None if parts[2] == "none" else int(parts[2])
        group = int(parts[3]) if len(parts) > 3 else None

        # Two dispatches, NOT one jit: the fused encode+pack program
        # mis-packs on hardware (see encode_pack_variable_tpu docstring).
        # return_codes hands back the dense codes from the SAME cached
        # encode jit, so the oracle check below doesn't re-trace the
        # kernel a second time (which doubled per-variant compile cost).
        def f(d, ch=chunk, ce=cell, ss=sseg, gr=group):
            pay_, nb_, errs_, _, dense_, counts_ = ep.encode_pack_variable_tpu(
                d, dlv, spec, BV, chunk=ch, cell=ce, sseg=ss, group=gr,
                return_codes=True,
            )
            return pay_, nb_, errs_, dense_, counts_
        t0 = time.perf_counter()
        pay, nb, errs, dense, counts = f(dbv)
        np.asarray(nb[:4])
        tc = time.perf_counter() - t0
        # Oracle check on reference-exact packing (fix_eoi=False) of the
        # same dense codes, first/middle/last blocks.
        assert not np.asarray(errs).any()
        idxs = np.array([0, Nv // 2, Nv - 1])
        pj, lj = sc.pack_variable(
            np.asarray(dense[jnp.asarray(idxs)]),
            np.asarray(counts[jnp.asarray(idxs)]), spec, fix_eoi=False,
        )
        for row, i in enumerate(idxs):
            exp = oracle.encode_bytes(blocks_host[i].tobytes(), spec)
            got = pj[row, : lj[row]].tobytes()
            assert got == exp, f"{v}: wire mismatch at block {i}"
        best = float("inf")
        for rep in range(2):
            dvv = dbv.at[0, 0].set((rep + 1) % 120)
            np.asarray(dvv[0, :4])
            t0 = time.perf_counter()
            pay, nb, _, _, _ = f(dvv)
            np.asarray(nb[:4])
            best = min(best, time.perf_counter() - t0)
        rate = Nv * BV / best
        print(f"chunk={chunk:>4} cell={cell:>4} sseg={str(sseg):>5} "
              f"group={group}: {rate/2**20:6.1f} MiB/s "
              f"({rate/BASE:.2f}x ref)  compile {tc:.0f}s", flush=True)


if __name__ == "__main__":
    main()
