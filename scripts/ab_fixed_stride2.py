"""Chip A/B: fixed-12 all-device decode — stride-1 vs stride-2 pass 2,
plus a sorted-lane variant (blocks ordered by code count so lockstep word
trajectories align; totals are uniform 4 KiB so sorting is free to undo).

Every timed rep byte-checks every row.  Usage:
  python scripts/ab_fixed_stride2.py [N_blocks]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep
    from lzw_tpu.spec import Endianness, LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = ep.BLOCK_SIZE
    N = int(sys.argv[1]) if len(sys.argv) > 1 else dp.GROUP

    base = load_tokyo_pixels("test-assets/tokyo_128_colors.png")
    src = np.frombuffer(base, np.uint8)
    up = jnp.asarray(src)
    np.asarray(up[:4])
    db = jnp.tile(up, -(-(N * B) // len(src)))[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)
    bufs, lens = jax.jit(
        lambda b, l: ep.encode_blocks_fixed_tpu(b, l, B, compact="stage")
    )(db, dl)
    np.asarray(lens[:4])
    pb_act = int(np.asarray(jnp.max(lens)))
    PB3 = ((pb_act + 2) // 3) * 3
    pay = bufs[:, :PB3]
    db_np = np.asarray(db)
    print(f"# fixed: N={N}, PB={PB3}", flush=True)

    def run_s1(p, nb):
        w, nc, tot, de, dec_, (pair, codes) = dp.decode_pass1_fixed_tpu(
            p, nb, B, little=True
        )
        out = dp.decode_pass2_device(codes, pair, nc, tot, B)
        return out, tot, de

    def run_s2(p, nb, seg2=32):
        w, nc, tot, de, dec_, (pair, codes) = dp.decode_pass1_fixed_tpu(
            p, nb, B, little=True, pair2=True
        )
        out = dp.decode_pass2_stride2(
            codes, pair, nc, tot, B, seg=seg2, first_free=256
        )
        return out, tot, de

    def run_s2_sorted(p, nb, seg2=32):
        order = jnp.argsort(nb).astype(jnp.int32)
        inv = jnp.argsort(order).astype(jnp.int32)
        ps = jnp.take(p, order, axis=0)
        nbs = jnp.take(nb, order)
        w, nc, tot, de, dec_, (pair, codes) = dp.decode_pass1_fixed_tpu(
            ps, nbs, B, little=True, pair2=True
        )
        out = dp.decode_pass2_stride2(
            codes, pair, nc, tot, B, seg=seg2, first_free=256
        )
        return (jnp.take(out, inv, axis=0), jnp.take(tot, inv),
                jnp.take(de, inv))

    for name, fn in (("stride1", run_s1), ("stride2", run_s2),
                     ("stride2+sorted", run_s2_sorted)):
        try:
            out, tot, de = fn(pay, lens)
            assert not np.asarray(de).any()
            assert (np.asarray(out) == db_np).all(), "byte check"
            best = float("inf")
            for rep in range(3):
                k = rep + 1
                pv = jnp.roll(pay, k, axis=0)
                lv = jnp.roll(lens, k)
                np.asarray(pv[0, :4])
                t0 = time.perf_counter()
                out, tot, de = fn(pv, lv)
                np.asarray(out[0, :4])
                best = min(best, time.perf_counter() - t0)
                assert (np.asarray(out) == np.roll(db_np, k, axis=0)).all()
            rate = N * B / best / 2**20
            print(f"fixed decode {name}: {best:.3f}s = {rate:.1f} MiB/s "
                  f"({rate/210:.2f}x ref)", flush=True)
        except Exception as e:
            print(f"fixed decode {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
