"""Chip sweep: sorted-pool stride-2 decode knobs (the r5 all-device path).

Times pass 1 alone and the whole pooled decode across knob combos on the
64 KiB container shape, every row byte-checked.  Usage:
  python scripts/ab_pooled_sweep.py [image|text] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "image"
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep
    from lzw_tpu.spec import LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    spec = LzwSpec.gif(7)
    B = 1 << 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    if corpus == "image":
        base = load_tokyo_pixels("test-assets/tokyo_128_colors.png")
        src = np.frombuffer(bytes(b % 128 for b in base), np.uint8)
    else:
        txt = open("test-assets/lorem_ipsum.txt", "rb").read()
        src = np.frombuffer(bytes(b % 128 for b in txt), np.uint8)

    up = jnp.asarray(src)
    np.asarray(up[:4])
    db = jnp.tile(up, -(-(N * B) // len(src)))[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)
    pay, nb, _, _ = ep.encode_pack_variable_tpu(db, dl, spec, B)
    np.asarray(nb[:4])
    pb = int(np.asarray(jnp.max(nb)))
    pay = pay[:, :pb]
    counts, strict, sched_arr, S = dp.prepare_variable_decode(
        np.asarray(pay), np.asarray(nb), spec
    )
    assert strict.all()
    cdev = jnp.asarray(counts.astype(np.int32))
    db_np = np.asarray(db)
    print(f"# {corpus}: N={N}, S={S}", flush=True)

    def timed(fn, check):
        out = fn(pay, cdev)
        check(out, 0)
        best = float("inf")
        for rep in range(2):
            k = rep + 1
            pv = jnp.roll(pay, k, axis=0)
            cv = jnp.roll(cdev, k)
            np.asarray(pv[0, :4])
            t0 = time.perf_counter()
            out = fn(pv, cv)
            dt_done = check(out, k)
            best = min(best, dt_done - t0)
        return best

    # --- pass 1 alone (the pooled driver's first stage) -------------------
    for g1, seg1 in ((2048, 128), (2048, 64), (2048, 256), (1024, 128)):
        try:
            def p1(p, c, g1=g1, seg1=seg1):
                return dp._variable_pass1_from_payloads(
                    p, c, jnp.asarray(sched_arr), spec, S, B, False, g1,
                    dp.CELL, seg1, pair2=True,
                )

            def chk(out, k):
                np.asarray(out[1][:2, :2])
                return time.perf_counter()

            best = timed(p1, chk)
            print(f"pass1 group={g1} seg={seg1}: {best:.3f}s", flush=True)
        except Exception as e:
            print(f"pass1 group={g1} seg={seg1}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # --- whole pooled decode across pass-2 knobs ---------------------------
    combos = [
        dict(),  # shipped defaults (seg2=32, group2=1024, batch=2048)
        dict(seg2=16),
        dict(seg2=64),
        dict(batch=1024),
        dict(batch=4096),
        dict(group2=512),
        dict(group2=2048),
        dict(seg=64),
        dict(seg2=16, batch=1024),
    ]
    for kw in combos:
        try:
            def run(p, c, kw=kw):
                return dp.decode_variable_epochs_pooled(
                    p, c, sched_arr, spec, S, B, **kw
                )

            def chk(out, k):
                o, tot, errs, _, ok = out
                np.asarray(tot[:4])
                dt = time.perf_counter()
                assert not np.asarray(errs).any()
                assert (np.asarray(o) == np.roll(db_np, k, axis=0)).all(), \
                    "byte check"
                return dt

            best = timed(run, chk)
            rate = N * B / best / 2**20
            print(f"pooled {kw or 'defaults'}: {best:.3f}s = "
                  f"{rate:.1f} MiB/s", flush=True)
        except Exception as e:
            print(f"pooled {kw}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
