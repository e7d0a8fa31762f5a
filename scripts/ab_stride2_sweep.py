"""Chip sweep: stride-2 decode stage times across kernel knobs.

Reports pass-1 time (device unpack + tables) and whole-decode time for
knob combos, all rows byte-checked.  Usage:
  python scripts/ab_stride2_sweep.py [image|text] [N]
"""

from __future__ import annotations

import itertools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "image"
    import jax
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep
    from lzw_tpu.spec import LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    spec = LzwSpec.gif(7)
    B = 1 << 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else ep.GROUP_CHUNKED

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

    # --- pass-1 alone at group 1024 vs 2048 ------------------------------
    for g1 in (1024, 2048):
        try:
            def p1(p, c):
                return dp._variable_pass1_from_payloads(
                    p, c, jnp.asarray(sched_arr), spec, S, B, False, g1,
                    dp.CELL, 128, pair2=True,
                )
            w, st, pr, dn, ok = p1(pay, cdev)
            np.asarray(st[:2, :2])
            best = float("inf")
            for rep in range(2):
                pv = jnp.roll(pay, rep + 1, axis=0)
                cv = jnp.roll(cdev, rep + 1)
                np.asarray(pv[0, :4])
                t0 = time.perf_counter()
                w, st, pr, dn, ok = p1(pv, cv)
                np.asarray(st[:2, :2])
                best = min(best, time.perf_counter() - t0)
            print(f"pass1 group={g1}: {best:.3f}s", flush=True)
        except Exception as e:
            print(f"pass1 group={g1}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- whole decode across pass-2 knobs --------------------------------
    combos = [
        dict(),  # defaults (cell2=512, seg2=128, group2=2048->capped)
        dict(seg2=256),
        dict(seg2=64),
        dict(cell2=1024),
        dict(cell2=1024, seg2=256),
        dict(group2=1024),
        dict(group=2048),
    ]
    for kw in combos:
        try:
            def run(p, c):
                return dp.decode_variable_epochs_run(
                    p, c, sched_arr, spec, S, B, stride2=True, **kw
                )
            out, tot, errs, _, ok = run(pay, cdev)
            assert not np.asarray(errs).any()
            assert (np.asarray(out) == db_np).all(), "byte check"
            best = float("inf")
            for rep in range(2):
                k = rep + 1
                pv = jnp.roll(pay, k, axis=0)
                cv = jnp.roll(cdev, k)
                np.asarray(pv[0, :4])
                t0 = time.perf_counter()
                out, tot, errs, _, ok = run(pv, cv)
                np.asarray(tot[:4])
                dt = time.perf_counter() - t0
                best = min(best, dt)
                assert (np.asarray(out) == np.roll(db_np, k, axis=0)).all()
            rate = N * B / best / 2**20
            print(f"decode {kw or 'defaults'}: {best:.3f}s = "
                  f"{rate:.1f} MiB/s", flush=True)
        except Exception as e:
            print(f"decode {kw}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
