"""Chip diagnostics for the stride-2 pass 2: fine seg sweep + stage-skip
cost attribution (bound_mode 3 = skip word scan, 4 = skip pair scan —
outputs WRONG, timing only).

Usage: python scripts/ab_stride2_diag.py [image|text] [N]
"""

from __future__ import annotations

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
    pay = pay[:, : int(np.asarray(jnp.max(nb)))]
    counts, strict, sched_arr, S = dp.prepare_variable_decode(
        np.asarray(pay), np.asarray(nb), spec
    )
    assert strict.all()
    cdev = jnp.asarray(counts.astype(np.int32))
    db_np = np.asarray(db)
    print(f"# {corpus}: N={N}, S={S}", flush=True)

    cases = [
        dict(seg2=64),
        dict(seg2=32),
        dict(seg2=16),
        dict(seg2=64, bound_mode=3),   # skip word scan (WRONG results)
        dict(seg2=64, bound_mode=4),   # skip pair scan (WRONG results)
        dict(seg2=32, bound_mode=3),
        dict(seg2=32, bound_mode=4),
    ]
    for kw in cases:
        diag = kw.get("bound_mode", 0) != 0
        try:
            def run(p, c):
                return dp.decode_variable_epochs_run(
                    p, c, sched_arr, spec, S, B, stride2=True, **kw
                )
            out, tot, errs, _, ok = run(pay, cdev)
            if not diag:
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
                np.asarray(out[0, :4])
                best = min(best, time.perf_counter() - t0)
                if not diag:
                    assert (np.asarray(out)
                            == np.roll(db_np, k, axis=0)).all()
            rate = N * B / best / 2**20
            print(f"{kw}: {best:.3f}s = {rate:.1f} MiB/s"
                  + ("  [WRONG-OUTPUT DIAG]" if diag else ""), flush=True)
        except Exception as e:
            print(f"{kw}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
