"""Guarded retirement A/B for the lax.map super-group serializations
(EVOLUTION.md miscompile #1 containment; VERDICT r4 #6).

For the chunked encoder and the pass-2 walker, run the SAME workload with
SUPER_GROUP_MAX = 2 (the shipped containment) and = 99 (direct G >= 3
compilation), compare outputs byte-for-byte, and time both.  jit caches
are cleared between variants because the knob is read at trace time.

Usage: python scripts/ab_supergroup.py
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
    from lzw_tpu.spec import LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    spec = LzwSpec.gif(7)
    B = 1 << 16
    N = 2048
    group = 512  # G = N/group = 4 >= 3: the contained shape
    base = load_tokyo_pixels("test-assets/tokyo_128_colors.png")
    src = np.frombuffer(bytes(b % 128 for b in base), np.uint8)
    up = jnp.asarray(src)
    np.asarray(up[:4])
    db = jnp.tile(up, -(-(N * B) // len(src)))[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)

    results = {}
    for gmax in (2, 99):
        ep.SUPER_GROUP_MAX = gmax
        dp.SUPER_GROUP_MAX = gmax
        jax.clear_caches()

        # --- chunked encode at G=4 ---------------------------------------
        dense, counts, errs, _ = ep.encode_blocks_variable_codes_tpu(
            db, dl, spec, B, group=group
        )
        cnp = np.asarray(counts)
        dnp = np.asarray(dense)
        assert not np.asarray(errs).any()
        best_e = float("inf")
        for rep in range(2):
            dv = db.at[0, 0].set((rep + 1) % 120)
            np.asarray(dv[0, :4])
            t0 = time.perf_counter()
            _, c2, _, _ = ep.encode_blocks_variable_codes_tpu(
                dv, dl, spec, B, group=group
            )
            np.asarray(c2[:4])
            best_e = min(best_e, time.perf_counter() - t0)

        # --- pass-2 walker at G=4 (pooled batch 4096, group2 1024) -------
        pay, nb, _, _ = ep.encode_pack_variable_tpu(db, dl, spec, B)
        np.asarray(nb[:4])
        pay = pay[:, : int(np.asarray(jnp.max(nb)))]
        counts2, strict, sched_arr, S = dp.prepare_variable_decode(
            np.asarray(pay), np.asarray(nb), spec
        )
        assert strict.all()
        cdev = jnp.asarray(counts2.astype(np.int32))
        out, tot, errs2, _, ok = dp.decode_variable_epochs_pooled(
            pay, cdev, sched_arr, spec, S, B, group2=1024, batch=4096
        )
        onp = np.asarray(out)
        assert not np.asarray(errs2).any()
        assert (onp == np.asarray(db)).all(), f"decode bytes gmax={gmax}"
        best_d = float("inf")
        for rep in range(2):
            pv = jnp.roll(pay, rep + 1, axis=0)
            cv = jnp.roll(cdev, rep + 1)
            np.asarray(pv[0, :4])
            t0 = time.perf_counter()
            out, tot, errs2, _, ok = dp.decode_variable_epochs_pooled(
                pv, cv, sched_arr, spec, S, B, group2=1024, batch=4096
            )
            np.asarray(out[0, :4])
            best_d = min(best_d, time.perf_counter() - t0)

        results[gmax] = (dnp, cnp, onp, best_e, best_d)
        print(f"gmax={gmax}: encode {best_e:.3f}s decode {best_d:.3f}s",
              flush=True)

    d2, c2_, o2, e2, t2 = results[2]
    d9, c9, o9, e9, t9 = results[99]
    print("encode codes identical:", (d2 == d9).all() and (c2_ == c9).all(),
          flush=True)
    print("decode bytes identical:", (o2 == o9).all(), flush=True)
    print(f"speed: encode {e2:.3f} -> {e9:.3f}s; decode {t2:.3f} -> "
          f"{t9:.3f}s", flush=True)


if __name__ == "__main__":
    main()
