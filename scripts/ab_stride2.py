"""Chip A/B: stride-2 vs stride-1 pass 2 for the all-device 64 KiB variable
decode (EVOLUTION.md r4 "remaining decode levers": ~1.8x estimate).

Every row of every timed rep is byte-checked against the source (the r4
shift/flip find showed sparse corruption hides from single-row asserts).

Usage: python scripts/ab_stride2.py [image|text] [N_blocks]
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
    print(f"# corpus {corpus}: {N} x 64 KiB on device", flush=True)

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
    print(f"# encoded: S={S}, pb={pb}", flush=True)

    for stride2 in (True, False):
        def run(p, c):
            out, tot, errs, _, ok = dp.decode_variable_epochs_run(
                p, c, sched_arr, spec, S, B, stride2=stride2
            )
            return out, tot, errs

        out, tot, errs = run(pay, cdev)
        assert not np.asarray(errs).any()
        assert (np.asarray(out) == db_np).all(), "byte check (unrolled)"
        best = float("inf")
        for rep in range(3):
            k = rep + 1
            pv = jnp.roll(pay, k, axis=0)
            cv = jnp.roll(cdev, k)
            np.asarray(pv[0, :4])
            t0 = time.perf_counter()
            out, tot, errs = run(pv, cv)
            np.asarray(tot[:4])
            dt = time.perf_counter() - t0
            best = min(best, dt)
            o = np.asarray(out)
            assert (o == np.roll(db_np, k, axis=0)).all(), \
                f"byte check rep {rep}"
            print(f"#   stride2={stride2} rep{rep}: {dt:.3f}s", flush=True)
        rate = N * B / best / 2**20
        print(f"stride2={stride2}: best {best:.3f}s = {rate:.1f} MiB/s "
              f"({rate / 200:.2f}x ref)", flush=True)


if __name__ == "__main__":
    main()
