"""On-chip probe: 64 KiB device decode at various pass-2 groupings,
with round-trip check + HBM-to-HBM timing.
Usage: probe_dec64k_text.py [--tokyo] [group2 ...]"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    enable_compilation_cache()
    spec = LzwSpec.gif(7)
    B = 1 << 16
    N = ep.GROUP_CHUNKED
    if "--tokyo" in sys.argv:
        sys.argv.remove("--tokyo")
        from lzw_tpu.utils.corpus import load_tokyo_pixels

        data = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    else:
        data = (ASSETS / "lorem_ipsum.txt").read_bytes()
    base = np.frombuffer(bytes(b % 128 for b in data), np.uint8)
    dup = jnp.asarray(base)
    np.asarray(dup[:4])
    reps_t = -(-(N * B) // len(base))
    db = jnp.tile(dup, reps_t)[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)

    # Two dispatches, NOT one jit (see encode_pack_variable_tpu docstring).
    pay, nb, _, _ = ep.encode_pack_variable_tpu(db, dl, spec, B)
    pb = int(np.asarray(jnp.max(nb)))
    pay = pay[:, :pb]
    nb_np = np.asarray(nb)
    counts, strict, sched_arr, S = dp.prepare_variable_decode(
        np.asarray(pay), nb_np, spec
    )
    print(f"S={S} max_count={counts.max()} strict={strict.all()}",
          flush=True)
    cdev = jnp.asarray(counts.astype(np.int32))

    if "--bisect" in sys.argv:
        # N=128 rows: ONE pass-1 group and ONE pass-2 group.  Hybrid
        # (device pass 1 + native apply_words) isolates pass 1; all-device
        # at G=1 isolates the kernel from the group count.
        sys.argv.remove("--bisect")
        from lzw_tpu.native.runtime import get_runtime

        n = 128
        pay_s, c_s = pay[:n], cdev[:n]
        words, stats, pair, dense, data_ok = (
            dp._variable_pass1_from_payloads(
                pay_s, c_s, jnp.asarray(sched_arr), spec, S, B,
                False, 128, dp.CELL, 128,
            )
        )
        wh = np.asarray(words)
        totals = np.asarray(stats[:, 0])
        print(f"pass1: errs={int(np.asarray(stats[:, 1]).sum())} "
              f"totals[0]={totals[0]} data_ok={bool(np.asarray(data_ok).all())}",
              flush=True)
        outs, tlens = get_runtime().apply_words(wh, B)
        exp = np.asarray(db[:n])
        bad_h = int((outs[0][:B] != exp[0]).sum()) if tlens[0] == B else -1
        print(f"hybrid: block0 bad bytes {bad_h} (tlen {tlens[0]})",
              flush=True)
        # all-device checks below run on the same 128-row slice (G=1 at
        # group2=128)
        pay, cdev, N = pay_s, c_s, n
        db = db[:n]

    for g2 in [int(a) for a in sys.argv[1:]] or [256, 128]:
        def run(p, c):
            out, tot, errs, _, ok = dp.decode_variable_device_run(
                p, c, sched_arr, spec, S, B, group2=g2
            )
            return out, tot

        out, tot = run(pay, cdev)
        out0 = np.asarray(out[0])
        outm = np.asarray(out[N // 2])
        good = (out0 == np.asarray(db[0])).all() and \
               (outm == np.asarray(db[N // 2])).all()
        nbad = int((out0 != np.asarray(db[0])).sum())
        best = float("inf")
        for rep in range(2):
            pv = jnp.roll(pay, rep + 1, axis=0)
            cv = jnp.roll(cdev, rep + 1)
            np.asarray(pv[0, :4])
            t0 = time.perf_counter()
            out, tot = run(pv, cv)
            np.asarray(tot[:4])
            best = min(best, time.perf_counter() - t0)
        rate = N * B / best / 2**20
        print(f"group2={g2}: round-trip {'OK' if good else 'BAD'} "
              f"(block0 bad bytes: {nbad}); {rate:.1f} MiB/s "
              f"({rate/200:.2f}x ref)", flush=True)


if __name__ == "__main__":
    main()
