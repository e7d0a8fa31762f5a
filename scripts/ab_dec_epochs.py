"""A/B the 64 KiB variable device decode: legacy whole-stream pass 2 vs
epoch-split pass 2, on the real chip, HBM-to-HBM (bench_device_64k
methodology: payloads produced on device, host only recovers counts).

Usage: ab_dec_epochs.py [--text] [--legacy] [--n N] [--bs BYTES]
"""

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
BASE = 200 * (1 << 20)  # reference variable-decode anchor, README.md:28


def main():
    enable_compilation_cache()
    spec = LzwSpec.gif(7)
    B = 1 << 16
    if "--bs" in sys.argv:
        i = sys.argv.index("--bs"); B = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    N = ep.GROUP_CHUNKED
    if "--n" in sys.argv:
        i = sys.argv.index("--n"); N = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    legacy = "--legacy" in sys.argv

    if "--text" in sys.argv:
        base = (ASSETS / "lorem_ipsum.txt").read_bytes()
    else:
        from lzw_tpu.utils.corpus import load_tokyo_pixels
        base = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    hi = spec.max_code_value + 1
    host = np.frombuffer(bytes(b % hi for b in base), np.uint8)

    dup = jnp.asarray(host)
    np.asarray(dup[:4])
    reps_t = -(-(N * B) // len(host))
    db = jnp.tile(dup, reps_t)[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)
    print(f"corpus on device: {N*B/2**20:.0f} MiB, bs={B}", flush=True)

    pay, nb, _, _ = ep.encode_pack_variable_tpu(db, dl, spec, B)
    np.asarray(nb[:4])
    pb = int(np.asarray(jnp.max(nb)))
    pay = pay[:, :pb]
    nb_np = np.asarray(nb)
    t0 = time.perf_counter()
    counts, strict, sched_arr, S = dp.prepare_variable_decode(
        np.asarray(pay), nb_np, spec
    )
    print(f"prepare (host): {time.perf_counter()-t0:.2f}s S={S}", flush=True)
    assert strict.all()
    cdev = jnp.asarray(counts.astype(np.int32))

    run = dp.decode_variable_device_run if legacy \
        else dp.decode_variable_epochs_run

    def dec(p, c):
        out, tot, errs, _, _ = run(p, c, sched_arr, spec, S, B)
        return out, tot, errs

    t0 = time.perf_counter()
    out, tot, errs = dec(pay, cdev)
    np.asarray(tot[:4])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    assert not np.asarray(errs).any()

    bestd = float("inf")
    for rep in range(3):
        pv = jnp.roll(pay, rep + 1, axis=0)
        cv = jnp.roll(cdev, rep + 1)
        np.asarray(pv[0, :4])
        t0 = time.perf_counter()
        out, tot = dec(pv, cv)[:2]
        np.asarray(tot[:4])
        dt = time.perf_counter() - t0
        print(f"  rep {rep}: {dt:.3f}s", flush=True)
        bestd = min(bestd, dt)
    k = (1 - 3) % N
    assert (np.asarray(out[1]) == np.asarray(db[k])).all(), "round trip"
    rate = N * B / bestd
    print(f"{'legacy' if legacy else 'epochs'}: {rate/2**20:.1f} MiB/s "
          f"({rate/BASE:.2f}x ref)", flush=True)


if __name__ == "__main__":
    main()
