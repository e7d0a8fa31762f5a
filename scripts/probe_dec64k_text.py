"""On-chip probe: 64 KiB text-corpus device decode at various pass-2
groupings.  Usage: probe_dec64k_text.py [group2 ...]"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep, \
    schedule as sc
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    enable_compilation_cache()
    spec = LzwSpec.gif(7)
    B = 1 << 16
    N = ep.GROUP_CHUNKED
    data = (ASSETS / "lorem_ipsum.txt").read_bytes()
    base = np.frombuffer(bytes(b % 128 for b in data), np.uint8)
    dup = jnp.asarray(base)
    np.asarray(dup[:4])
    reps_t = -(-(N * B) // len(base))
    db = jnp.tile(dup, reps_t)[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)

    def enc(d):
        dense, counts, _, _ = ep.encode_blocks_variable_codes_tpu(
            d, dl, spec, B
        )
        return sc.pack_variable_device(dense, counts, spec, fix_eoi=True)

    pay, nb = jax.jit(enc)(db)
    pb = int(np.asarray(jnp.max(nb)))
    pay = pay[:, :pb]
    nb_np = np.asarray(nb)
    counts, strict, sched_arr, S = dp.prepare_variable_decode(
        np.asarray(pay), nb_np, spec
    )
    print(f"S={S} max_count={counts.max()} strict={strict.all()}",
          flush=True)
    cdev = jnp.asarray(counts.astype(np.int32))

    for g2 in [int(a) for a in sys.argv[1:]] or [256, 128]:
        out, tot, errs, _, ok = dp.decode_variable_device_run(
            pay, cdev, sched_arr, spec, S, B, group2=g2
        )
        out0 = np.asarray(out[0])
        outm = np.asarray(out[N // 2])
        good = (out0 == np.asarray(db[0])).all() and \
               (outm == np.asarray(db[N // 2])).all()
        nbad = int((out0 != np.asarray(db[0])).sum())
        print(f"group2={g2}: round-trip {'OK' if good else 'BAD'} "
              f"(block0 bad bytes: {nbad})", flush=True)


if __name__ == "__main__":
    main()
