"""Verify + characterize the bimodal XLA gather perf seen in probe 1."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def bench(f, *args, n=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    rng = np.random.default_rng(0)
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
    for N, B in ((512, 65536), (1024, 65536), (512, 32768), (1024, 32768),
                 (2048, 16384), (4096, 8192), (8192, 4096), (256, 65536),
                 (64, 65536), (512, 16384)):
        tot = N * B
        tabn = rng.integers(0, 1 << 30, (N, B)).astype(np.int32)
        idxn = rng.integers(0, B, (N, B)).astype(np.int32)
        tab = jnp.asarray(tabn)
        idx = jnp.asarray(idxn)
        dt, out = bench(f, tab, idx)
        outn = np.asarray(out)
        ref = np.take_along_axis(tabn, idxn, axis=1)
        ok = (outn == ref).all()
        print(f"[{N},{B}]: {dt*1e3:7.2f} ms  {tot/dt/1e9:8.2f} G/s  "
              f"correct={bool(ok)}")


if __name__ == "__main__":
    main()
