"""Paranoid re-time of the magic [512,65536] gather + HLO inspection."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(1)
    N, B = 512, 65536
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))

    tabs = [jnp.asarray(rng.integers(0, 1 << 30, (N, B)).astype(np.int32))
            for _ in range(3)]
    idxs = [jnp.asarray(rng.integers(0, B, (N, B)).astype(np.int32))
            for _ in range(3)]
    jax.block_until_ready(f(tabs[0], idxs[0]))
    for r in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(tabs[r], idxs[r]))
        dt = time.perf_counter() - t0
        ok = np.array_equal(
            np.asarray(out),
            np.take_along_axis(np.asarray(tabs[r]), np.asarray(idxs[r]), 1))
        print(f"fresh-args rep {r}: {dt*1e3:.2f} ms correct={ok}")

    # chained dependency: 8 rounds where each output feeds the next index
    def chain(p):
        def body(i, q):
            return jnp.take_along_axis(q, q, axis=1)
        return jax.lax.fori_loop(0, 8, body, p)
    g = jax.jit(chain)
    par = np.minimum(np.asarray(idxs[0]), np.arange(B, dtype=np.int32)[None])
    par = jnp.asarray(par)
    jax.block_until_ready(g(par))
    t0 = time.perf_counter()
    out = jax.block_until_ready(g(par))
    print(f"8 chained self-gathers: {(time.perf_counter()-t0)*1e3:.2f} ms")
    # verify against numpy
    pn = np.asarray(par)
    q = pn
    for _ in range(8):
        q = np.take_along_axis(q, q, axis=1)
    print("chain correct:", np.array_equal(np.asarray(out), q))

    lowered = f.lower(tabs[0], idxs[0]).compile()
    hlo = lowered.as_text()
    import re
    for kw in ("gather", "sort", "while", "dynamic-slice", "scatter",
               "custom-call", "fusion"):
        n = len(re.findall(kw, hlo))
        print(f"HLO '{kw}': {n}")
    print("HLO lines:", hlo.count(chr(10)))
    with open("/tmp/gather_hlo.txt", "w") as fh:
        fh.write(hlo)


if __name__ == "__main__":
    main()
