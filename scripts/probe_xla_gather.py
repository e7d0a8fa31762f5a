"""On-chip throughput of the XLA ops the copy-resolve pass 2 would use.

Bulk regime (one big op), unlike probe_tpu.py's probe E which measured tiny
per-step gathers inside a fori_loop (113 ns/elem there was per-op overhead,
not per-element cost).  Run on the real chip.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(f, *args, n=10):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    for N, B in ((512, 65536), (8192, 4096)):
        tot = N * B
        tab = jnp.asarray(rng.integers(0, B, (N, B)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, B, (N, B)).astype(np.int32))

        f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
        dt = timeit(f, tab, idx)
        print(f"take_along_axis [{N},{B}]: {dt*1e3:.2f} ms = "
              f"{tot/dt/1e9:.2f} G elem/s")

        # doubling round: parent = parent[parent] (same-array gather)
        g = jax.jit(lambda p: jnp.take_along_axis(p, p, axis=1))
        dt = timeit(g, idx)
        print(f"  self-gather round: {dt*1e3:.2f} ms = {tot/dt/1e9:.2f} G/s")

        # 7-round fori_loop of doubling
        def doubled(p):
            return jax.lax.fori_loop(
                0, 7, lambda _, q: jnp.take_along_axis(q, q, axis=1), p)
        h = jax.jit(doubled)
        dt = timeit(h, idx)
        print(f"  7 doubling rounds: {dt*1e3:.2f} ms total")

        # while_loop with convergence check
        def conv(p):
            def cond(c):
                return c[1]
            def body(c):
                p, _ = c
                q = jnp.take_along_axis(p, p, axis=1)
                return q, jnp.any(q != p)
            return jax.lax.while_loop(cond, body, (p, jnp.bool_(True)))[0]
        # make convergent pointers: parent < self
        par = np.minimum(idx, np.arange(B, dtype=np.int32)[None, :])
        par = jnp.asarray(par)
        k = jax.jit(conv)
        dt = timeit(k, par)
        print(f"  while-converge doubling: {dt*1e3:.2f} ms")

        # scatter-add of S sorted indices (parent-build step)
        S = B * 7 // 16
        sidx = np.sort(rng.integers(0, B, (N, S)).astype(np.int32), axis=1)
        sidx = jnp.asarray(sidx)
        ones = jnp.ones((N, S), jnp.int32)
        def scat(z_idx):
            z = jnp.zeros((N, B), jnp.int32)
            return z.at[jnp.arange(N)[:, None], z_idx].add(1)
        s = jax.jit(scat)
        dt = timeit(s, sidx)
        print(f"  scatter-add [{N},{S}] -> [{N},{B}]: {dt*1e3:.2f} ms = "
              f"{N*S/dt/1e9:.2f} G idx/s")

        # cumsum along axis 1
        c = jax.jit(lambda t: jnp.cumsum(t, axis=1))
        dt = timeit(c, tab)
        print(f"  cumsum [{N},{B}]: {dt*1e3:.2f} ms = {tot/dt/1e9:.2f} G/s")

        # gather from small per-row table (attr spread): [N,S] table
        small = jnp.asarray(rng.integers(0, 255, (N, S)).astype(np.int32))
        wi = jnp.asarray(rng.integers(0, S, (N, B)).astype(np.int32))
        f2 = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
        dt = timeit(f2, small, wi)
        print(f"  attr gather [N,{S}] at [N,{B}]: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
