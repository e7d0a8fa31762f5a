"""Ablation timings for the lockstep encoder kernel (run on real TPU).

Variants isolate cost components: loop overhead, scan, reduce, insert,
branches.  Timing only — results are not checked here.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 1024
T = 4608
SEG = 512


def make_kernel(variant: str):
    def kernel(x_ref, out_ref, ptab_ref, state_ref):
        c = pl.program_id(1)
        ROWS = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)
        SEG_ROWS = ROWS[:SEG]

        @pl.when(c == 0)
        def _():
            ptab_ref[:] = jnp.full((T, LANES), -1, jnp.int32)
            state_ref[0, :] = jnp.zeros((LANES,), jnp.int32)
            state_ref[1, :] = jnp.full((LANES,), 256, jnp.int32)

        def tile_step(t, carry):
            prefix, nxt = carry
            row0 = pl.multiple_of(t * 8, 8)
            tile = x_ref[0, pl.ds(row0, 8), :]
            out_rows = []
            for r in range(8):
                k = tile[r, :][None, :]
                key = prefix * 256 + k
                if variant == "empty":
                    matched = key * 0 - 1
                elif variant in ("scan", "scan_noinsert", "scan_wininsert",
                                 "scan_reduce_only"):
                    eq = ptab_ref[:] == key
                    matched = jnp.max(
                        jnp.where(eq, ROWS, -1), axis=0, keepdims=True
                    )
                elif variant == "seg2":
                    # static 2-segment scan (2048+... scan only first 2048)
                    matched = jnp.full((1, LANES), -1, jnp.int32)
                    for s in range(4):
                        seg = ptab_ref[pl.ds(s * SEG, SEG), :]
                        part = jnp.max(
                            jnp.where(seg == key, SEG_ROWS + s * SEG, -1),
                            axis=0, keepdims=True,
                        )
                        matched = jnp.maximum(matched, part)
                miss = matched < 0
                out_rows.append(jnp.where(miss, prefix, -1)[0])
                ins = miss & (nxt < 4096)
                if variant in ("scan",):
                    ptab_ref[:] = jnp.where(
                        (ROWS == nxt) & ins, key, ptab_ref[:]
                    )
                elif variant in ("scan_wininsert", "seg2"):
                    w0 = pl.multiple_of((jnp.min(nxt) // 8) * 8, 8)
                    win = ptab_ref[pl.ds(w0, SEG), :]
                    rows_w = SEG_ROWS + w0
                    ptab_ref[pl.ds(w0, SEG), :] = jnp.where(
                        (rows_w == nxt) & ins, key, win
                    )
                prefix = jnp.where(miss, k, jnp.maximum(matched, 0))
                nxt = nxt + ins.astype(jnp.int32)
            out_ref[0, pl.ds(row0, 8), :] = jnp.stack(out_rows, axis=0)
            return prefix, nxt

        p0 = state_ref[0, :][None, :]
        n0 = state_ref[1, :][None, :]
        p, n = jax.lax.fori_loop(0, CHUNK // 8, tile_step, (p0, n0))
        state_ref[0, :] = p[0]
        state_ref[1, :] = n[0]

    return kernel


def run_variant(variant, x):
    G = x.shape[0]
    grid = (G, x.shape[1] // CHUNK)
    f = jax.jit(lambda x: pl.pallas_call(
        make_kernel(variant),
        grid=grid,
        in_specs=[pl.BlockSpec((1, CHUNK, LANES), lambda g, c: (g, c, 0))],
        out_specs=pl.BlockSpec((1, CHUNK, LANES), lambda g, c: (g, c, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((T, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
    )(x))
    out = f(x)
    jax.block_until_ready(out)
    chk = int(jnp.sum((out >= 0).astype(jnp.int32)))
    xs = [x + i for i in range(5)]  # defeat any result caching
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [f(xi) for xi in xs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5
    n_bytes = x.shape[0] * x.shape[1] * LANES
    print(f"{variant:16s}: {dt*1e3:7.1f} ms  "
          f"{dt/(x.shape[0]*x.shape[1])*1e9:6.0f} ns/step  "
          f"{n_bytes/dt/2**20:6.0f} MiB/s  emitted={chk}")


def make_grid_kernel(variant: str):
    """Tiling via the grid: in-kernel indexing is fully static."""
    def kernel(x_ref, out_ref, ptab_ref, state_ref):
        t = pl.program_id(1)
        ROWS = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)

        @pl.when(t == 0)
        def _():
            ptab_ref[:] = jnp.full((T, LANES), -1, jnp.int32)
            state_ref[0, :] = jnp.zeros((LANES,), jnp.int32)
            state_ref[1, :] = jnp.full((LANES,), 256, jnp.int32)

        prefix = state_ref[0, :][None, :]
        nxt = state_ref[1, :][None, :]
        tile = x_ref[0]  # (8, LANES) static
        out_rows = []
        for r in range(8):
            k = tile[r, :][None, :]
            key = prefix * 256 + k
            if variant == "gempty":
                matched = key * 0 - 1
            else:
                eq = ptab_ref[:] == key
                matched = jnp.max(
                    jnp.where(eq, ROWS, -1), axis=0, keepdims=True
                )
            miss = matched < 0
            out_rows.append(jnp.where(miss, prefix, -1)[0])
            ins = miss & (nxt < 4096)
            if variant == "gscan":
                ptab_ref[:] = jnp.where((ROWS == nxt) & ins, key, ptab_ref[:])
            prefix = jnp.where(miss, k, jnp.maximum(matched, 0))
            nxt = nxt + ins.astype(jnp.int32)
        out_ref[0] = jnp.stack(out_rows, axis=0)
        state_ref[0, :] = prefix[0]
        state_ref[1, :] = nxt[0]

    return kernel


def run_grid_variant(variant, x):
    G, B = x.shape[0], x.shape[1]
    grid = (G, B // 8)
    f = jax.jit(lambda x: pl.pallas_call(
        make_grid_kernel(variant),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 8, LANES), lambda g, t: (g, t, 0))],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda g, t: (g, t, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((T, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
    )(x))
    out = f(x)
    jax.block_until_ready(out)
    chk = int(jnp.sum((out >= 0).astype(jnp.int32)))
    xs = [x + i for i in range(5)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [f(xi) for xi in xs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5
    n_bytes = x.shape[0] * x.shape[1] * LANES
    print(f"{variant:16s}: {dt*1e3:7.1f} ms  "
          f"{dt/(x.shape[0]*x.shape[1])*1e9:6.0f} ns/step  "
          f"{n_bytes/dt/2**20:6.0f} MiB/s  emitted={chk}")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    G, B = 2, 4096
    x = jnp.asarray(rng.integers(0, 256, (G, B, LANES)).astype(np.int32))
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "grid"
    if which in ("all", "orig"):
        for v in ("empty", "scan_noinsert", "scan_wininsert", "scan", "seg2"):
            run_variant(v, x)
    if which in ("all", "grid"):
        for v in ("gempty", "gscan_noins", "gscan"):
            run_grid_variant(v, x)


if __name__ == "__main__":
    main()
