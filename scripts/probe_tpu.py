"""TPU capability probes for kernel-strategy selection (run on the real chip).

Measures: (A) basic pallas viability, (B) per-lane dynamic gather support
inside pallas (take_along_axis along sublanes), (C) lax-scan codec step cost,
(D) one-hot masked-scan dictionary lookup cost. Results drive the lockstep
encoder kernel design.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(f, *args, n=20):
    f(*args)  # compile
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def probe_a_basic_pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2 + 1

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    out = f(x)
    ok = bool((np.asarray(out) == np.asarray(x) * 2 + 1).all())
    print(f"A basic pallas: {'OK' if ok else 'FAIL'}")
    return ok


def probe_b_gather_in_pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = 8192

    def kernel(tab_ref, idx_ref, o_ref):
        idx = idx_ref[:]  # [1, 128]
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)

    tab = jnp.arange(H * 128, dtype=jnp.int32).reshape(H, 128)
    idx = jnp.asarray(np.random.randint(0, H, (1, 128)), jnp.int32)
    try:
        f = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        out = np.asarray(f(tab, idx))
        expect = np.asarray(tab)[np.asarray(idx)[0], np.arange(128)]
        ok = bool((out[0] == expect).all())
        dt = timeit(f, tab, idx)
        print(f"B take_along_axis[{H},128] in pallas: {'OK' if ok else 'WRONG'} {dt*1e6:.1f}us")
        return ok
    except Exception as e:
        print(f"B take_along_axis in pallas: UNSUPPORTED ({type(e).__name__}: {str(e)[:200]})")
        return False


def probe_b2_gather_loop_pallas():
    """Gather repeated in a loop — amortized per-lookup cost."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, L, STEPS = 8192, 128, 256

    def kernel(tab_ref, idx_ref, o_ref):
        def body(i, acc):
            idx = (idx_ref[:] + acc) & (H - 1)
            return jnp.take_along_axis(tab_ref[:], idx, axis=0) + acc

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((1, L), jnp.int32))

    tab = jnp.arange(H * L, dtype=jnp.int32).reshape(H, L)
    idx = jnp.asarray(np.random.randint(0, H, (1, L)), jnp.int32)
    try:
        f = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        jax.block_until_ready(f(tab, idx))
        dt = timeit(f, tab, idx)
        print(f"B2 looped gather: {dt/STEPS*1e9:.0f} ns/gather-of-128")
        return True
    except Exception as e:
        print(f"B2 looped gather: UNSUPPORTED ({type(e).__name__}: {str(e)[:160]})")
        return False


def probe_b3_small_gather():
    """Find the largest supported take_along_axis table height in pallas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for H in (8, 16, 32, 64, 512):
        def kernel(tab_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        tab = jnp.arange(H * 128, dtype=jnp.int32).reshape(H, 128)
        idx = jnp.asarray(np.random.randint(0, H, (1, 128)), jnp.int32)
        try:
            f = jax.jit(lambda t, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i))
            out = np.asarray(f(tab, idx))
            expect = np.asarray(tab)[np.asarray(idx)[0], np.arange(128)]
            ok = bool((out[0] == expect).all())
            print(f"B3 take_along_axis H={H}: {'OK' if ok else 'WRONG'}")
        except Exception as e:
            print(f"B3 take_along_axis H={H}: UNSUPPORTED ({type(e).__name__})")


def probe_e_xla_gather():
    """XLA-level (non-pallas) per-lane gather/scatter cost in a scan loop."""
    H, L, STEPS = 8192, 1024, 512

    def run(tab, idx0):
        def body(i, carry):
            tab, idx, acc = carry
            got = jnp.take_along_axis(tab, idx[:, None], axis=1)[:, 0]
            tab = jax.lax.cond(
                i & 1,
                lambda t: t.at[jnp.arange(L), idx].set(got + 1),
                lambda t: t,
                tab,
            )
            return (tab, (idx + got) & (H - 1), acc + got)

        return jax.lax.fori_loop(0, STEPS, body,
                                 (tab, idx0, jnp.zeros(L, jnp.int32)))[2]

    tab = jnp.asarray(np.random.randint(0, H, (L, H)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, H, L), jnp.int32)
    f = jax.jit(run)
    dt = timeit(f, tab, idx, n=3)
    print(f"E xla gather+scatter loop [{L},{H}]: {dt/STEPS*1e6:.1f} us/step "
          f"= {STEPS*L/dt/1e6:.1f} Mlookup/s -> {STEPS*L/dt/1e6:.1f} MB/s-equiv")


def probe_c_lax_scan_speed():
    from lzw_tpu.ops import encode
    from lzw_tpu.spec import Endianness, LzwSpec

    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = 4096
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.integers(0, 256, B).astype(np.uint8))

    f = jax.jit(lambda b, n: encode.encode_block(b, n, spec))
    dt = timeit(f, block, jnp.int32(B), n=5)
    print(f"C lax-scan encode {B}B: {dt*1e3:.1f} ms = {B/dt/1e6:.2f} MB/s/block")
    # vmapped over 16 blocks
    blocks = jnp.asarray(rng.integers(0, 256, (16, B)).astype(np.uint8))
    lens = jnp.full((16,), B, jnp.int32)
    fv = jax.jit(jax.vmap(lambda b, n: encode.encode_block(b, n, spec)))
    dt = timeit(fv, blocks, lens, n=5)
    print(f"C lax-scan encode vmap16: {dt*1e3:.1f} ms = {16*B/dt/1e6:.2f} MB/s")


def probe_d_onehot_scan():
    """Lockstep dictionary via masked compare over [H, L] per step."""
    H, L, STEPS = 8192, 1024, 64

    def step_fn(tab_keys, keys):
        # lookup: for each lane l, find value where tab_keys[:, l] == keys[l]
        eq = tab_keys == keys[None, :]  # [H, L]
        return jnp.max(jnp.where(eq, 1, 0), axis=0)

    def run(tab_keys, keys):
        def body(i, acc):
            return acc + step_fn(tab_keys, (keys + i) & (H - 1))

        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros(L, jnp.int32))

    tab = jnp.asarray(np.random.randint(0, 1 << 21, (H, L)), jnp.int32)
    keys = jnp.asarray(np.random.randint(0, 1 << 21, L), jnp.int32)
    f = jax.jit(run)
    dt = timeit(f, tab, keys, n=5)
    per_byte = dt / (STEPS * L)
    print(f"D onehot-scan [{H},{L}]: {dt/STEPS*1e6:.1f} us/step = "
          f"{1/per_byte/1e6:.1f} MB/s equivalent")


if __name__ == "__main__":
    print("devices:", jax.devices())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        probe_a_basic_pallas()
    if which in ("all", "b"):
        probe_b_gather_in_pallas()
        probe_b2_gather_loop_pallas()
    if which in ("all", "b3"):
        probe_b3_small_gather()
    if which in ("all", "d"):
        probe_d_onehot_scan()
    if which in ("all", "e"):
        probe_e_xla_gather()
    if which in ("all", "c"):
        probe_c_lax_scan_speed()
