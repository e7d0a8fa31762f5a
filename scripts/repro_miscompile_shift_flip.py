"""Standalone repro: XLA shift+flip+transpose fusion miscompile (r4 find).

No pallas involved.  A per-lane log-shift (roll + select ladder) fused in
one XLA program with a trailing flip/transpose deterministically corrupts
sparse 4-element runs with period ~1312 rows once the row count reaches
~16k, on the TPU v5e reached through this dev relay.  Split into two
dispatches the same computation is exact (that split is the shipped
containment in lzw_tpu.kernels.decode_pallas).

Run on the chip: python scripts/repro_miscompile_shift_flip.py
Expected while the bug lives: "fused: WRONG (...); split: ok" (exit 0).
"fused: ok" means the toolchain fixed it — see scripts/canary_miscompiles.py.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

G, R, L, N = 2, 32768, 1024, 2048


def shift(values, shifts):
    """Shift each column down by its own amount (log-shift ladder)."""
    out = values
    row = jax.lax.broadcasted_iota(jnp.int32, values.shape, 1)
    b = 0
    while (1 << b) < R:
        k = 1 << b
        moved = jnp.roll(out, k, axis=1)
        out = jnp.where((shifts.reshape(G, 1, L) & k) != 0, moved, out)
        b += 1
    return jnp.where(row >= shifts.reshape(G, 1, L), out, 0)


def flip_t(x):
    return jnp.flip(x, axis=1).transpose(0, 2, 1).reshape(N, R) \
        .astype(jnp.uint8)


def fused(values, shifts):
    return flip_t(shift(values, shifts))


def main():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 256, (G, R, L)).astype(np.int32)
    s = rng.integers(0, R, (N,)).astype(np.int32)
    expect = np.zeros((N, R), np.uint8)
    for n in range(N):
        g, l = n // L, n % L
        k = s[n]
        col = np.zeros(R, np.int32)
        col[k:] = v[g, : R - k, l]
        expect[n] = col[::-1].astype(np.uint8)

    vd, sd = jnp.asarray(v), jnp.asarray(s)
    got_f = np.asarray(jax.jit(fused)(vd, sd))
    nf = int((got_f != expect).sum())
    got_s = np.asarray(jax.jit(flip_t)(jax.jit(shift)(vd, sd)))
    ns = int((got_s != expect).sum())
    print(f"fused: {'ok' if nf == 0 else f'WRONG ({nf} bytes differ)'}; "
          f"split: {'ok' if ns == 0 else f'WRONG ({ns})'}")
    # exit 0 when behavior matches the documented state (fused wrong,
    # split right); exit 1 signals a change worth attention.
    return 0 if (nf > 0 and ns == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
