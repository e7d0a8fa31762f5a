"""Shared Pallas building blocks: scatter-free column compaction and shifts.

The TPU VPU cannot scatter per-lane, so anything that "moves element j of
lane l to row p(j,l)" must be expressed as rolls + selects.  Two primitives
cover every need in the codec kernels:

* :func:`compact_columns_jax` — stable stream compaction along axis 0 of a
  ``[S, L]`` array (independently per lane/column).  Works because each
  element's downward displacement ``d_j = j - rank_j`` (= holes before it) is
  non-decreasing in ``j``, so the move decomposes into log2(S) passes of
  "shift down by 2^b where bit b of the remaining displacement is set".
* :func:`shift_columns_jax` — shift each column down by its own per-lane
  amount (binary-decomposed conditional rolls).  This is the scatter
  substitute used to append compacted segments at per-lane offsets.

Both are written as plain jnp functions operating on arrays: inside a Pallas
kernel they trace to supported Mosaic ops (the rolls are static), and outside
a kernel they run under XLA for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compact_columns_jax", "shift_columns_jax", "_tpu_roll"]


def _default_roll(x, shift: int):
    return jnp.roll(x, shift, axis=0)


def _tpu_roll(x, shift: int):
    """Native Mosaic roll.  NOTE: currently crashes the remote TPU compiler
    (HTTP 500 in tpu_compile_helper) when used inside the compact encoder
    kernel; kept for experimentation, not used by default."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _cumsum0(x, roll=_default_roll):
    """Inclusive prefix sum along axis 0 via log-step shift-adds.

    Mosaic has no cumsum primitive; this is the Hillis-Steele scan from
    rolls + masked adds, usable both inside Pallas kernels and under XLA.
    """
    S = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < S:
        shifted = jnp.where(row >= k, roll(x, k), 0)
        x = x + shifted
        k *= 2
    return x


def compact_columns_jax(values, valid, fill=0, roll=_default_roll):
    """Stable per-column compaction of ``values[S, ...]`` by ``valid[S, ...]``.

    Operates along axis 0 with any trailing shape (each trailing index is an
    independent column).  Returns (compacted_values, counts) where
    compacted_values[j, ...] is the j-th valid element of that column (fill
    past counts[...]).
    """
    S = values.shape[0]
    # Displacement of each valid element = number of holes strictly before it.
    holes = (~valid).astype(jnp.int32)
    holes_before = _cumsum0(holes, roll) - holes
    disp = jnp.where(valid, holes_before, 0)
    vals = jnp.where(valid, values, fill)
    alive = valid

    b = 0
    while (1 << b) < S:
        k = 1 << b
        # An element with bit b set in its remaining displacement moves up
        # (towards row 0) by k.  Destination row j receives source row j+k.
        src_vals = roll(vals, -k)
        src_alive = roll(alive, -k)
        src_disp = roll(disp, -k)
        take = src_alive & ((src_disp & k) != 0)
        # Current occupant stays only if it doesn't move itself.
        stay = alive & ((disp & k) == 0)
        new_vals = jnp.where(take, src_vals, jnp.where(stay, vals, fill))
        new_alive = take | stay
        new_disp = jnp.where(take, src_disp - k, jnp.where(stay, disp, 0))
        vals, alive, disp = new_vals, new_alive, new_disp
        b += 1

    counts = jnp.sum(valid.astype(jnp.int32), axis=0)
    return vals, counts


def shift_columns_jax(values, shifts, fill=0, roll=_default_roll):
    """Shift each column of ``values[S, ...]`` DOWN by its own ``shifts[...]``.

    Row j of the result holds the source row ``j - shifts[...]`` (fill where
    that is negative).  Shifts must satisfy ``0 <= shifts < S`` and have the
    trailing shape of ``values``.
    """
    S = values.shape[0]
    out = values
    row = jax.lax.broadcasted_iota(jnp.int32, values.shape, 0)
    b = 0
    while (1 << b) < S:
        k = 1 << b
        moved = roll(out, k)  # row j <- row j-k
        bit = (shifts & k) != 0
        out = jnp.where(bit[None], moved, out)
        b += 1
    out = jnp.where(row >= shifts[None], out, fill)
    return out
