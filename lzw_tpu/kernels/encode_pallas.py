"""Lockstep Pallas encoder: 128 independent blocks per lane-group.

TPU-native replacement for the encoder hot loop (`encoder.rs:313-337`).  One
VPU lane = one block; all lanes step through their bytes together.  The
dictionary is a **direct code-indexed table**: row c of ``ptab`` holds the
packed ``(prefix<<8)|byte`` key whose child code is c (the arena trie's edge
list, flattened).  A lookup is a masked compare-scan of the table — the VPU
equivalent of pointer chasing, running at vector line rate — and the matched
row index *is* the child code, so no value array exists.  Entries beyond each
lane's ``next`` index are masked out of matches, which also makes dictionary
reset O(1) (rewind ``next``; stale rows are unreachable until overwritten).

Inserts write row ``next[l]`` of lane l.  Mosaic cannot scatter per-lane, so
v1 realises the insert as a masked select over a window of rows bracketing
all lanes' ``next`` values (lanes drift apart slowly — the window is usually
a few tiles); a full-table pass is the fallback when the drift exceeds the
window.

The kernel emits one i32 slot per input byte: the evicted prefix code on a
miss, -1 on a hit (hole).  Holes are compacted outside the kernel
(`lzw_tpu.kernels.common.compact_columns_jax`) and the dense code stream is
bit-packed with static arithmetic (12-bit pairs -> 3 bytes for the fixed
flavor).  Width scheduling for the variable flavor is likewise a static
function of the emission ordinal — see `lzw_tpu.kernels.postprocess`.

Input/output stream through VMEM in CHUNK-row tiles via the grid's inner
dimension while the dictionary persists in scratch, so block size is bounded
by HBM, not VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lzw_tpu.kernels.common import compact_columns_jax
from lzw_tpu.spec import MAX_TABLE_SIZE

__all__ = ["encode_blocks_fixed_tpu", "LANES", "CHUNK"]

LANES = 128
CHUNK = 1024
SEG = 512  # lookup scan segment (rows); predicated out above the ramp
INS_WIN = 512  # insert window (rows); full-table fallback past this drift
TABLE_PAD = 512  # table rows rounded up so insert windows fit (4608=9*512)


def _encode_kernel_fixed(x_ref, len_ref, out_ref, ptab_ref, state_ref):
    """Grid: (groups, chunks). Scratch persists across the chunk dimension."""
    c = pl.program_id(1)
    T, lanes = ptab_ref.shape
    chunk = x_ref.shape[1]
    first_free = 256  # fixed flavor: byte alphabet roots

    ROWS = jax.lax.broadcasted_iota(jnp.int32, (T, lanes), 0)

    @pl.when(c == 0)
    def _init():
        ptab_ref[:] = jnp.full((T, lanes), -1, jnp.int32)
        state_ref[0, :] = jnp.zeros((lanes,), jnp.int32)  # prefix
        state_ref[1, :] = jnp.full((lanes,), first_free, jnp.int32)  # next

    lens = len_ref[0, 0, :]  # (lanes,)
    base = c * chunk

    n_segs = T // SEG
    SEG_ROWS = ROWS[:SEG]  # (SEG, lanes) iota, reused with per-segment bias

    # Mosaic requires >=8-sublane aligned tile accesses; process the chunk in
    # 8-row tiles with statically-unrolled row selects inside each tile.
    def tile_step(t, carry):
        prefix, nxt = carry  # (1, lanes) each
        row0 = pl.multiple_of(t * 8, 8)
        tile = x_ref[0, pl.ds(row0, 8), :]  # (8, lanes) i32
        out_rows = []
        for r in range(8):
            i = base + t * 8 + r  # global byte index
            k = tile[r, :][None, :]
            active = (i < lens)[None, :]
            final = ((i == lens) & (lens > 0))[None, :]
            is_first = i == 0  # only step 0 seeds the prefix

            key = prefix * 256 + k
            nxt_max = jnp.max(nxt)
            nxt_min = jnp.min(nxt)

            # Compare-scan: matched row index IS the child code.  Rows >= nxt
            # hold the -1 sentinel (fixed tables are append-only), so a bare
            # equality suffices; segments above every lane's ramp are skipped.
            def scan_segment(s, acc):
                seg = ptab_ref[pl.ds(s * SEG, SEG), :]
                part = jnp.max(
                    jnp.where(seg == key, SEG_ROWS + s * SEG, -1),
                    axis=0, keepdims=True,
                )
                return jnp.maximum(acc, part)

            matched = jnp.full((1, lanes), -1, jnp.int32)
            for s in range(n_segs):
                matched = jax.lax.cond(
                    s * SEG < nxt_max,
                    lambda m, s=s: scan_segment(s, m),
                    lambda m: m,
                    matched,
                )
            miss = active & (matched < 0) & jnp.logical_not(is_first)
            hit = active & (matched >= 0) & jnp.logical_not(is_first)

            out_rows.append(jnp.where(miss | final, prefix, -1)[0])

            # Insert at row nxt[l] per lane: masked select over a window
            # bracketing all lanes' next pointers (they drift slowly).
            ins = miss & (nxt < MAX_TABLE_SIZE)
            w0 = pl.multiple_of((nxt_min // 8) * 8, 8)

            def insert_window():
                win = ptab_ref[pl.ds(w0, INS_WIN), :]
                rows_w = SEG_ROWS[:INS_WIN] + w0
                ptab_ref[pl.ds(w0, INS_WIN), :] = jnp.where(
                    (rows_w == nxt) & ins, key, win
                )

            def insert_full():
                ptab_ref[:] = jnp.where((ROWS == nxt) & ins, key, ptab_ref[:])

            jax.lax.cond(
                nxt_max - w0 < INS_WIN, insert_window, insert_full
            )

            prefix = jnp.where(
                active & is_first, k,
                jnp.where(miss, k, jnp.where(hit, matched, prefix)),
            )
            nxt = nxt + ins.astype(jnp.int32)
        out_ref[0, pl.ds(row0, 8), :] = jnp.stack(out_rows, axis=0)
        return prefix, nxt

    prefix0 = state_ref[0, :][None, :]
    nxt0 = state_ref[1, :][None, :]
    prefix, nxt = jax.lax.fori_loop(0, chunk // 8, tile_step, (prefix0, nxt0))
    state_ref[0, :] = prefix[0]
    state_ref[1, :] = nxt[0]


def _pack12(dense, counts, little: bool):
    """Static 12-bit pair packing: codes [N, S] -> bytes [N, 3*S//2]."""
    N, S = dense.shape
    assert S % 2 == 0
    c = dense.reshape(N, S // 2, 2)
    c0, c1 = c[..., 0], c[..., 1]
    if little:
        b0 = c0 & 0xFF
        b1 = (c0 >> 8) | ((c1 & 0xF) << 4)
        b2 = (c1 >> 4) & 0xFF
    else:
        b0 = (c0 >> 4) & 0xFF
        b1 = ((c0 & 0xF) << 4) | (c1 >> 8)
        b2 = c1 & 0xFF
    by = jnp.stack([b0, b1, b2], axis=-1).reshape(N, -1)
    lengths = (12 * counts + 7) >> 3
    return by.astype(jnp.uint8), lengths


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "little", "interpret", "lanes", "chunk"),
)
def encode_blocks_fixed_tpu(blocks, lens, block_size: int, little: bool = True,
                            interpret: bool = False, lanes: int = LANES,
                            chunk: int = CHUNK):
    """Fixed-12-bit block-parallel encode on TPU.

    Args:
      blocks: u8[N, block_size], N a multiple of ``lanes``.
      lens:   i32[N] valid byte counts.
      block_size: static, a multiple of ``chunk``.
      lanes/chunk: lockstep width and VMEM streaming tile (test knobs; the
        TPU defaults are LANES=128, CHUNK=1024).
    Returns:
      payloads u8[N, PB] (zero-padded), lengths i32[N].
    """
    N, B = blocks.shape
    assert B == block_size and N % lanes == 0 and B % chunk == 0
    G = N // lanes
    SLOTS = B + chunk  # one extra chunk of slots for the final-prefix row

    # [N, B] -> [G, B(+pad), lanes], widened to i32 (Mosaic has no dynamic
    # sub-tile i8 loads; the HBM cost is invisible next to the scan).
    x = blocks.astype(jnp.int32).reshape(G, lanes, B).transpose(0, 2, 1)
    x = jnp.concatenate(
        [x, jnp.zeros((G, chunk, lanes), jnp.int32)], axis=1
    )
    l = lens.reshape(G, 1, lanes)

    T = MAX_TABLE_SIZE + TABLE_PAD
    grid = (G, SLOTS // chunk)
    codes = pl.pallas_call(
        _encode_kernel_fixed,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, lanes), lambda g, c: (g, c, 0)),
            pl.BlockSpec((1, 1, lanes), lambda g, c: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, lanes), lambda g, c: (g, c, 0)),
        out_shape=jax.ShapeDtypeStruct((G, SLOTS, lanes), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((T, lanes), jnp.int32),
            pltpu.VMEM((8, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(x, l)

    # Compact holes per lane, back to [N, SLOTS] block-major.
    dense, counts = jax.vmap(
        lambda v: compact_columns_jax(v, v >= 0, fill=0)
    )(codes)
    dense = dense.transpose(0, 2, 1).reshape(N, SLOTS)
    counts = counts.reshape(N)
    payloads, lengths = _pack12(dense, counts, little)
    return payloads, lengths
