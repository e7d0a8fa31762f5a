"""Lockstep Pallas decoder (fixed-12): table scan -> LZ77-style copy list.

TPU-native replacement for the decoder hot loop (`decoder.rs:585-637`).  Key
observation: the dictionary entry created at step t is *previous word + first
char of the current word* — which is exactly the contiguous output span
``[off_{t-1}, off_t]`` (`decoder.rs:630-634` in span form).  So every decoded
word is either a literal (root code) or a **forward copy of an
already-decoded output range**, and decoding splits into:

* **Pass 1 (this kernel, sequential per code, O(1) each)**: lockstep over
  1024 blocks; maintains one packed per-entry word (length, first char,
  source offset) in a step-indexed table and emits one copy/literal
  descriptor per code.
* **Pass 2 (host native runtime)**: resolves the copy list with overlapping
  forward byte copies (`lzw_apply_words` in lzw_native.cpp) — pure memory
  plumbing at memcpy speed, threaded across blocks.

Unlike the encoder, the decoder inserts exactly one entry per consumed code
(`decoder.rs:630-634`), so **the row of a code is a static function of the
code**: ``row = code - 255`` for fixed-12, ``row = epoch_start + 1 + code -
first_free`` for strict variable streams.  Lookups therefore need no
embedded-key compare — the scan matches on the row index (the per-lane
gather the VPU lacks, expressed as a sum-select) and is bounded each step by
the min/max target row across the 1024 lanes, which tracks how far back the
stream actually references instead of the table size.

Packed entry, block_size <= 4096: ``length<<20 | first<<12 | src``
(12+8+12 = 32 bits; length of a dynamic entry is >= 2 and <= 4092,
src < block_size <= 4096).  Bigger blocks (the container's default 64 KiB
variable block) don't fit one i32 — the table splits into two planes
sharing one scan's hit mask: plane A ``length<<8 | first`` (20 bits),
plane B ``src`` (< 2^17, blocks up to 128 KiB).

Word descriptors (i32): ``kind<<29 | len<<17 | payload`` with kind 0 = copy
(payload = src), kind 1 = literal (payload = byte), kind 2 = hole; len is
at most 4092 (a dictionary word can't outgrow the 4096-entry table) and
payload at most 2^17-1, so the descriptor covers 128 KiB blocks in 31 bits.

Error contract: a code beyond the next free index sets the per-lane error
flag with the offending code (`decoder.rs:599-601`); the fixed flavor has no
CLEAR/EOI or truncation errors (bit exhaustion terminates cleanly,
`io.rs:58-78`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lzw_tpu.spec import MAX_TABLE_SIZE

__all__ = [
    "decode_pass1_fixed_tpu", "decode_pass1_variable_tpu",
    "decode_pass2_device", "decode_pass2_stride2",
    "decode_variable_all_device", "decode_variable_epochs_pooled",
    "prepare_variable_decode", "decode_variable_device_run",
    "decode_variable_epochs_run", "epoch_bounds", "unpack12",
    "KIND_COPY", "KIND_LIT", "KIND_HOLE",
    "GROUP", "GROUP_VAR", "MAX_BLOCK", "NARROW_BLOCK",
]

GROUP = 4096  # fixed-flavor blocks per kernel instance (32 sublanes x 128)
GROUP_VAR = 2048  # variable flavor: ring table is 4096 rows, keep VMEM sane
CELL = 512
SEG = 64  # scan segment rows; small segments keep the row-window tight
FIRST_FREE = 256

KIND_COPY = 0
KIND_LIT = 1
KIND_HOLE = 2

MAX_BLOCK = 1 << 17  # descriptor payload / wide-plane src field bound
NARROW_BLOCK = 4096  # single-plane packed-entry bound (12-bit src)
# Max grid groups per compiled pass-2 program before lax.map super-group
# serialization (the G>2 miscompile containment; see _pass2_walk_shift).
# Read at trace time; A/B scripts flip it with jax.clear_caches().
SUPER_GROUP_MAX = 2

def unpack12(payloads, plens, little: bool):
    """XLA unpack: 3 bytes -> 2 twelve-bit codes (static reshape math).

    payloads u8[N, PB] (zero past plens), returns codes i32[N, S] and
    n_codes i32[N]; PB is padded to a multiple of 3.
    """
    N, PB = payloads.shape
    assert PB % 3 == 0
    b = payloads.astype(jnp.int32).reshape(N, PB // 3, 3)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    if little:
        c0 = b0 | ((b1 & 0xF) << 8)
        c1 = (b1 >> 4) | (b2 << 4)
    else:
        c0 = (b0 << 4) | (b1 >> 4)
        c1 = ((b1 & 0xF) << 8) | b2
    codes = jnp.stack([c0, c1], axis=-1).reshape(N, -1)
    n_codes = (8 * plens) // 12
    return codes, n_codes


def _make_kernel(seg: int, variable_spec=None, block_size: int = 4096,
                 ring: bool = False, pair2: bool = False):
    wide = block_size > NARROW_BLOCK or pair2

    def kernel(codes_ref, ncodes_ref, *rest):
        if variable_spec is None:
            sched_ref = None
        else:
            sched_ref, rest = rest[0], rest[1:]
        if wide:
            (words_ref, pair_ref, stats_ref, tab_ref, tab2_ref,
             state_ref) = rest
        else:
            words_ref, pair_ref, stats_ref, tab_ref, state_ref = rest
            tab2_ref = None
        return _decode_kernel(
            codes_ref, ncodes_ref, sched_ref, words_ref, pair_ref, stats_ref,
            tab_ref, tab2_ref, state_ref, seg, variable_spec, block_size,
            ring, pair2,
        )

    return kernel


def _decode_kernel(codes_ref, ncodes_ref, sched_ref, words_ref, pair_ref,
                   stats_ref, tab_ref, tab2_ref, state_ref, SEG,
                   variable_spec, block_size, ring, pair2: bool = False):
    """Grid: (groups, cells); the step-indexed table persists across cells.

    For variable flavors (strict schedule streams), ``sched_ref`` carries
    per-step static scalars: row 0 the dictionary index assigned at step t
    (``Schedule.nxt_of``), row 1 the step index of the epoch start.  All
    lanes share them because strict streams consume code ordinals in
    lockstep.

    With ``pair2`` the table always uses the two-plane layout, extended so
    each entry also carries its code's (prefix, suffix): plane A
    ``suffix<<20 | length<<8 | first`` (28 bits), plane B
    ``prefix<<17 | src`` (29 bits).  The pair output then holds stride-2
    chain descriptors (see :func:`decode_pass2_stride2`):
    ``done<<28 | prefix2<<16 | byte1<<8 | byte0`` — byte0 = suffix(c),
    byte1 = suffix(prefix(c)) (or the root byte when done), prefix2 =
    prefix(prefix(c)).  Both come straight from registers: the lookup at
    step t-1 returned (prefix, suffix) of the code whose entry step t
    creates, carried in the packed ``pps`` state row.
    """
    c = pl.program_id(1)
    last_cell = c == pl.num_programs(1) - 1
    cell = codes_ref.shape[1]
    TAB_H, sub = tab_ref.shape[:2]
    n_phys = TAB_H // SEG
    wide = tab2_ref is not None
    variable = variable_spec is not None
    alphabet = variable_spec if variable else FIRST_FREE
    first_free = alphabet + 2 if variable else FIRST_FREE
    n_state = 8 if pair2 else 7

    @pl.when(c == 0)
    def _init():
        tab_ref[:] = jnp.zeros(tab_ref.shape, jnp.int32)
        if wide:
            tab2_ref[:] = jnp.zeros(tab2_ref.shape, jnp.int32)
        for r in range(n_state):
            state_ref[r] = jnp.zeros((sub, 128), jnp.int32)
        state_ref[3] = jnp.full((sub, 128), first_free, jnp.int32)  # next
        if pair2:
            state_ref[7] = jnp.full((sub, 128), -1, jnp.int32)  # pps

    ncodes = ncodes_ref[0, 0]
    base = c * cell
    ROW0 = jax.lax.broadcasted_iota(jnp.int32, (SEG, sub, 128), 0)

    def step(j, carry):
        if pair2:
            (prev_len, prev_first, off, nxt, err, err_code, prev_code,
             pps) = carry
        else:
            prev_len, prev_first, off, nxt, err, err_code, prev_code = carry
            pps = None
        t = base + j
        code = codes_ref[0, j]
        active = (t < ncodes) & (err == 0)
        if variable:
            # Static schedule scalars (identical across lanes).
            nxt_sched = sched_ref[0, j]
            epoch_start = sched_ref[1, j]
            first_step = t == epoch_start
            nxt = jnp.full((sub, 128), 0, jnp.int32) + nxt_sched
        else:
            epoch_start = 0
            first_step = t == 0
        root = code < alphabet
        kwkwk = code == nxt
        bad = active & jnp.logical_not(first_step) & (code > nxt)
        err = jnp.where(bad, 1, err)
        err_code = jnp.where(bad, code, err_code)
        ok = active & jnp.logical_not(bad)

        # Table read.  The decoder inserts exactly one entry per step, so
        # code c lives at the *statically known* step
        # ``epoch_start + 1 + c - first_free`` — the lookup is a per-lane
        # gather at that row, expressed as a row-index-matched sum-select
        # over the [min, max] target-row window of the lockstep lanes.
        # Variable tables are rings (row = step % TAB_H): an epoch spans
        # fewer than 4096 steps, so live entries never collide and old
        # epochs are overwritten for free; strict streams share one static
        # schedule, so in-window targets stay unique mod TAB_H.
        is_lit = first_step | root
        lookup = ok & jnp.logical_not(is_lit) & jnp.logical_not(kwkwk)
        target = jnp.where(lookup, epoch_start + 1 + code - first_free, 0)
        tmax = jnp.max(target)
        tmin = jnp.min(jnp.where(lookup, target, jnp.int32(0x7FFFFFFF)))
        s_lo = tmin // SEG
        s_hi = tmax // SEG + 1
        if ring:
            # A window longer than the ring covers every physical segment
            # once; clamping also stops double-visiting wrapped segments.
            s_hi = jnp.minimum(s_hi, s_lo + n_phys)
            target = target % TAB_H

        zero = jnp.zeros((sub, 128), jnp.int32)
        if wide:
            # Two planes share one scan's hit mask: the second sum-select
            # costs a load + select + add, not a second full sweep.
            def scan_tab(s, accs):
                a, b_ = accs
                p = (s % n_phys) * SEG if ring else s * SEG
                hit = (ROW0 + p) == target[None]
                a = a + jnp.sum(jnp.where(hit, tab_ref[pl.ds(p, SEG)], 0),
                                axis=0)
                b_ = b_ + jnp.sum(jnp.where(hit, tab2_ref[pl.ds(p, SEG)], 0),
                                  axis=0)
                return a, b_

            ent, src_d = jax.lax.fori_loop(
                s_lo, s_hi, scan_tab, (zero, zero)
            )
            len_c = (ent >> 8) & 0xFFF
            first_c = ent & 0xFF
            if pair2:
                sfx_c = (ent >> 20) & 0xFF
                pfx_c = (src_d >> 17) & 0xFFF
                src_d = src_d & 0x1FFFF
        else:
            def scan_tab(s, acc):
                p = (s % n_phys) * SEG if ring else s * SEG
                seg_rows = tab_ref[pl.ds(p, SEG)]
                hit = (ROW0 + p) == target[None]
                return acc + jnp.sum(jnp.where(hit, seg_rows, 0), axis=0)

            ent = jax.lax.fori_loop(s_lo, s_hi, scan_tab, zero)
            len_c = (ent >> 20) & 0xFFF
            first_c = (ent >> 12) & 0xFF
            src_d = ent & 0xFFF

        length = jnp.where(
            is_lit, 1, jnp.where(kwkwk, prev_len + 1, len_c)
        )
        first = jnp.where(
            first_step, code & 0xFF,
            jnp.where(root, code, jnp.where(kwkwk, prev_first, first_c)),
        )
        lit_byte = jnp.where(root, code, 0)  # stale first-code reads emit 0
        src = jnp.where(kwkwk, off - prev_len, src_d)

        # Output-bound check: a corrupt stream whose words overflow the
        # block is flagged (the reference's chain-corruption error class,
        # `decoder.rs:257-260`); it also keeps the packed 12-bit src field
        # exact for every entry the kernel goes on to insert.
        over = ok & (off + length > block_size)
        err = jnp.where(over, 2, err)
        err_code = jnp.where(over, code, err_code)
        ok = ok & jnp.logical_not(over)

        kind = jnp.where(
            ok, jnp.where(is_lit, KIND_LIT, KIND_COPY), KIND_HOLE
        )
        payload = jnp.where(is_lit, lit_byte, src)
        words_ref[0, j] = (kind << 29) | (length << 17) | payload

        # Insert entry (prev word + current first char) at the step row.
        ins = ok & jnp.logical_not(first_step) & (nxt < MAX_TABLE_SIZE)
        if wide:
            entry = jnp.where(
                ins,
                (((prev_len + 1) & 0xFFF) << 8) | (prev_first & 0xFF)
                | (((first & 0xFF) << 20) if pair2 else 0),
                0,
            )
            entry2 = jnp.where(
                ins,
                (off - prev_len)
                | (((prev_code & 0xFFF) << 17) if pair2 else 0),
                0,
            )
        else:
            entry = jnp.where(
                ins,
                (((prev_len + 1) & 0xFFF) << 20)
                | ((prev_first & 0xFF) << 12)
                | ((off - prev_len) & 0xFFF),
                0,
            )
        if ring:
            tab_ref[t % TAB_H] = entry
            if wide:
                tab2_ref[t % TAB_H] = entry2
        elif variable:
            tab_ref[t] = entry
            if wide:
                tab2_ref[t] = entry2
        else:
            # Fixed tables freeze at 4096 entries (last insert at step
            # 3840); later rows are never read, so the table is capped.
            @pl.when(t < TAB_H)
            def _store():
                tab_ref[t] = entry
                if wide:
                    tab2_ref[t] = entry2
        if pair2:
            # Stride-2 chain descriptor for the entry created this step
            # (code nxt, prefix prev_code, suffix `first`).  pps still
            # describes the code consumed at step t-1 == prev_code:
            # pps < 0 means prev_code was a root/literal (chain ends after
            # byte1 = the root byte), else pps = pfx(prev_code)<<8 |
            # sfx(prev_code).
            p2 = jnp.where(
                pps < 0,
                (1 << 28) | ((prev_code & 0xFF) << 8) | (first & 0xFF),
                ((pps >> 8) << 16) | ((pps & 0xFF) << 8) | (first & 0xFF),
            )
            pair_ref[0, j] = jnp.where(ins, p2, 0)
        else:
            # Chain-walk table for the device pass 2: code | prefix |
            # suffix.
            pair_ref[0, j] = jnp.where(
                ins, (nxt << 20) | (prev_code << 8) | first, 0
            )
        nxt = nxt + ins.astype(jnp.int32)

        if pair2:
            # (prefix, suffix) of the code consumed THIS step, for the
            # next step's descriptor: roots/literals mark -1; the KwKwK
            # code is the entry just created (prefix prev_code, suffix
            # `first`); otherwise the lookup's extended planes have it.
            cpfx = jnp.where(kwkwk, prev_code, pfx_c)
            csfx = jnp.where(kwkwk, first, sfx_c)
            pps_new = jnp.where(is_lit, -1, (cpfx << 8) | (csfx & 0xFF))
            pps = jnp.where(ok, pps_new, pps)

        off = off + jnp.where(ok, length, 0)
        prev_len = jnp.where(ok, length, prev_len)
        prev_first = jnp.where(ok, first, prev_first)
        prev_code = jnp.where(ok, code, prev_code)
        if pair2:
            return (prev_len, prev_first, off, nxt, err, err_code,
                    prev_code, pps)
        return prev_len, prev_first, off, nxt, err, err_code, prev_code

    carry = tuple(state_ref[r] for r in range(n_state))
    carry = jax.lax.fori_loop(0, cell, step, carry)
    for r in range(n_state):
        state_ref[r] = carry[r]

    @pl.when(last_cell)
    def _finish():
        stats_ref[0, 0] = carry[2]  # total decoded length
        stats_ref[0, 1] = carry[4]  # error flag
        stats_ref[0, 2] = carry[5]  # offending code

    return None


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "little", "interpret", "group", "cell",
                     "seg", "pair2"),
)
def decode_pass1_fixed_tpu(payloads, plens, block_size: int,
                           little: bool = True, interpret: bool = False,
                           group: int = GROUP, cell: int = CELL,
                           seg: int = SEG, pair2: bool = False):
    """Fixed-12 pass 1 on TPU: payload bytes -> per-code copy descriptors.

    Args:
      payloads: u8[N, PB] compressed payloads, zero-padded, PB % 3 == 0.
      plens:    i32[N] payload byte lengths.
      block_size: decoded block bound (container block size).
      pair2: emit stride-2 chain descriptors (for
        :func:`decode_pass2_stride2`) instead of the (code, prefix,
        suffix) pair rows; forces the two-plane table layout.
    Returns:
      words i32[N, S] descriptors, n_codes i32[N], total i32[N],
      err i32[N], err_code i32[N].
    """
    N, PB = payloads.shape
    if pair2 and group > 2048:
        group = 2048  # two extended planes: keep the VMEM tables in budget
    assert N % group == 0 and group % 128 == 0
    assert block_size <= MAX_BLOCK
    wide = block_size > NARROW_BLOCK or pair2
    sub = group // 128
    G = N // group

    codes, n_codes = unpack12(payloads, plens, little)
    S_raw = codes.shape[1]
    S = ((S_raw + cell - 1) // cell) * cell
    codes = jnp.concatenate(
        [codes, jnp.zeros((N, S - S_raw), jnp.int32)], axis=1
    )

    x = codes.reshape(G, sub, 128, S).transpose(0, 3, 1, 2)
    nc = n_codes.reshape(G, 1, sub, 128)

    words, pair, stats = pl.pallas_call(
        _make_kernel(seg, None, block_size, pair2=pair2),
        grid=(G, S // cell),
        in_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 1, sub, 128), lambda g, c: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 8, sub, 128), lambda g, c: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, S, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, S, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, sub, 128), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM(
                (min((S + seg - 1) // seg, (3840 + seg) // seg) * seg,
                 sub, 128),
                jnp.int32,
            )] * (2 if wide else 1)
            + [pltpu.VMEM((8 if pair2 else 7, sub, 128), jnp.int32)]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, nc)

    words = words.reshape(G, S, group).transpose(0, 2, 1).reshape(N, S)
    stats = stats.reshape(G, 8, group).transpose(0, 2, 1).reshape(N, 8)
    return words, n_codes, stats[:, 0], stats[:, 1], stats[:, 2], (pair, codes)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "S", "block_size", "interpret", "group",
                     "cell", "seg", "pair2"),
)
def _variable_pass1_from_payloads(payloads, counts, sched, spec, S,
                                  block_size, interpret, group, cell, seg,
                                  pair2: bool = False):
    """Device unpack (payload bytes -> dense codes) + pass-1 kernel, one jit.

    Payload bytes are the only host->device transfer; the 4-byte dense code
    matrix never crosses the (slow) host link.
    """
    from lzw_tpu.kernels import schedule as _sched_mod

    dense, data_ok = _sched_mod.unpack_variable_device(
        payloads, counts, spec, S
    )
    words, stats, pair = _variable_pass1(
        dense, counts, sched, spec, block_size, interpret, group, cell, seg,
        pair2,
    )
    return words, stats, pair, dense, data_ok


def _variable_pass1(codes, n_codes, sched, spec, block_size, interpret,
                    group, cell, seg, pair2: bool = False):
    N, S = codes.shape
    sub = group // 128
    G = N // group
    wide = block_size > NARROW_BLOCK or pair2
    x = codes.reshape(G, sub, 128, S).transpose(0, 3, 1, 2)
    nc = n_codes.reshape(G, 1, sub, 128)
    tab_h = min(((S + seg - 1) // seg) * seg, 4096)
    words, pair, stats = pl.pallas_call(
        _make_kernel(seg, spec.alphabet_size, block_size, ring=S > tab_h,
                     pair2=pair2),
        grid=(G, S // cell),
        in_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 1, sub, 128), lambda g, c: (g, 0, 0, 0)),
            pl.BlockSpec((2, cell), lambda g, c: (0, c),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 8, sub, 128), lambda g, c: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, S, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, S, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, sub, 128), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((tab_h, sub, 128), jnp.int32)] * (2 if wide else 1)
            + [pltpu.VMEM((8 if pair2 else 7, sub, 128), jnp.int32)]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, nc, sched)
    words = words.reshape(G, S, group).transpose(0, 2, 1).reshape(N, S)
    stats = stats.reshape(G, 8, group).transpose(0, 2, 1).reshape(N, 8)
    return words, stats, pair


def prepare_variable_decode(payloads_np, plens_np, spec, cell: int = CELL):
    """Host half of the strict variable decode: per-stream code-count
    recovery + frame-level strictness (a handful of byte reads per stream)
    and the static per-step schedule scalars.  In production this is the
    only host work in the decode path; everything downstream
    (:func:`decode_variable_device_run`) is one jitted device computation.

    Returns (counts i32[N], strict bool[N], sched_arr i32[2, S], S).
    """
    from lzw_tpu.kernels import schedule as _sched_mod

    import numpy as np

    N = payloads_np.shape[0]
    counts, strict, S_raw = _sched_mod.recover_counts(
        np.asarray(payloads_np), np.asarray(plens_np, dtype=np.int64), spec
    )
    # Size the dense code matrix by the batch's actual longest stream, not
    # the worst-case bound (at 64 KiB blocks the bound is ~2x the need).
    S_need = min(S_raw, max(int(counts.max()) if N else 1, 1))
    S = max(((S_need + cell - 1) // cell) * cell, cell)
    sched = _sched_mod.emission_schedule(spec, S)
    # Per-step scalars: decoder-side next index and epoch start ordinal.
    sched_arr = np.zeros((2, S), np.int32)
    sched_arr[0, :] = (sched.nxt_of[:S] - 1).astype(np.int32)
    sched_arr[1, :] = sched.epoch_start[:S].astype(np.int32)
    return counts, strict, sched_arr, S


def decode_pass1_variable_tpu(payloads, plens, spec, block_size: int,
                              interpret: bool = False,
                              group: int = GROUP_VAR,
                              cell: int = CELL, seg: int = 128):
    """Variable-flavor strict-stream pass 1: payloads -> copy descriptors.

    Strict streams (everything salzweg or this framework emits) follow the
    static emission schedule, so stream lengths are recovered host-side
    (`prepare_variable_decode`) and the kernel consumes device-unpacked
    aligned data codes with per-step schedule scalars.  Returns an extra
    ``strict`` bool mask; non-strict streams must go through a fallback
    decoder.

    Returns (words, n_codes, total, err, err_code, strict).
    """
    import numpy as np

    N, PB = payloads.shape
    if block_size > NARROW_BLOCK and group > 1024:
        group = 1024  # two ring planes: keep the VMEM tables under budget
    assert N % group == 0 and group % 128 == 0
    assert block_size <= MAX_BLOCK
    assert 4096 % seg == 0  # ring table segments
    counts, strict, sched_arr, S = prepare_variable_decode(
        payloads, plens, spec, cell
    )
    words, stats, pair, dense, data_ok = _variable_pass1_from_payloads(
        jnp.asarray(payloads), jnp.asarray(counts.astype(np.int32)),
        jnp.asarray(sched_arr), spec, S, block_size, interpret, group, cell,
        seg,
    )
    strict = strict & np.asarray(data_ok)
    return (words, counts, stats[:, 0], stats[:, 1], stats[:, 2], strict,
            (pair, dense, sched_arr))


def decode_variable_device_run(payloads, counts, sched_arr, spec, S: int,
                               block_size: int, interpret: bool = False,
                               group: int = GROUP_VAR, cell: int = CELL,
                               seg: int = 128, group2: int = 2048,
                               seg2: int = 256):
    """Device half of the strict variable decode (jit-friendly): unpack +
    pass 1 + chain-walk pass 2, all on the chip.  ``counts``/``sched_arr``/
    ``S`` come from :func:`prepare_variable_decode`.

    Returns (blocks u8[N, block_size], totals, errs, err_codes, data_ok).
    """
    import numpy as np

    N = payloads.shape[0]
    if block_size > NARROW_BLOCK and group > 1024:
        group = 1024  # two ring planes: keep the VMEM tables under budget
    words, stats, pair, dense, data_ok = _variable_pass1_from_payloads(
        jnp.asarray(payloads), jnp.asarray(np.asarray(counts, np.int32)),
        jnp.asarray(sched_arr), spec, S, block_size, interpret, group, cell,
        seg,
    )
    totals, errs, err_codes = stats[:, 0], stats[:, 1], stats[:, 2]
    # Pass 2 holds the whole codes+pair tables per lane in VMEM; at big
    # block sizes (S in the tens of thousands) shrink the instance so the
    # tables fit the 100 MB scoped-vmem limit.  The pipeline double-buffers
    # both input blocks across grid groups, so the real footprint is
    # 2 tables x 2 copies x S x sub x 128 x 4B (seen live at 64 KiB:
    # S=28672, sub=2 allocated 113 MB and OOM'd the compile).  The sublane
    # budget must round DOWN to a power of two (a 3-sublane group never
    # divides a power-of-two N — seen live: the halving loop degraded to
    # group2=1 and tripped pass 2's shape assert), and pass 2 must not
    # regroup UP past pass 1's group (the pair-table regroup only splits).
    budget = 118 << 20  # vs pass 2's 126 MB scoped-vmem ceiling
    sub_max = max(1, budget // (S * 128 * 4 * 4))
    sub_max = 1 << (sub_max.bit_length() - 1)
    group2 = max(128, min(group2, sub_max * 128, group))
    while N % group2 and group2 > 128:
        group2 //= 2
    epochs = jnp.asarray(np.asarray(sched_arr)[1, :S].astype(np.int32))
    codes_aug = dense | (epochs[None, :] << 12)
    out = decode_pass2_device(
        codes_aug, pair, jnp.asarray(np.asarray(counts, np.int32)), totals,
        block_size, alphabet=spec.alphabet_size, interpret=interpret,
        group=group2, cell=cell, seg=seg2, variable=True,
    )
    return out, totals, errs, err_codes, data_ok


def decode_variable_all_device(payloads, plens, spec, block_size: int,
                               interpret: bool = False,
                               group: int = GROUP_VAR, cell: int = CELL,
                               seg: int = 128, group2: int = 2048,
                               seg2: int = 32, epoch_split: bool = True,
                               pooled: bool = True):
    """Whole variable-flavor decode on the chip (strict streams).

    Pass 1 builds the copy descriptors and pair table; pass 2 chain-walks
    them with row-matched lookups.  The default engine (r5) is the
    sorted-pool stride-2 epoch walk (:func:`decode_variable_epochs_pooled`);
    ``pooled=False`` keeps the per-epoch dispatches, ``epoch_split=False``
    the legacy whole-stream pass 2 — both for A/B.  Returns (blocks
    u8[N, block_size], totals, errs, err_codes, strict); non-strict streams
    must go through a fallback decoder.
    """
    import numpy as np

    counts, strict, sched_arr, S = prepare_variable_decode(
        payloads, plens, spec, cell
    )
    run = (decode_variable_epochs_pooled if (epoch_split and pooled)
           else decode_variable_epochs_run if epoch_split
           else decode_variable_device_run)
    out, totals, errs, err_codes, data_ok = run(
        payloads, counts, sched_arr, spec, S, block_size,
        interpret=interpret, group=group, cell=cell, seg=seg, group2=group2,
        seg2=seg2,
    )
    strict = strict & np.asarray(data_ok)
    return out, totals, errs, err_codes, strict


# --------------------------------------------------------------------------- #
# Epoch-split variable decode                                                 #
# --------------------------------------------------------------------------- #
#
# Strict variable streams reset the dictionary at table-full (the encoder's
# own CLEAR, `encoder.rs:330-333`), so the code stream factors into
# *independent* dictionary epochs at STATIC ordinals (the emission
# schedule's clear_after positions).  Decoding lanes = (block, epoch) units
# instead of whole blocks bounds both pass-2 scan windows by one epoch's
# table (<= ~3.8k rows instead of the whole stream, the r3 scan-spread
# disease) and shrinks per-lane VMEM so 4x more lanes share each scan.
# Epoch outputs are reassembled with per-lane shifts (no gather).


@functools.lru_cache(maxsize=64)
def epoch_bounds(spec, S: int):
    """Static (start, end) data-code ordinal spans of dictionary epochs."""
    from lzw_tpu.kernels import schedule as _sched_mod

    sched = _sched_mod.emission_schedule(spec, S)
    starts = [0]
    for m in range(S - 1):
        if sched.clear_after[m]:
            starts.append(m + 1)
    return tuple(
        (a, b) for a, b in zip(starts, list(starts[1:]) + [S])
    )


@functools.partial(jax.jit, static_argnames=("spec", "S"))
def _epoch_totals(words, spec, S: int):
    """Per-(block, epoch) decoded byte counts from pass-1 descriptors."""
    lens = jnp.where(
        (words >> 29) == KIND_HOLE, 0, (words >> 17) & 0xFFF
    )
    cum = jnp.cumsum(lens.astype(jnp.int32), axis=1)
    idx = jnp.asarray([b - 1 for (_a, b) in epoch_bounds(spec, S)])
    ends = cum[:, idx]
    starts = jnp.concatenate(
        [jnp.zeros((cum.shape[0], 1), cum.dtype), ends[:, :-1]], axis=1
    )
    return ends - starts


@functools.partial(
    jax.jit, static_argnames=("Bp", "n_parts"),
)
def _assemble_epochs_acc(parts, cums, Bp: int, n_parts: int):
    """Place per-epoch outputs at their per-lane offsets and sum.

    parts: list of u8[N, R_e] epoch outputs (zero past each unit's total);
    cums:  list of i32[N] output offsets.  Regions are disjoint, so the
    shifted sum is exact placement — no gather/scatter anywhere.
    """
    from lzw_tpu.kernels.common import shift_columns_jax

    N = parts[0].shape[0]
    acc = jnp.zeros((Bp, N), jnp.uint8)
    for e in range(n_parts):
        p = parts[e].T  # (R_e, N) position-major
        R_e = p.shape[0]
        if R_e < Bp:
            p = jnp.concatenate(
                [p, jnp.zeros((Bp - R_e, N), jnp.uint8)], axis=0
            )
        elif R_e > Bp:  # bucketed bound past the block bound: all zeros there
            p = p[:Bp]
        sh = jnp.clip(cums[e], 0, Bp - 1)
        acc = acc + shift_columns_jax(p, sh, fill=0)
    return acc


@functools.partial(jax.jit, static_argnames=("block_size",))
def _assemble_epochs_t(acc, block_size: int):
    return acc.T[:, :block_size]


def _assemble_epochs(parts, cums, Bp: int, block_size: int, n_parts: int):
    """Two dispatches, NOT one jit: per-lane shifts fused with a trailing
    transpose MISCOMPILE on this hardware at >= ~16k rows (the r4
    shift+flip+transpose find — see decode_pass2_device's docstring)."""
    acc = _assemble_epochs_acc(tuple(parts), tuple(cums), Bp, n_parts)
    return _assemble_epochs_t(acc, block_size)


@functools.partial(jax.jit, static_argnames=("base", "W"),
                   donate_argnums=(0,))
def _acc_place_window(acc, part, cum, base: int, W: int):
    """Add epoch part rows into ``acc[base:base+W]`` at per-lane offsets.

    ``part`` is u8[N, R_e] rows left-aligned at column 0; row n's bytes
    belong at global position ``cum[n]``.  All nonzero content fits the
    ``[base, base+W)`` window (the caller sizes it from the pooled stats),
    so the log-shift runs over W rows instead of the whole canvas — the
    whole point vs :func:`_assemble_epochs_acc`.  Zero-te rows may carry
    out-of-window cum values; their columns are all zero, so the clipped
    shift is harmless.
    """
    from lzw_tpu.kernels.common import shift_columns_jax

    N, R_e = part.shape
    p = part.T
    if R_e < W:
        p = jnp.concatenate([p, jnp.zeros((W - R_e, N), jnp.uint8)], axis=0)
    elif R_e > W:
        p = p[:W]
    delta = jnp.where(cum >= base, cum - base, 0).astype(jnp.int32)
    sh = jnp.clip(delta, 0, W - 1)
    win = shift_columns_jax(p, sh, fill=0)
    return acc.at[base : base + W].add(win)


def _assemble_epochs_windowed(parts, cums, windows, Bp: int,
                              block_size: int):
    """Windowed placement assembly (the pooled driver's tail).

    ``windows[e]`` is ``(base, W)`` with base/W bucketed on the host from
    the pooled stats pull — ``W == 0`` skips an empty epoch entirely.
    Same two-dispatch split as :func:`_assemble_epochs` (shift families
    must not fuse with the trailing transpose on this hardware).
    """
    N = parts[0].shape[0]
    acc = jnp.zeros((Bp, N), jnp.uint8)
    for e, p in enumerate(parts):
        base, W = windows[e]
        if W <= 0:
            continue
        acc = _acc_place_window(acc, p, cums[e], base, W)
    return _assemble_epochs_t(acc, block_size)


def decode_variable_epochs_run(payloads, counts, sched_arr, spec, S: int,
                               block_size: int, interpret: bool = False,
                               group: int = GROUP_VAR, cell: int = CELL,
                               seg: int = 128, cell2: int = CELL,
                               seg2: int = 128, group2: int = 2048,
                               stride2: bool = True, bound_mode: int = 0):
    """Epoch-split device half of the strict variable decode.

    Same contract as :func:`decode_variable_device_run` (pass 1 + device
    pass 2, returns (blocks, totals, errs, err_codes, data_ok)) but pass 2
    runs one dispatch per dictionary epoch over (block, epoch) units, with
    one small host sync for the per-epoch output bounds.  ``stride2``
    (default since r5) walks two chain nodes per round on pass-1 stride-2
    descriptors — half the scans per byte.
    """
    import numpy as np

    N = payloads.shape[0]
    if block_size > NARROW_BLOCK and group > 1024:
        group = 1024  # pass-1 two-plane ring VMEM budget
    group = max(128, min(group, N))
    while N % group and group > 128:
        group //= 2
    cdev = counts.astype(jnp.int32) if isinstance(counts, jax.Array) \
        else jnp.asarray(np.asarray(counts, np.int32))
    words, stats, pair, dense, data_ok = _variable_pass1_from_payloads(
        jnp.asarray(payloads), cdev, jnp.asarray(sched_arr), spec, S,
        block_size, interpret, group, cell, seg, pair2=stride2,
    )
    totals, errs, err_codes = stats[:, 0], stats[:, 1], stats[:, 2]
    te = _epoch_totals(words, spec, S)
    te_np = np.asarray(te)  # the one host sync: N x n_epochs i32
    bounds = epoch_bounds(spec, S)

    Bp = ((block_size + cell2 - 1) // cell2) * cell2
    parts, cums = [], []
    cum_dev = jnp.cumsum(te, axis=1) - te  # exclusive per-lane offsets
    budget = 118 << 20
    for e, (a, b) in enumerate(bounds):
        r_need = int(te_np[:, e].max()) if N else 0
        if r_need > 0:
            # Bucket the output bound (pow2 up to the 8192-round segment
            # size, then whole segments): padding rounds are nearly free
            # (empty scan windows), recompiles are not, and all >= 8192
            # buckets share one compiled segment program.
            if r_need <= 8192:
                r_need = max(1 << (r_need - 1).bit_length(), cell2)
            else:
                r_need = -(-r_need // 8192) * 8192
            r_need = min(r_need, ((Bp + 8191) // 8192) * 8192)
            L = b - a
            Ltab = ((max(L, 1) + seg2 - 1) // seg2) * seg2
            sub_max = max(1, budget // (Ltab * 128 * 4 * 4))
            sub_max = 1 << (sub_max.bit_length() - 1)
            # The pair-table regroup only SPLITS sublanes, so pass 2 must
            # not regroup UP past pass 1's group (r3 live find).
            g2 = max(128, min(group2, sub_max * 128, group))
            while N % g2 and g2 > 128:
                g2 //= 2
            if stride2:
                out_e = decode_pass2_stride2(
                    dense[:, a:b], pair[:, a:b], jnp.clip(cdev - a, 0, L),
                    te[:, e], r_need, alphabet=spec.alphabet_size,
                    interpret=interpret, group=g2, cell=cell2, seg=seg2,
                    first_free=spec.first_free_code, bound_mode=bound_mode,
                )
            else:
                out_e = decode_pass2_device(
                    dense[:, a:b], pair[:, a:b], jnp.clip(cdev - a, 0, L),
                    te[:, e], r_need, alphabet=spec.alphabet_size,
                    interpret=interpret, group=g2, cell=cell2, seg=seg2,
                    variable=False, first_free=spec.first_free_code,
                )
            parts.append(out_e)
            cums.append(cum_dev[:, e])
    if not parts:
        out = jnp.zeros((N, block_size), jnp.uint8)
    else:
        out = _assemble_epochs(
            tuple(parts), tuple(cums), Bp, block_size, len(parts)
        )
    return out, totals, errs, err_codes, data_ok


@functools.partial(jax.jit, static_argnames=("bounds", "L", "batch"))
def _pool_sort_device(dense, pair, counts, te, bounds, L: int, batch: int):
    """Pool (block, epoch) unit columns and sort them by byte total, all on
    device — one fused program; returns the sorted unit tables, the inverse
    permutation, the per-block exclusive output offsets, and one stats
    vector [batch maxima | epoch start minima | epoch end maxima] (the only
    values the host needs, pulled in a single transfer: round counts for
    pass 2 plus the placement windows for the assembly).
    """
    N = dense.shape[0]
    G1, Sp, sub1, _ = pair.shape
    pair_n = pair.transpose(0, 2, 3, 1).reshape(G1 * sub1 * 128, Sp)
    dense_u, pair_u, nloc_u = _pool_units(dense, pair_n, counts, bounds, L)
    U = len(bounds) * N
    te_flat = te.T.reshape(U)
    order = jnp.argsort(te_flat, stable=True).astype(jnp.int32)
    inv = jnp.argsort(order, stable=True).astype(jnp.int32)
    te_sorted = jnp.take(te_flat, order)
    batch_maxes = te_sorted[batch - 1 :: batch]
    # Placement windows: nonzero units of epoch e land in
    # [min cum, max cum+te) — zero-te units park at their block's tail and
    # must not widen the window.
    cum = jnp.cumsum(te, axis=1) - te
    pos = te > 0
    big = jnp.int32(1) << 30
    start_min = jnp.min(jnp.where(pos, cum, big), axis=0)
    end_max = jnp.max(jnp.where(pos, cum + te, 0), axis=0)
    stats = jnp.concatenate(
        [batch_maxes, start_min, end_max]
    ).astype(jnp.int32)
    return (jnp.take(dense_u, order, axis=0),
            jnp.take(pair_u, order, axis=0),
            jnp.take(nloc_u, order, axis=0),
            te_sorted, inv, cum, stats)


def _pool_units(dense_n, pair_n, counts, bounds, L: int):
    """Slice per-epoch unit columns out of whole-stream rows.

    dense_n/pair_n: i32[N, S] (block-major).  Returns (dense u, pair u,
    nloc u) as i32[E*N, L] in epoch-major unit order (u = e*N + block),
    zero-padded past each epoch's span.
    """
    N, S = dense_n.shape
    dps, pps, nls = [], [], []
    for (a, b) in bounds:
        w = b - a
        pad = ((0, 0), (0, L - w))
        dps.append(jnp.pad(dense_n[:, a:b], pad))
        pps.append(jnp.pad(pair_n[:, a:b], pad))
        nls.append(jnp.clip(counts - a, 0, w))
    return (jnp.concatenate(dps, axis=0), jnp.concatenate(pps, axis=0),
            jnp.concatenate(nls, axis=0))


def decode_variable_epochs_pooled(payloads, counts, sched_arr, spec, S: int,
                                  block_size: int, interpret: bool = False,
                                  group: int = GROUP_VAR, cell: int = CELL,
                                  seg: int = 128, cell2: int = CELL,
                                  seg2: int = 32, group2: int = 2048,
                                  batch: int = 2048):
    """Sorted-pool epoch-split decode (r5 default on hardware).

    Same contract as :func:`decode_variable_epochs_run`, but the (block,
    epoch) units of ALL epochs are pooled, sorted by output size, and
    dispatched in same-size batches.  Two effects (EVOLUTION.md r4
    "remaining levers"): padding rounds track each batch's own maximum
    instead of the global epoch maximum, and — the bigger one — lanes in
    an instance decode at similar rates, so the word-table scan's
    [min, max] row window stays tight (full epochs all hold the same code
    count; a unit's byte total IS its rate, so sorting by total aligns
    whole trajectories).  Unit tables move through two row-gathers
    (~10 GB/s on chip, measured) — noise against the scan savings.
    """
    import numpy as np

    N = payloads.shape[0]
    group = max(128, min(group, N))
    while N % group and group > 128:
        group //= 2
    cdev = counts.astype(jnp.int32) if isinstance(counts, jax.Array) \
        else jnp.asarray(np.asarray(counts, np.int32))
    words, stats, pair, dense, data_ok = _variable_pass1_from_payloads(
        jnp.asarray(payloads), cdev, jnp.asarray(sched_arr), spec, S,
        block_size, interpret, group, cell, seg, pair2=True,
    )
    totals, errs, err_codes = stats[:, 0], stats[:, 1], stats[:, 2]
    te = _epoch_totals(words, spec, S)
    bounds = epoch_bounds(spec, S)
    E = len(bounds)
    L0 = max(b - a for (a, b) in bounds)
    L = ((L0 + seg2 - 1) // seg2) * seg2
    U = E * N
    batch = min(max(group2, min(batch, U)), U)
    while U % batch and batch > 128:
        batch //= 2

    # Sort + gathers run on device; the ONLY host sync is one small stats
    # vector (per-batch maxima for the static round counts + per-epoch
    # placement windows for the assembly).
    (dense_s, pair_s, nloc_s, te_sorted_dev, inv, cum,
     stats_dev) = _pool_sort_device(
        dense, pair, cdev, te, bounds, L, batch,
    )
    stats_np = np.asarray(stats_dev)
    n_bm = U // batch
    te_bm = stats_np[:n_bm]
    ep_start = stats_np[n_bm : n_bm + E]
    ep_end = stats_np[n_bm + E : n_bm + 2 * E]

    g2 = min(group2, batch)
    outs = []
    widths = []
    Bp2 = ((block_size + cell2 - 1) // cell2) * cell2
    for k in range(U // batch):
        r_need = int(te_bm[k])  # sorted: each batch's last is its max
        if r_need <= 0:
            outs.append(None)
            widths.append(0)
            continue
        # Sorted batches track their own maxima, so buckets can be fine:
        # 2048-byte steps (1024 rounds) bound both padding (< 2048 B/unit)
        # and compile diversity (<= 64 programs at 128 KiB blocks, all
        # persistent-cached).
        r_need = max(-(-r_need // 2048) * 2048, cell2)
        r_need = min(r_need, -(-Bp2 // 2048) * 2048)
        rows = slice(k * batch, (k + 1) * batch)
        out_k = decode_pass2_stride2(
            dense_s[rows], _as_pair4d(pair_s[rows], g2), nloc_s[rows],
            te_sorted_dev[rows], r_need, alphabet=spec.alphabet_size,
            interpret=interpret, group=g2, cell=cell2, seg=seg2,
            first_free=spec.first_free_code,
        )
        outs.append(out_k)
        widths.append(out_k.shape[1])
    Rmax = max(widths) if any(widths) else 0
    if Rmax == 0:
        out = jnp.zeros((N, block_size), jnp.uint8)
        return out, totals, errs, err_codes, data_ok
    # All-zero batches are a PREFIX of the sorted order (batch maxima are
    # nondecreasing); elide them from the gather source — one shared zero
    # row stands in for all their units.
    nz0 = next(k for k, w in enumerate(widths) if w > 0)
    assert all(w > 0 for w in widths[nz0:]), "sorted maxima must ascend"
    Z = nz0 * batch
    pool_parts = []
    for out_k in outs[nz0:]:
        if out_k.shape[1] < Rmax:
            out_k = jnp.pad(out_k, ((0, 0), (0, Rmax - out_k.shape[1])))
        pool_parts.append(out_k)
    if Z:
        pool_parts.insert(0, jnp.zeros((1, Rmax), jnp.uint8))
    out_sorted = jnp.concatenate(pool_parts, axis=0)
    idx = jnp.maximum(inv - (Z - 1), 0) if Z else inv
    out_pool = jnp.take(out_sorted, idx, axis=0)
    parts = [out_pool[e * N : (e + 1) * N] for e in range(E)]
    cums = [cum[:, e] for e in range(E)]
    Bp = ((block_size + cell2 - 1) // cell2) * cell2
    Bp = max(Bp, Rmax)
    # Placement windows, bucketed to 2048 rows for compile reuse; an empty
    # epoch (no nonzero unit) is skipped outright.
    windows = []
    for e in range(E):
        if ep_end[e] <= 0:
            windows.append((0, 0))
            continue
        base = (int(ep_start[e]) // 2048) * 2048
        W = -(-(int(ep_end[e]) - base) // 2048) * 2048
        W = min(W, Bp - base)
        windows.append((base, W))
    out = _assemble_epochs_windowed(
        tuple(parts), tuple(cums), tuple(windows), Bp, block_size
    )
    return out, totals, errs, err_codes, data_ok


def _as_pair4d(pair_rows, group: int):
    """(Nb, L) unit-major pair rows -> the walker's (G, L, sub, 128)."""
    Nb, L = pair_rows.shape
    sub = group // 128
    G = Nb // group
    return pair_rows.reshape(G, sub, 128, L).transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------- #
# Device pass 2: continuous backwards chain walk                              #
# --------------------------------------------------------------------------- #
#
# Each lane walks its block's words from LAST to FIRST: within a word the
# suffix chain naturally yields bytes back-to-front, and words are visited in
# reverse, so the emission stream is exactly the block's output REVERSED —
# positions never need to be materialized, and final assembly is a flip plus
# one per-lane shift (scatter-free).  Per round, two compare-scans serve all
# 1024 lanes: the word table (implicit: row<<12|code over the code stream)
# yields the next word's head code, and the pair table yields
# (prefix, suffix) of the current chain node.
#
# This is the all-device alternative to the native copy-apply pass 2 — it
# keeps the whole decode on the chip (useful when the host must stay out of
# the data path); the hybrid remains the throughput default.


def _make_pass2_kernel(seg: int, alphabet: int, variable: bool = False,
                       first_free: int | None = None, bound_mode: int = 0):
    """Backwards chain-walk pass 2.  Both table reads are per-lane gathers
    at statically-known rows, expressed as row-matched sum-selects over the
    [min, max] target window of the lanes: word w's code is at row w, and
    code c's pair entry is at row ``epoch_start + 1 + c - first_free``
    (``c - 255`` for fixed-12, where epoch_start is 0).  For variable
    flavors the per-word epoch start rides the high bits of the codes
    matrix (packed by the caller from the static schedule) and is carried
    per lane through the chain — every chain node of a word resolves in
    that word's epoch.

    The epoch-split driver (:func:`decode_variable_epochs_run`) instead
    slices streams at the static epoch boundaries and runs this kernel
    with ``variable=False`` plus an explicit variable-flavor
    ``first_free``: unit-local rows need no epoch carry, and both scan
    windows are bounded by one epoch's table instead of the whole stream.

    The walk state (word index, chain node, epoch row) enters and leaves
    as arrays so the driver can split long walks into round-segments:
    sub >= 4 instances MISCOMPUTE on this hardware once a single dispatch
    runs >= ~16k rounds (r4 live find, deterministic, interpret correct —
    third member of the shape-triggered miscompile family logged in
    EVOLUTION.md); segments of <= 8192 rounds with state carried between
    dispatches stay in the verified regime at full sublane count."""
    if first_free is None:
        first_free = alphabet + 2 if variable else FIRST_FREE

    def kernel(codes_ref, pair_ref, sin_ref, out_ref, sout_ref, state_ref):
        c = pl.program_id(1)
        last_cell = c == pl.num_programs(1) - 1
        sub = pair_ref.shape[2]
        cell = out_ref.shape[1]

        @pl.when(c == 0)
        def _init():
            for r in range(3):
                state_ref[r] = sin_ref[0, r]

        ROW0 = jax.lax.broadcasted_iota(jnp.int32, (seg, sub, 128), 0)
        BIG = jnp.int32(0x7FFFFFFF)
        n_code_segs = codes_ref.shape[1] // seg
        n_pair_segs = pair_ref.shape[1] // seg

        def bounded(lo, hi, nsegs):
            if bound_mode == 1:  # diagnostic: scan everything
                return jnp.int32(0), jnp.int32(nsegs)
            return lo // seg, hi // seg + 1

        # bound_mode 3/4: timing diagnostics — skip the word/pair scan
        # entirely (results are WRONG; used to attribute per-round cost).
        skip_words = bound_mode == 3
        skip_pairs = bound_mode == 4

        def _vmin(x):
            if bound_mode == 2:
                return jnp.min(jnp.min(x, axis=1), axis=0)
            return jnp.min(x)

        def _vmax(x):
            if bound_mode == 2:
                return jnp.max(jnp.max(x, axis=1), axis=0)
            return jnp.max(x)

        def round_step(j, carry):
            w, cur, est = carry  # (sub, 128)
            need = (cur < 0) & (w >= 0)

            # Word table: code of word w is codes_ref row w.
            wt = jnp.where(need, w, 0)
            s_lo, s_hi = bounded(
                _vmin(jnp.where(need, w, BIG)), _vmax(wt), n_code_segs
            )

            def scan_words(s, acc):
                seg_codes = codes_ref[0, pl.ds(s * seg, seg)]
                hit = (ROW0 + s * seg) == wt[None]
                return acc + jnp.sum(jnp.where(hit, seg_codes, 0), axis=0)

            zero = jnp.zeros((sub, 128), jnp.int32)
            if skip_words:
                head = zero
            else:
                head = jax.lax.fori_loop(s_lo, s_hi, scan_words, zero)
            if variable:
                est = jnp.where(need, head >> 12, est)
                head = head & 0xFFF
            cur = jnp.where(need, head, cur)

            active = cur >= 0
            root = active & (cur < alphabet)
            look = active & jnp.logical_not(root)

            # Pair entry of code c: row epoch_start + 1 + c - first_free.
            pt = jnp.where(look, est + 1 + cur - first_free, 0)
            p_lo, p_hi = bounded(
                _vmin(jnp.where(look, pt, BIG)), _vmax(pt), n_pair_segs
            )

            def scan_pairs(s, acc):
                seg_rows = pair_ref[0, pl.ds(s * seg, seg)]
                hit = (ROW0 + s * seg) == pt[None]
                return acc + jnp.sum(
                    jnp.where(hit, seg_rows & 0xFFFFF, 0), axis=0
                )

            if skip_pairs:
                pd = zero
            else:
                pd = jax.lax.fori_loop(p_lo, p_hi, scan_pairs, zero)

            byte = jnp.where(root, cur, pd & 0xFF)
            out_ref[0, j] = jnp.where(active, byte, 0)

            w = jnp.where(root, w - 1, w)
            cur = jnp.where(
                root, -1, jnp.where(active, pd >> 8, cur)
            )
            return w, cur, est

        w, cur, est = jax.lax.fori_loop(
            0, cell, round_step,
            (state_ref[0], state_ref[1], state_ref[2]),
        )
        state_ref[0] = w
        state_ref[1] = cur
        state_ref[2] = est

        @pl.when(last_cell)
        def _dump():
            for r in range(3):
                sout_ref[0, r] = state_ref[r]

    return kernel


def decode_pass2_device(codes, pair, n_codes, totals, block_size: int,
                        alphabet: int = 256, interpret: bool = False,
                        group: int = 2048, cell: int = CELL,
                        seg: int = 256, variable: bool = False,
                        first_free: int | None = None, bound_mode: int = 0,
                        r_seg_max: int = 8192):
    """All-device pass 2: copy-free chain walk -> decoded bytes.

    Args:
      codes: i32[N, S] aligned wire codes (pass-1 input layout).  For
        variable flavors each slot must carry the step's epoch-start row in
        its high bits (``code | epoch_start << 12``, static per step from
        the emission schedule) so pair lookups stay row-matched.
      pair:  i32[G1, S, sub1, 128] pair table from pass 1 (any grouping —
        regrouped here; pass 2 keeps smaller instances because the whole
        codes+pair tables live in VMEM).
      n_codes/totals: i32[N].
    Returns u8[N, block_size] decoded blocks (zero past totals).

    TWO dispatches, NOT one jit: fusing the per-lane shift with the final
    flip/transpose MISCOMPILES on this hardware at R >= ~16k rows
    (r4 live find: deterministic period-1312 corruption in an XLA-only
    shift+flip+transpose composite, no pallas involved; an
    optimization_barrier does NOT fix it, separate programs do — the same
    containment as encode_pack_variable_tpu's split).  Wrapping this
    function in an outer jax.jit would re-fuse the stages; don't.
    """
    N = codes.shape[0]
    R0 = ((block_size + cell - 1) // cell) * cell
    r_seg = min(R0, r_seg_max)
    R = (-(-R0 // r_seg)) * r_seg
    shifted = _pass2_walk_shift(
        codes, pair, n_codes, totals, block_size, alphabet, interpret,
        group, cell, seg, variable, first_free, bound_mode, r_seg_max,
    )
    return _pass2_finalize(shifted, N=N, R=R, block_size=block_size)


@functools.partial(jax.jit, static_argnames=("N", "R", "block_size"))
def _pass2_finalize(shifted, N: int, R: int, block_size: int):
    """Dispatch 2 of pass 2: flip to byte order and lay out per block."""
    out = jnp.flip(shifted, axis=1)
    out = out.transpose(0, 2, 1).reshape(N, R)[:, :block_size]
    return out.astype(jnp.uint8)


# --------------------------------------------------------------------------- #
# Stride-2 pass 2: two bytes per round                                        #
# --------------------------------------------------------------------------- #
#
# The r4 walker pays one pair-table scan per BYTE and one word-table scan
# per word transition; EVOLUTION.md's r4 timing shows the two scans cost
# about the same and dominate the round.  Stride-2 halves the rounds:
#
# * Pass 1 emits *stride-2* descriptors (``pair2=True``): for code c with
#   prefix p, ``done<<28 | prefix(p)<<16 | suffix(p)<<8 | suffix(c)`` —
#   one lookup yields TWO chain bytes and jumps two nodes (or finishes the
#   word when p is a root, whose byte rides the suffix(p) slot).  Built
#   from registers in pass 1: the step that creates the entry read
#   (prefix, suffix) of p at the previous step's table lookup (the planes
#   are extended by 20 bits to carry them).
# * The word table packs TWO heads per row (``dense[w] | dense[w-1]<<12``)
#   so consuming a 1-byte word and refilling the next costs one scan.
# * Each round writes a PACKED byte pair (b0 | b1<<8) at round row j =
#   reversed-stream positions 2j, 2j+1; rounds therefore halve, and each
#   round still runs at most one word scan + one pair scan.


def _make_pass2_kernel2(seg: int, alphabet: int, first_free: int,
                        bound_mode: int = 0):
    """Stride-2 backwards chain walk (unit-local rows: the epoch-split and
    fixed-flavor layout — code c's descriptor at row ``1 + c -
    first_free``, word w's packed heads at row w).

    Per-lane round state: ``w`` (current word), ``cur`` (chain node, -1 =
    refill from word table), ``pend`` (a buffered byte emitted first next
    round, -1 = none).  Every active round emits exactly two bytes, so
    positions stay a static function of the round index and the final
    assembly stays scatter-free."""

    def kernel(codes_ref, pair_ref, sin_ref, out_ref, sout_ref, state_ref):
        c = pl.program_id(1)
        last_cell = c == pl.num_programs(1) - 1
        sub = pair_ref.shape[2]
        cell = out_ref.shape[1]

        @pl.when(c == 0)
        def _init():
            for r in range(3):
                state_ref[r] = sin_ref[0, r]

        ROW0 = jax.lax.broadcasted_iota(jnp.int32, (seg, sub, 128), 0)
        BIG = jnp.int32(0x7FFFFFFF)
        n_code_segs = codes_ref.shape[1] // seg
        n_pair_segs = pair_ref.shape[1] // seg
        zero = jnp.zeros((sub, 128), jnp.int32)
        neg1 = jnp.full((sub, 128), -1, jnp.int32)

        def round_step(j, carry):
            w, cur, pend = carry  # (sub, 128)
            use_pend = pend >= 0
            lane_on = (w >= 0) | use_pend | (cur >= 0)
            refill = (cur < 0) & (w >= 0)
            cur_root = (cur >= 0) & (cur < alphabet)

            # Word table: packed heads (head(w), head(w-1)) at row w —
            # needed by refilling lanes and by lanes consuming a root
            # (their next word's head is the row's upper field).
            need_w = lane_on & (refill | (jnp.logical_not(use_pend)
                                          & cur_root))
            wt = jnp.where(need_w, w, 0)
            s_lo = jnp.min(jnp.where(need_w, w, BIG)) // seg
            s_hi = jnp.max(wt) // seg + 1

            def scan_words(s, acc):
                seg_codes = codes_ref[0, pl.ds(s * seg, seg)]
                hit = (ROW0 + s * seg) == wt[None]
                return acc + jnp.sum(jnp.where(hit, seg_codes, 0), axis=0)

            # bound_mode 3/4: timing diagnostics — skip the word/pair scan
            # (results WRONG; used to attribute per-round cost).
            if bound_mode == 3:
                h2v = zero
            else:
                h2v = jax.lax.fori_loop(s_lo, s_hi, scan_words, zero)
            h = h2v & 0xFFF
            hm1 = (h2v >> 12) & 0xFFF

            # Slot 0: buffered byte, or the chain step on cur0.
            cur0 = jnp.where(refill, h, cur)
            root0 = (cur0 >= 0) & (cur0 < alphabet)
            consume0 = (lane_on & jnp.logical_not(use_pend)
                        & root0)
            w1 = w - consume0.astype(jnp.int32)

            # Slot-1 node for lanes whose slot 0 did not come from a pair
            # lookup; the sentinel upper field at w == 0 (0xFFF) is
            # unreachable because w1 < 0 guards it.
            node1 = jnp.where(
                use_pend,
                jnp.where(cur >= 0, cur, jnp.where(w >= 0, h, -1)),
                jnp.where(root0 & (w1 >= 0), hm1, -1),
            )
            pair_both = (lane_on & jnp.logical_not(use_pend)
                         & (cur0 >= 0) & jnp.logical_not(root0))
            q = jnp.where(
                pair_both, cur0, jnp.where(node1 >= alphabet, node1, -1)
            )

            look = q >= 0
            pt = jnp.where(look, 1 + q - first_free, 0)
            p_lo = jnp.min(jnp.where(look, pt, BIG)) // seg
            p_hi = jnp.max(pt) // seg + 1

            def scan_pairs(s, acc):
                seg_rows = pair_ref[0, pl.ds(s * seg, seg)]
                hit = (ROW0 + s * seg) == pt[None]
                return acc + jnp.sum(jnp.where(hit, seg_rows, 0), axis=0)

            if bound_mode == 4:
                pv = zero
            else:
                pv = jax.lax.fori_loop(p_lo, p_hi, scan_pairs, zero)
            pdone = (pv >> 28) != 0
            pnext = (pv >> 16) & 0xFFF
            pb1 = (pv >> 8) & 0xFF
            pb0 = pv & 0xFF

            node1_root = (node1 >= 0) & (node1 < alphabet)
            node1_pair = node1 >= alphabet
            b0 = jnp.where(
                use_pend, pend,
                jnp.where(root0, cur0, pb0),
            )
            b1 = jnp.where(
                pair_both, pb1,
                jnp.where(node1_root, node1,
                          jnp.where(node1_pair, pb0, 0)),
            )
            out_ref[0, j] = jnp.where(
                lane_on, (b0 & 0xFF) | ((b1 & 0xFF) << 8), 0
            )

            fin_pair = (pair_both | node1_pair) & pdone
            pend = jnp.where(lane_on & node1_pair, pb1, neg1)
            cur = jnp.where(
                lane_on & (pair_both | node1_pair)
                & jnp.logical_not(pdone),
                pnext, neg1,
            )
            w = w1 - (node1_root | fin_pair).astype(jnp.int32)
            return w, cur, pend

        w, cur, pend = jax.lax.fori_loop(
            0, cell, round_step,
            (state_ref[0], state_ref[1], state_ref[2]),
        )
        state_ref[0] = w
        state_ref[1] = cur
        state_ref[2] = pend

        @pl.when(last_cell)
        def _dump():
            for r in range(3):
                sout_ref[0, r] = state_ref[r]

    return kernel


def decode_pass2_stride2(codes, pair, n_codes, totals, block_size: int,
                         alphabet: int = 256, interpret: bool = False,
                         group: int = 2048, cell: int = CELL,
                         seg: int = 256, first_free: int | None = None,
                         r_seg_max: int = 8192, bound_mode: int = 0):
    """Stride-2 all-device pass 2: packed byte-pair chain walk.

    Same contract as :func:`decode_pass2_device` with ``variable=False``
    (unit-local rows: the epoch-split and fixed-flavor layout), but
    ``pair`` must hold the stride-2 descriptors from pass 1's
    ``pair2=True`` mode.  Rounds emit two bytes, halving both scans per
    byte.  TWO dispatches for the same reason as the stride-1 path (the
    r4 shift+flip+transpose miscompile)."""
    N = codes.shape[0]
    if first_free is None:
        first_free = FIRST_FREE
    R0 = ((block_size + 1) // 2 + cell - 1) // cell * cell  # rounds
    shifted = _pass2_walk_shift2(
        codes, pair, n_codes, totals, R0, alphabet, interpret, group, cell,
        seg, first_free, r_seg_max, bound_mode,
    )
    r_seg = min(R0, r_seg_max)
    R2 = (-(-R0 // r_seg)) * r_seg
    return _pass2_finalize(shifted, N=N, R=2 * R2, block_size=block_size)


@functools.partial(
    jax.jit,
    static_argnames=("R0", "alphabet", "interpret", "group", "cell",
                     "seg", "first_free", "r_seg_max", "bound_mode"),
)
def _pass2_walk_shift2(codes, pair, n_codes, totals, R0: int,
                       alphabet: int, interpret: bool, group: int,
                       cell: int, seg: int, first_free: int,
                       r_seg_max: int, bound_mode: int = 0):
    """Dispatch 1 of the stride-2 pass 2: head-pair prep + walk + shift."""
    N, S = codes.shape
    sub = group // 128
    G = N // group

    G1, Sp, sub1, _ = pair.shape
    assert Sp == S and G1 * sub1 == G * sub
    # Packed double heads: row w = head(w) | head(w-1) << 12 (sentinel
    # 0xFFF above row 0, unreachable: w-1 < 0 guards it).
    prev = jnp.concatenate(
        [jnp.full((N, 1), 0xFFF, codes.dtype), codes[:, :-1]], axis=1
    )
    codes = codes | (prev << 12)
    if S % seg:
        # Pad both tables to whole segments (see _pass2_walk_shift).
        padn = seg - S % seg
        codes = jnp.concatenate(
            [codes, jnp.zeros((N, padn), codes.dtype)], axis=1
        )
        pair = jnp.concatenate(
            [pair, jnp.zeros((G1, padn, sub1, 128), pair.dtype)], axis=1
        )
        S += padn
    if sub1 != sub:
        assert sub1 % sub == 0, (sub1, sub)
        f = sub1 // sub
        pair = pair.reshape(G1, S, f, sub, 128).transpose(0, 2, 1, 3, 4)
        pair = pair.reshape(G, S, sub, 128)

    x = codes.reshape(G, sub, 128, S).transpose(0, 3, 1, 2)
    w0 = (n_codes.astype(jnp.int32) - 1).reshape(G, sub, 128)
    state = jnp.stack(
        [w0, jnp.full((G, sub, 128), -1, jnp.int32),
         jnp.full((G, sub, 128), -1, jnp.int32)], axis=1,
    )

    # Round-segment the walk exactly like the stride-1 path (the >= ~16k
    # round miscompile containment); rounds are halved so most shapes fit
    # one segment.
    assert r_seg_max % cell == 0
    r_seg = min(R0, r_seg_max)
    n_rseg = -(-R0 // r_seg)
    R2 = n_rseg * r_seg

    def run_groups(xg, pairg, sg, Gi):
        return pl.pallas_call(
            _make_pass2_kernel2(seg, alphabet, first_free, bound_mode),
            grid=(Gi, r_seg // cell),
            in_specs=[
                pl.BlockSpec((1, S, sub, 128), lambda g, c: (g, 0, 0, 0)),
                pl.BlockSpec((1, S, sub, 128), lambda g, c: (g, 0, 0, 0)),
                pl.BlockSpec((1, 3, sub, 128), lambda g, c: (g, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
                pl.BlockSpec((1, 3, sub, 128), lambda g, c: (g, 0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Gi, r_seg, sub, 128), jnp.int32),
                jax.ShapeDtypeStruct((Gi, 3, sub, 128), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((3, sub, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xg, pairg, sg)

    gmax = SUPER_GROUP_MAX
    g0 = G if G <= gmax else max(
        (g for g in range(1, gmax + 1) if G % g == 0)
    )
    rev_parts = []
    for _si in range(n_rseg):
        if g0 == G:
            rev_i, state = run_groups(x, pair, state, G)
        else:
            nsg = G // g0
            rev_i, state = jax.lax.map(
                lambda a: run_groups(a[0], a[1], a[2], g0),
                (x.reshape(nsg, g0, S, sub, 128),
                 pair.reshape(nsg, g0, S, sub, 128),
                 state.reshape(nsg, g0, 3, sub, 128)),
            )
            rev_i = rev_i.reshape(G, r_seg, sub, 128)
            state = state.reshape(G, 3, sub, 128)
        rev_parts.append(rev_i)
    rev = rev_parts[0] if n_rseg == 1 else jnp.concatenate(rev_parts, axis=1)

    # Unpack the byte pairs (row j -> reversed-stream positions 2j, 2j+1),
    # then the per-lane tail shift as in the stride-1 path.
    lo = rev & 0xFF
    hi = (rev >> 8) & 0xFF
    rev = jnp.stack([lo, hi], axis=2).reshape(G, 2 * R2, sub, 128)

    from lzw_tpu.kernels.common import shift_columns_jax

    rev = rev.reshape(G, 2 * R2, group)
    shifts = (2 * R2 - totals.reshape(G, group)).astype(jnp.int32)
    return jax.vmap(lambda v, s: shift_columns_jax(v, s, fill=0))(
        rev, shifts
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "alphabet", "interpret", "group", "cell",
                     "seg", "variable", "first_free", "bound_mode",
                     "r_seg_max"),
)
def _pass2_walk_shift(codes, pair, n_codes, totals, block_size: int,
                      alphabet: int = 256, interpret: bool = False,
                      group: int = 2048, cell: int = CELL,
                      seg: int = 256, variable: bool = False,
                      first_free: int | None = None, bound_mode: int = 0,
                      r_seg_max: int = 8192):
    """Dispatch 1 of pass 2: chain walk + per-lane tail shift."""
    import numpy as np  # noqa: F401  (kept for parity with sibling wrappers)

    N, S = codes.shape
    sub = group // 128
    G = N // group
    R = ((block_size + cell - 1) // cell) * cell

    G1, Sp, sub1, _ = pair.shape
    assert Sp == S and G1 * sub1 == G * sub
    if S % seg:
        # The bounded row-match scans slice [s*seg, s*seg+seg); a final
        # partial segment would clamp the dynamic-slice start and shift the
        # loaded rows under the row iota — words in the last partial
        # segment then resolve garbage (seen live: S=2944 with seg=256
        # corrupted every block whose word count exceeded 2816).  Pad both
        # tables to a whole segment; zero rows never row-match.
        padn = seg - S % seg
        codes = jnp.concatenate(
            [codes, jnp.zeros((N, padn), codes.dtype)], axis=1
        )
        pair = jnp.concatenate(
            [pair, jnp.zeros((G1, padn, sub1, 128), pair.dtype)], axis=1
        )
        S += padn
    if sub1 != sub:
        assert sub1 % sub == 0, (sub1, sub)
        f = sub1 // sub
        pair = pair.reshape(G1, S, f, sub, 128).transpose(0, 2, 1, 3, 4)
        pair = pair.reshape(G, S, sub, 128)

    x = codes.reshape(G, sub, 128, S).transpose(0, 3, 1, 2)
    w0 = (n_codes.astype(jnp.int32) - 1).reshape(G, sub, 128)
    state = jnp.stack(
        [w0, jnp.full((G, sub, 128), -1, jnp.int32),
         jnp.zeros((G, sub, 128), jnp.int32)], axis=1,
    )

    # sub >= 4 instances MISCOMPUTE once a single dispatch runs >= ~16k
    # rounds (r4 live find; deterministic, interpret correct — see
    # EVOLUTION.md "Hardware miscompile log" #3).  Split the walk into
    # round-segments of <= 8192, carrying the walk state between
    # dispatches; all segments share one compiled program.
    R_SEG = r_seg_max
    assert R_SEG % cell == 0
    r_seg = min(R, R_SEG)
    n_rseg = -(-R // r_seg)
    R = n_rseg * r_seg

    def run_groups(xg, pairg, sg, Gi):
        return pl.pallas_call(
            _make_pass2_kernel(seg, alphabet, variable, first_free,
                               bound_mode),
            grid=(Gi, r_seg // cell),
            in_specs=[
                pl.BlockSpec((1, S, sub, 128), lambda g, c: (g, 0, 0, 0)),
                pl.BlockSpec((1, S, sub, 128), lambda g, c: (g, 0, 0, 0)),
                pl.BlockSpec((1, 3, sub, 128), lambda g, c: (g, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
                pl.BlockSpec((1, 3, sub, 128), lambda g, c: (g, 0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Gi, r_seg, sub, 128), jnp.int32),
                jax.ShapeDtypeStruct((Gi, 3, sub, 128), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((3, sub, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                # v5e VMEM is 128 MB; the two S x sub x 128 tables are
                # double-buffered across grid groups, so the default 100 MB
                # scoped limit rejects sub=2 at 64 KiB blocks (117 MB).
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xg, pairg, sg)

    # Grids with many groups MISCOMPUTE on this hardware (same
    # shape-triggered XLA/relay issue as the chunked encoder at G >= 3,
    # seen live here at G=16/64 KiB: garbage output, interpret correct).
    # Run super-groups of at most 2 grid groups through lax.map — the
    # G <= 2 shape is the one verified correct on the chip.
    gmax = SUPER_GROUP_MAX
    g0 = G if G <= gmax else max(
        (g for g in range(1, gmax + 1) if G % g == 0)
    )
    rev_parts = []
    for _si in range(n_rseg):
        if g0 == G:
            rev_i, state = run_groups(x, pair, state, G)
        else:
            nsg = G // g0
            rev_i, state = jax.lax.map(
                lambda a: run_groups(a[0], a[1], a[2], g0),
                (x.reshape(nsg, g0, S, sub, 128),
                 pair.reshape(nsg, g0, S, sub, 128),
                 state.reshape(nsg, g0, 3, sub, 128)),
            )
            rev_i = rev_i.reshape(G, r_seg, sub, 128)
            state = state.reshape(G, 3, sub, 128)
        rev_parts.append(rev_i)
    rev = rev_parts[0] if n_rseg == 1 else jnp.concatenate(rev_parts, axis=1)

    # The emission stream is the output reversed per lane: shift each lane
    # down by (R - total) so its bytes occupy the tail, then a uniform flip
    # puts byte 0 at row 0.
    from lzw_tpu.kernels.common import shift_columns_jax

    rev = rev.reshape(G, R, group)
    shifts = (R - totals.reshape(G, group)).astype(jnp.int32)
    return jax.vmap(lambda v, s: shift_columns_jax(v, s, fill=0))(
        rev, shifts
    )
