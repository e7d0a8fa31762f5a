"""Foreign (early-CLEAR) variable streams on the device path.

The reference's one decoder handles CLEAR at ANY position
(`decoder.rs:222-227`); the TPU strict-schedule decoder requires CLEARs
exactly at table-full.  This module closes the gap by RESEGMENTATION: a
foreign stream factors at its CLEARs into dictionary epochs, and every
epoch is schedule-conformant on its own (width bumps depend only on the
code count since the last CLEAR, and an epoch can never outlive the
table-full ordinal — past it the reference itself demands a CLEAR,
`decoder.rs:281-283`).  So the host parses epoch boundaries with the
static schedule (vectorized numpy, one pass per epoch generation across
all streams), and each epoch decodes on the device as its own strict
sub-stream through the unchanged pass-1/pass-2 kernels.

Host work is O(epochs) vectorized passes — no per-code Python loop.
"""

from __future__ import annotations

import functools

import numpy as np

from lzw_tpu.spec import (
    LzwSpec, MAX_WIDTH, MissingClearCodeError, TruncatedStreamError,
)

__all__ = ["parse_epochs", "decode_variable_nonstrict_device"]


def _full_epoch_len(spec: LzwSpec) -> int:
    """Data codes in a table-full epoch, derived from the schedule itself.

    The early-increment strategies (TIFF) trip table-full one code sooner
    (`lib.rs:84-91` applied at `decoder.rs:277-279`), so the bound is the
    position of the schedule's first mandatory CLEAR — not a hardcoded
    ``4096 - first_free + 1`` (r4 advisor find: the hardcoded bound
    misparsed multi-epoch TIFF streams).
    """
    from lzw_tpu.kernels import schedule as sched_mod

    sched = sched_mod.emission_schedule(spec, 4200)  # > any epoch length
    return int(np.nonzero(sched.clear_after)[0][0]) + 1


def _read_sym(mat, rows, bit_offs, width: int, little: bool):
    """Read one ``width``-bit symbol per row at absolute bit offsets."""
    b0 = (bit_offs >> 3).astype(np.int64)
    sh = (bit_offs & 7).astype(np.int64)
    if little:
        w0 = (mat[rows, b0] | (mat[rows, b0 + 1] << 8)
              | (mat[rows, b0 + 2] << 16))
        return (w0 >> sh) & ((1 << width) - 1)
    wbe = ((mat[rows, b0] << 16) | (mat[rows, b0 + 1] << 8)
           | mat[rows, b0 + 2])
    return (wbe >> (24 - sh - width)) & ((1 << width) - 1)


def _epoch_schedule_tables(spec: LzwSpec, S_e: int):
    """Widths/bit offsets for data ordinals 0..S_e of ONE epoch, measured
    from the epoch start (no leading CLEAR)."""
    from lzw_tpu.kernels import schedule as sched_mod

    sched = sched_mod.emission_schedule(spec, S_e + 2)
    widths = sched.widths[: S_e + 1].copy()
    offs = (sched.bit_off[: S_e + 2] - sched.bit_off[0]).copy()
    return widths, offs


@functools.lru_cache(maxsize=64)
def _slot_tables(spec: LzwSpec, L: int):
    """Per-slot extraction tables for epoch-local slots 0..L-1: bit offset,
    width, value mask, slot end (offset + width) — all static per spec,
    cached so the per-generation parse loop pays zero schedule work."""
    widths, offs = _epoch_schedule_tables(spec, max(L, 1))
    w = widths[:L].astype(np.int32)
    offs32 = offs[:L].astype(np.int32)
    return offs32, w, ((1 << w) - 1).astype(np.int32), offs32 + w


def _unpack_at(w24, rows, bit_off_rows, spec: LzwSpec, L: int,
               little: bool):
    """Unpack epoch-local slots 0..L-1 for each row at absolute per-row
    bit offsets, from the precombined 24-bit window matrix ``w24``
    (``w24[i, b]`` = the 3 bytes at b, already endianness-combined).

    One vectorized gather per (row, slot) — widths are <= 12, so 3 bytes
    cover any alignment.  ~6 numpy ops for the whole window, with no
    intermediate realigned copy; the r4 version's per-position segment
    loops plus a realign gather made the generation loop
    call-overhead-bound (4.7s of a 5.1s decode).  Returns vals i32[m, L].
    """
    offs, w, mask, _end = _slot_tables(spec, L)
    boff = bit_off_rows.astype(np.int64)[:, None] + offs[None, :]
    b0 = boff >> 3
    np.minimum(b0, w24.shape[1] - 1, out=b0)  # clamp: junk past bit_lim is
    # masked by the slot-end checks downstream
    sh = (boff & 7).astype(np.int32)
    acc = w24[rows[:, None], b0]
    if little:
        return (acc >> sh) & mask[None]
    return (acc >> (24 - sh - w[None])) & mask[None]


def parse_epochs(payloads, plens, spec: LzwSpec):
    """Split foreign variable streams into strict per-epoch sub-streams.

    Returns (dense i32[U, S_e_pad], counts i64[U], owner i64[U]) where U
    sub-streams appear grouped by owner stream in epoch order, plus S_e_pad.
    Raises :class:`TruncatedStreamError` if any stream ends without EOI.
    """
    assert spec.variable
    payloads = np.asarray(payloads)
    plens = np.asarray(plens, np.int64)
    N, PB = payloads.shape
    mat = np.zeros((N, PB + 8), np.int32)
    mat[:, :PB] = payloads
    little = spec.endianness.value == "little"
    # Pre-combined 3-byte windows: one gather per (row, slot) downstream.
    if little:
        w24 = mat[:, :-2] | (mat[:, 1:-1] << 8) | (mat[:, 2:] << 16)
    else:
        w24 = (mat[:, :-2] << 16) | (mat[:, 1:-1] << 8) | mat[:, 2:]
    # Table-full bound on one epoch's data codes, from the schedule (the
    # early-change strategies bump one code sooner — see _full_epoch_len).
    S_e = _full_epoch_len(spec)
    widths, offs = _epoch_schedule_tables(spec, S_e)
    bit_lim = plens * 8

    # Leading CLEAR is optional in the reference decoder; consume it (and
    # any immediate repeats) wherever present.
    bit_off = np.zeros(N, np.int64)
    active = plens > 0
    clear, eoi = spec.clear_code, spec.end_code
    w0 = spec.initial_width

    owners: list[np.ndarray] = []
    denses: list[np.ndarray] = []
    counts: list[np.ndarray] = []
    done = ~active
    Lq = min(1024, S_e)
    end_q = _slot_tables(spec, Lq)[3]
    end_f = _slot_tables(spec, S_e)[3]

    def subset(g_rows, V, L, allow_full, is_term=None):
        """One epoch for streams ``g_rows`` with unpacked slot values
        ``V`` covering [0, L].  Slot S_e sits PAST the schedule's
        mandatory table-full CLEAR (offs jumps the 12-bit gap), so a
        full epoch advances by offs[S_e] — after verifying the skipped
        12 bits actually hold CLEAR (or EOI, the fix_eoi table-full
        ending); anything else is the reference's missing-CLEAR error
        (`decoder.rs:281-283`)."""
        m = len(g_rows)
        sl = V[:, :L]
        if is_term is None:
            # A slot's own end is offs + width: offs[j + 1] would include
            # the mandatory-CLEAR gap at the table-full slot, wrongly
            # rejecting a terminator that ends the stream exactly there
            # (r4 advisor find).
            slot_end = (bit_off[g_rows, None]
                        + (end_q if L == Lq else end_f)[None, :L])
            is_term = (((sl == clear) | (sl == eoi))
                       & (slot_end <= bit_lim[g_rows, None]))
        has_term = is_term.any(axis=1)
        fin_gap = np.zeros(m, bool)
        if allow_full:
            fullm = (~has_term) & (
                bit_off[g_rows] + offs[S_e] <= bit_lim[g_rows]
            )
            if not (has_term | fullm).all():
                raise TruncatedStreamError()
            gi = np.nonzero(fullm)[0]
            if len(gi):
                gr = g_rows[gi]
                gv = _read_sym(
                    mat, gr, bit_off[gr] + offs[S_e] - MAX_WIDTH,
                    MAX_WIDTH, little,
                )
                if ((gv != clear) & (gv != eoi)).any():
                    raise MissingClearCodeError()
                fin_gap[gi] = gv == eoi
        k = np.where(
            has_term, is_term.argmax(axis=1), S_e
        ).astype(np.int64)
        term_val = np.where(
            has_term, sl[np.arange(m), np.minimum(k, L - 1)], clear
        )
        # Record this epoch (k may be 0 for CLEAR CLEAR runs).
        owners.append(g_rows.astype(np.int64))
        counts.append(k)
        sel = np.arange(L)[None, :] < k[:, None]
        denses.append(np.where(sel, sl, 0))
        adv = np.where(has_term, offs[k] + widths[k], offs[S_e])
        bit_off[g_rows] = bit_off[g_rows] + adv
        fin = (has_term & (term_val == eoi)) | fin_gap
        done[g_rows[fin]] = True

    guard = 0
    while not done.all():
        guard += 1
        if guard > (8 * PB) // w0 + 2:
            raise TruncatedStreamError()
        rows = np.nonzero(~done)[0]
        # Two-phase unpack: most foreign epochs terminate within ~1k
        # codes, so a quick prefix pass resolves them at prefix width and
        # only the stragglers pay the full table-bound unpack.
        vq = _unpack_at(w24, rows, bit_off[rows], spec, Lq, little)
        endq = bit_off[rows, None] + end_q[None, :]
        is_term_q = (((vq == clear) | (vq == eoi))
                     & (endq <= bit_lim[rows, None]))
        termq = is_term_q.any(axis=1)
        qi = np.nonzero(termq)[0]
        fi = np.nonzero(~termq)[0]
        if len(qi):
            subset(rows[qi], vq[qi], Lq, False, is_term_q[qi])
        if len(fi):
            # Stragglers (longer than the quick window) pay the full
            # table-bound unpack; typically a small minority.
            rf = rows[fi]
            vf = _unpack_at(w24, rf, bit_off[rf], spec, S_e, little)
            subset(rf, vf, S_e, True)

    if not owners:
        U = 0
        S_pad = 512
        return (np.zeros((0, S_pad), np.int32), np.zeros(0, np.int64),
                np.zeros(0, np.int64), S_pad)
    owner = np.concatenate(owners)
    cnt = np.concatenate(counts)
    W = max(d.shape[1] for d in denses)
    U_all = sum(d.shape[0] for d in denses)
    dense = np.zeros((U_all, W), np.int32)
    u = 0
    for d in denses:
        dense[u : u + d.shape[0], : d.shape[1]] = d
        u += d.shape[0]
    # Order sub-streams by (owner, generation): generations were appended
    # in order, and concatenation preserves per-owner order under a stable
    # sort on owner.
    order = np.argsort(owner, kind="stable")
    owner, cnt, dense = owner[order], cnt[order], dense[order]
    # Drop empty epochs (k == 0) — they decode to nothing.
    keep = cnt > 0
    owner, cnt, dense = owner[keep], cnt[keep], dense[keep]
    S_pad = max(512, ((int(cnt.max(initial=1)) + 511) // 512) * 512)
    return dense[:, :S_pad].copy() if dense.shape[1] >= S_pad else np.pad(
        dense, ((0, 0), (0, S_pad - dense.shape[1]))
    ), cnt, owner, S_pad


def decode_variable_nonstrict_device(payloads, plens, spec: LzwSpec,
                                     block_size: int,
                                     interpret: bool = False,
                                     stage_times: dict | None = None):
    """Device decode of foreign early-CLEAR streams via resegmentation.

    Returns a list of N decoded ``bytes`` (one per input stream).  Device
    work is the unchanged strict pass-1/pass-2 pipeline over the epoch
    sub-streams; host work is the vectorized epoch parse plus the final
    per-stream concatenation.  ``stage_times`` (optional dict) receives
    parse_s / upload_s / device_s so benches can report the codec apart
    from the host link.
    """
    import time as _time

    import jax.numpy as jnp

    from lzw_tpu.kernels import decode_pallas as dp
    from lzw_tpu.kernels import schedule as sched_mod

    N = payloads.shape[0]
    _t0 = _time.perf_counter()
    dense, cnt, owner, S_pad = parse_epochs(payloads, plens, spec)
    if stage_times is not None:
        stage_times["parse_s"] = _time.perf_counter() - _t0
    U = dense.shape[0]
    if U == 0:
        return [b""] * N
    Upad = ((U + 127) // 128) * 128
    if Upad > U:
        dense = np.concatenate(
            [dense, np.zeros((Upad - U, S_pad), np.int32)]
        )
        cnt = np.concatenate([cnt, np.zeros(Upad - U, np.int64)])
    group = next(g for g in (1024, 512, 256, 128) if Upad % g == 0)

    sched = sched_mod.emission_schedule(spec, S_pad)
    sched_arr = np.zeros((2, S_pad), np.int32)
    sched_arr[0, :] = (sched.nxt_of[:S_pad] - 1).astype(np.int32)
    sched_arr[1, :] = sched.epoch_start[:S_pad].astype(np.int32)

    _t0 = _time.perf_counter()
    cdev = jnp.asarray(cnt.astype(np.int32))
    dense_dev = jnp.asarray(dense)
    sched_dev = jnp.asarray(sched_arr)
    np.asarray(dense_dev[0, :2])  # upload fence for stage timing
    if stage_times is not None:
        stage_times["upload_s"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    words, stats, pair = dp._variable_pass1(
        dense_dev, cdev, sched_dev, spec,
        block_size, interpret, group, dp.CELL, 128, pair2=True,
    )
    totals, errs, err_codes = stats[:, 0], stats[:, 1], stats[:, 2]
    te_np = np.asarray(totals)[:U]
    errs_np = np.asarray(errs)[:U]
    if errs_np.any():
        from lzw_tpu.spec import UnexpectedCodeError

        i = int(np.argmax(errs_np != 0))
        raise UnexpectedCodeError(int(np.asarray(err_codes)[i]))
    Bp = ((block_size + 511) // 512) * 512
    r_need = int(te_np.max(initial=1))
    if r_need <= 8192:
        r_need = max(512, 1 << (r_need - 1).bit_length())
    else:
        r_need = -(-r_need // 8192) * 8192
    out = dp.decode_pass2_stride2(
        dense_dev, pair, cdev, totals, min(r_need, Bp),
        alphabet=spec.alphabet_size, interpret=interpret, group=group,
        cell=dp.CELL, seg=32, first_free=spec.first_free_code,
    )
    np.asarray(out[0, :2])  # device fence (the bulk pull below is the link)
    if stage_times is not None:
        stage_times["device_s"] = _time.perf_counter() - _t0
    out_np = np.asarray(out)[:U]
    res: list[bytes] = []
    pos = 0
    for i in range(N):
        parts = []
        while pos < U and owner[pos] == i:
            parts.append(out_np[pos, : te_np[pos]].tobytes())
            pos += 1
        res.append(b"".join(parts))
    return res
