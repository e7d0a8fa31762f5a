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


def _shift_rows_to_bit(mat_padded, rows, bit_offs, little: bool,
                       out_bytes: int):
    """Bit-realign: row j of the result starts at bit ``bit_offs[j]`` of
    ``mat_padded[rows[j]]`` (int32 byte values, zero padded).  Gathers only
    the ``out_bytes`` window — never copies whole payload rows."""
    b0 = (bit_offs >> 3).astype(np.int64)
    sh = (bit_offs & 7).astype(np.int64)
    idx = b0[:, None] + np.arange(out_bytes + 1)[None, :]
    idx = np.minimum(idx, mat_padded.shape[1] - 1)
    g = mat_padded[rows[:, None], idx]
    if little:
        out = (g[:, :-1] >> sh[:, None]) | (g[:, 1:] << (8 - sh[:, None]))
    else:
        out = (g[:, :-1] << sh[:, None]) | (g[:, 1:] >> (8 - sh[:, None]))
    # sh == 0 would shift by 8 in the partner term; mask it exactly.
    out = np.where(sh[:, None] == 0, g[:, :-1], out & 0xFF)
    return (out & 0xFF).astype(np.int32)


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


def _unpack_epoch(shifted, spec: LzwSpec, S_e: int):
    """Unpack slots 0..S_e (inclusive) of an epoch aligned at bit 0.

    Same periodic-segment trick as ``schedule._unpack_segments`` but with
    offsets measured from the epoch start.  Returns vals i32[N, S_e + 1].
    """
    import math

    little = spec.endianness.value == "little"
    widths, offs = _epoch_schedule_tables(spec, S_e)
    N = shifted.shape[0]
    padded = np.concatenate(
        [shifted, np.zeros((N, 8), np.int32)], axis=1
    )
    parts = []
    a = 0
    while a <= S_e:
        w = int(widths[a])
        b = a
        while b <= S_e and widths[b] == w:
            b += 1
        m = b - a
        base_g = (8 * w // math.gcd(w, 8)) // w
        g = base_g * ((8 + base_g - 1) // base_g)
        P = g * w // 8
        o = int(offs[a])
        align = o & 7
        base_byte = o >> 3
        R = (m + g - 1) // g
        need = base_byte + R * P + 3
        if need > padded.shape[1]:
            padded = np.concatenate(
                [padded, np.zeros((N, need - padded.shape[1]), np.int32)],
                axis=1,
            )
        main = padded[:, base_byte : base_byte + R * P].reshape(N, R, P)
        tail = padded[:, base_byte + R * P : base_byte + R * P + 3]
        nxt3 = np.concatenate(
            [main[:, 1:, :3], tail.reshape(N, 1, 3)], axis=1
        )
        grp = np.concatenate([main, nxt3], axis=2)
        cols = []
        mask = (1 << w) - 1
        for cpos in range(g):
            bitc = align + cpos * w
            bb = bitc >> 3
            sh = bitc & 7
            if little:
                w0 = (grp[..., bb] | (grp[..., bb + 1] << 8)
                      | (grp[..., bb + 2] << 16))
                cols.append((w0 >> sh) & mask)
            else:
                w0 = ((grp[..., bb] << 16) | (grp[..., bb + 1] << 8)
                      | grp[..., bb + 2])
                cols.append((w0 >> (24 - w - sh)) & mask)
        vals = np.stack(cols, axis=-1).reshape(N, R * g)[:, :m]
        parts.append(vals.astype(np.int32))
        a = b
    return np.concatenate(parts, axis=1)


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
    max_bytes = int(
        min((int(offs[S_e + 1]) + MAX_WIDTH + 7) // 8 + 4, PB + 8)
    )
    guard = 0
    while not done.all():
        guard += 1
        if guard > (8 * PB) // w0 + 2:
            raise TruncatedStreamError()
        rows = np.nonzero(~done)[0]
        shifted = _shift_rows_to_bit(
            mat, rows, bit_off[rows], little, max_bytes
        )

        def subset(g_rows, V, L, allow_full):
            """One epoch for streams ``g_rows`` with unpacked slot values
            ``V`` covering [0, L].  Slot S_e sits PAST the schedule's
            mandatory table-full CLEAR (offs jumps the 12-bit gap), so a
            full epoch advances by offs[S_e] — after verifying the skipped
            12 bits actually hold CLEAR (or EOI, the fix_eoi table-full
            ending); anything else is the reference's missing-CLEAR error
            (`decoder.rs:281-283`)."""
            m = len(g_rows)
            sl = V[:, :L]
            # A slot's own end is offs + width: offs[j + 1] would include
            # the mandatory-CLEAR gap at the table-full slot, wrongly
            # rejecting a terminator that ends the stream exactly there
            # (r4 advisor find).
            slot_end = (bit_off[g_rows, None] + offs[None, :L]
                        + widths[None, :L])
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

        # Two-phase unpack: most foreign epochs terminate within ~1k
        # codes, so a quick prefix pass resolves them at prefix width and
        # only the stragglers pay the full table-bound unpack.
        Lq = min(1024, S_e)
        vq = _unpack_epoch(shifted, spec, Lq)
        endq = bit_off[rows, None] + offs[None, :Lq] + widths[None, :Lq]
        termq = (((vq[:, :Lq] == clear) | (vq[:, :Lq] == eoi))
                 & (endq <= bit_lim[rows, None])).any(axis=1)
        qi = np.nonzero(termq)[0]
        fi = np.nonzero(~termq)[0]
        if len(qi):
            subset(rows[qi], vq[qi], Lq, False)
        if len(fi):
            vf = _unpack_epoch(shifted[fi], spec, S_e)
            subset(rows[fi], vf, S_e, True)

    if not owners:
        U = 0
        S_pad = 512
        return (np.zeros((0, S_pad), np.int32), np.zeros(0, np.int64),
                np.zeros(0, np.int64), S_pad)
    owner = np.concatenate(owners)
    cnt = np.concatenate(counts)
    W = max(d.shape[1] for d in denses)
    dense = np.concatenate(
        [d if d.shape[1] == W
         else np.pad(d, ((0, 0), (0, W - d.shape[1]))) for d in denses],
        axis=0,
    )
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
        block_size, interpret, group, dp.CELL, 128,
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
    out = dp.decode_pass2_device(
        dense_dev, pair, cdev, totals, min(r_need, Bp),
        alphabet=spec.alphabet_size, interpret=interpret, group=group,
        cell=dp.CELL, seg=128, variable=False,
        first_free=spec.first_free_code,
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
