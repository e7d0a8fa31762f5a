"""Static emission schedules for variable-width LZW.

The reference threads code width through its sequential loop (`encoder.rs:
289-292,326-335`), but width bumps and CLEAR resets depend only on how many
codes have been emitted since the last reset — never on the data.  For any
spec, the whole wire layout (per-ordinal width, CLEAR positions, bit offsets)
is therefore a *static* schedule: the sequential kernel only has to produce
code values, and bit packing becomes static-slice arithmetic on the host/XLA
side — no data-dependent bit cursors, no scatter.

A stream following this schedule is called *strict*: everything salzweg's
encoder (or ours) produces is strict.  Foreign GIF/TIFF streams with early
CLEARs are not; the device decoder detects the mismatch and the caller falls
back to the general decoders.

This module computes schedules (host, cached) and packs/unpacks code arrays
against them with vectorized static-width segment math.
"""

from __future__ import annotations

import functools

import numpy as np

from lzw_tpu.spec import LzwSpec, MAX_WIDTH

__all__ = ["Schedule", "emission_schedule", "pack_variable", "unpack_variable"]


class Schedule:
    """Static wire schedule for data-code ordinals 0..n_max-1.

    Attributes (numpy, length n_max + 1 where noted):
      widths[m]:       write width of data code m.
      clear_after[m]:  True if a CLEAR (12 bits) follows data code m (only
                       when another data code follows).
      bit_off[m]:      bit offset of data code m (after the initial CLEAR);
                       bit_off[n_max] is the offset one-past-last.
      nxt_of[m]:       dictionary index the encoder assigns at miss m.
      epoch_start[m]:  ordinal of the first code of m's dictionary epoch.
    """

    def __init__(self, spec: LzwSpec, n_max: int):
        self.spec = spec
        self.n_max = n_max
        inc = spec.strategy.increment
        first_free = spec.first_free_code
        widths = np.empty(n_max, np.int64)
        clear_after = np.zeros(n_max, bool)
        nxt_of = np.empty(n_max, np.int64)
        epoch_start = np.empty(n_max, np.int64)
        width = spec.initial_width
        nxt = first_free
        estart = 0
        for m in range(n_max):
            widths[m] = width
            nxt_of[m] = nxt
            epoch_start[m] = estart
            new_index = nxt
            nxt += 1
            if new_index == (1 << width) - inc:
                if width < MAX_WIDTH:
                    width += 1
                else:
                    clear_after[m] = True
                    width = spec.initial_width
                    nxt = first_free
                    estart = m + 1
        self.widths = widths
        self.clear_after = clear_after
        self.nxt_of = nxt_of
        self.epoch_start = epoch_start
        bit_off = np.zeros(n_max + 1, np.int64)
        bit_off[1:] = np.cumsum(widths + MAX_WIDTH * clear_after)
        bit_off += spec.initial_width  # the leading CLEAR
        self.bit_off = bit_off
        # width the *decoder* expects after consuming n data codes (its
        # insert trails the encoder's by one emission — `decoder.rs:272-280`).
        self.next_width = np.empty(n_max + 1, np.int64)
        self.next_width[:n_max] = widths
        self.next_width[n_max] = width
        # total wire bits for a stream of n data codes + EOI (with fix).
        self.eoi_off = self.bit_off[: n_max + 1]

    def eoi_width(self, n: int, fix: bool) -> int:
        """Width of the trailing EOI for a stream of n data codes."""
        if n == 0:
            return self.spec.initial_width
        if not fix:
            return int(self.widths[n - 1])
        if self.clear_after[n - 1]:
            # The decoder's table hit 4096 exactly; read size stays 12.
            return MAX_WIDTH
        return int(self.next_width[n]) if n < len(self.next_width) else int(
            self.widths[n - 1]
        )

    def total_bits(self, n: int, fix: bool = True) -> int:
        """Wire bits for n data codes incl. leading CLEAR and trailing EOI."""
        if n == 0:
            return 2 * self.spec.initial_width
        base = int(self.bit_off[n])
        if self.clear_after[n - 1]:
            base -= MAX_WIDTH  # no CLEAR after the final code (not a miss)
        return base + self.eoi_width(n, fix)

    @functools.cached_property
    def segments(self):
        """Constant-width runs: list of (ordinal_a, ordinal_b, width).

        CLEAR symbols are modelled during pack/unpack as width-12 gaps at
        clear_after positions (value = spec.clear_code when a data code
        follows).
        """
        segs = []
        a = 0
        for m in range(1, self.n_max + 1):
            boundary = (
                m == self.n_max
                or self.widths[m] != self.widths[a]
                or self.clear_after[m - 1]
            )
            if boundary:
                segs.append((a, m, int(self.widths[a])))
                a = m
        return segs


@functools.lru_cache(maxsize=64)
def emission_schedule(spec: LzwSpec, n_max: int) -> Schedule:
    return Schedule(spec, n_max)


def pack_variable(dense, counts, spec: LzwSpec, fix_eoi: bool = True, xp=np):
    """Pack dense data-code arrays against the static schedule.

    Args:
      dense:  i32[N, S] data codes (zeros past counts — value 0 packs as
              zero bits, invisible under the zero-filled buffer + trimming).
      counts: i32[N] data-code counts per stream.
      spec:   variable-flavor spec (static).
      xp:     numpy or jax.numpy.
    Returns:
      (bytes u8[N, PB], lengths i32[N]) — PB = ceil(max total bits / 8).
    """
    assert spec.variable
    N, S = dense.shape
    sched = emission_schedule(spec, S)
    little = spec.endianness.value == "little"
    clear = spec.clear_code

    max_bits = sched.total_bits(S, fix_eoi)
    PB = (max_bits + 7) // 8 + 16  # slack for group-rounded segment tails
    out = xp.zeros((N, PB), dtype=xp.int32)

    def add_symbol_column(out, values, width, bit_off):
        """OR one fixed-position symbol (per stream) into the buffer."""
        b0 = bit_off >> 3
        sh = bit_off & 7
        if little:
            window = values << sh
            parts = (window & 0xFF, (window >> 8) & 0xFF, (window >> 16) & 0xFF)
        else:
            window = values << (24 - width - sh)
            parts = ((window >> 16) & 0xFF, (window >> 8) & 0xFF, window & 0xFF)
        for i, p in enumerate(parts):
            out = _iadd(out, (slice(None), b0 + i), p, xp)
        return out

    # Leading CLEAR.
    out = add_symbol_column(
        out, xp.full((N,), clear, dtype=xp.int32), spec.initial_width, 0
    )

    counts = counts.astype(xp.int32)

    # Data-code segments: constant width, consecutive bit positions.  A
    # width-w run is periodic: groups of g symbols (g a multiple of
    # lcm(w,8)/w, chosen >= 8 so spill stays within 3 bytes) cover exactly
    # g*w/8 bytes, so packing is pure reshape + static shifts — no scatter.
    import math

    for (a, b, w) in sched.segments:
        m = b - a
        base_g = (8 * w // math.gcd(w, 8)) // w  # lcm(w,8)/w symbols
        g = base_g * ((8 + base_g - 1) // base_g)  # >= 8 symbols per group
        P = g * w // 8  # bytes per group (>= 3)
        o = int(sched.bit_off[a])
        align = o & 7
        base_byte = o >> 3
        R = (m + g - 1) // g
        seg = xp.zeros((N, R * g), dtype=xp.int32)
        seg = _iset(seg, (slice(None), slice(0, m)), dense[:, a:b], xp)
        seg = seg.reshape(N, R, g)
        acc = xp.zeros((N, R, P + 3), dtype=xp.int32)
        for cpos in range(g):
            bitc = align + cpos * w
            bb = bitc >> 3
            shc = bitc & 7
            if little:
                window = seg[..., cpos] << shc
                shifts = (0, 8, 16)
            else:
                window = seg[..., cpos] << (24 - w - shc)
                shifts = (16, 8, 0)
            for lane, s in enumerate(shifts):
                acc = _iadd(
                    acc, (slice(None), slice(None), bb + lane),
                    (window >> s) & 0xFF, xp,
                )
        # Fold each group's spill bytes into the next group's head.
        main = acc[:, :, :P]
        main = _iadd(
            main, (slice(None), slice(1, None), slice(0, 3)),
            acc[:, :-1, P : P + 3], xp,
        )
        out = _iadd(
            out, (slice(None), slice(base_byte, base_byte + R * P)),
            main.reshape(N, R * P), xp,
        )
        out = _iadd(
            out, (slice(None), slice(base_byte + R * P, base_byte + R * P + 3)),
            acc[:, -1, P : P + 3], xp,
        )

    # Mid-stream CLEARs: emitted only when a data code follows.
    for m in np.nonzero(sched.clear_after[:S])[0]:
        present = (counts > (m + 1)).astype(xp.int32)
        vals = present * clear
        out = add_symbol_column(
            out, vals, MAX_WIDTH, int(sched.bit_off[m] + sched.widths[m])
        )

    # Trailing EOI: per-stream position/width (host loop is vectorized over
    # the handful of possible widths by masking on counts).
    eoi = spec.end_code
    for n_codes in _unique_counts(counts, xp):
        mask = (counts == n_codes).astype(xp.int32)
        if n_codes == 0:
            off = spec.initial_width
            w = spec.initial_width
        else:
            off = sched.total_bits(n_codes, fix_eoi) - sched.eoi_width(
                n_codes, fix_eoi
            )
            w = sched.eoi_width(n_codes, fix_eoi)
        out = add_symbol_column(out, mask * eoi, w, int(off))

    lengths = xp.asarray(
        [(sched.total_bits(int(n), fix_eoi) + 7) // 8 for n in _as_list(counts)]
    ) if xp is np else None
    if xp is np:
        return (out[:, : PB] & 0xFF).astype(np.uint8), lengths.astype(np.int32)
    raise NotImplementedError("device variant added with the variable kernel")


def _iadd(out, idx, val, xp):
    if xp is np:
        out[idx] += val
        return out
    return out.at[idx].add(val)


def _iset(out, idx, val, xp):
    if xp is np:
        out[idx] = val
        return out
    return out.at[idx].set(val)


def _unique_counts(counts, xp):
    if xp is np:
        return sorted(set(int(c) for c in counts))
    raise NotImplementedError


def _as_list(counts):
    return [int(c) for c in counts]


def unpack_variable(payloads, plens, spec: LzwSpec, xp=np):
    """Unpack strict streams to dense data codes + validation flags.

    Returns (dense i32[N, S], counts i32[N], strict bool[N]).  ``strict`` is
    False when the stream deviates from the static schedule (early CLEAR,
    missing EOI, width drift) — callers must fall back to the general
    decoder for those streams.
    """
    assert spec.variable and xp is np
    N, PB = payloads.shape
    # Upper bound on data codes: every code at the minimum width.
    S = int((8 * PB) // spec.initial_width + 2)
    sched = emission_schedule(spec, S)
    little = spec.endianness.value == "little"

    total_bits = 8 * plens.astype(np.int64)
    # Recover n per stream: candidates are every n whose wire byte length
    # matches; disambiguate (possible at small code sizes where several
    # 3-bit codes share a byte) by checking the EOI below.
    totals = np.array([sched.total_bits(n, True) for n in range(S + 1)])
    totals_nofix = np.array([sched.total_bits(n, False) for n in range(S + 1)])
    byte_len = (totals + 7) // 8
    byte_len_nofix = (totals_nofix + 7) // 8
    counts = np.zeros(N, np.int64)
    strict = np.ones(N, bool)

    def eoi_matches(i: int, n: int) -> bool:
        if plens[i] == 0:
            return n == 0
        for fix in (True, False):
            off = sched.total_bits(n, fix) - sched.eoi_width(n, fix)
            w = sched.eoi_width(n, fix)
            b0 = off >> 3
            if b0 + 2 >= payloads.shape[1] + 3:
                continue
            window = int(payloads[i, b0]) if b0 < payloads.shape[1] else 0
            b1 = int(payloads[i, b0 + 1]) if b0 + 1 < payloads.shape[1] else 0
            b2 = int(payloads[i, b0 + 2]) if b0 + 2 < payloads.shape[1] else 0
            if little:
                v = ((window | (b1 << 8) | (b2 << 16)) >> (off & 7)) & (
                    (1 << w) - 1
                )
            else:
                v = (((window << 16) | (b1 << 8) | b2)
                     >> (24 - (off & 7) - w)) & ((1 << w) - 1)
            if v == spec.end_code and (
                (sched.total_bits(n, fix) + 7) // 8 == plens[i]
            ):
                return True
        return False

    for i in range(N):
        nbytes = plens[i]
        cands = np.nonzero((byte_len == nbytes) | (byte_len_nofix == nbytes))[0]
        chosen = -1
        for n in cands[::-1]:
            if eoi_matches(i, int(n)):
                chosen = int(n)
                break
        if chosen < 0:
            strict[i] = False
        else:
            counts[i] = chosen

    padded = np.zeros((N, PB + 3), np.int64)
    padded[:, :PB] = payloads
    max_n = int(counts.max()) if N else 0
    dense = np.zeros((N, S), np.int32)

    def read_at(bit_off, width):
        b0 = bit_off >> 3
        w0 = padded[:, b0] | (padded[:, b0 + 1] << 8) | (
            padded[:, b0 + 2] << 16
        )
        if little:
            return (w0 >> (bit_off & 7)) & ((1 << width) - 1)
        wbe = (padded[:, b0] << 16) | (padded[:, b0 + 1] << 8) | padded[:, b0 + 2]
        return (wbe >> (24 - (bit_off & 7) - width)) & ((1 << width) - 1)

    # Validate the leading CLEAR.
    lead = read_at(0, spec.initial_width)
    strict &= (lead == spec.clear_code) | (plens == 0)

    for m in range(max_n):
        vals = read_at(int(sched.bit_off[m]), int(sched.widths[m]))
        sel = m < counts
        dense[sel, m] = vals[sel]
        # A data-code slot holding CLEAR/EOI means a non-strict stream.
        strict &= ~(sel & ((vals == spec.clear_code) | (vals == spec.end_code)))
        if sched.clear_after[m]:
            cvals = read_at(
                int(sched.bit_off[m] + sched.widths[m]), MAX_WIDTH
            )
            mid = (m + 1) < counts
            strict &= ~mid | (cvals == spec.clear_code)

    return dense, counts.astype(np.int32), strict
