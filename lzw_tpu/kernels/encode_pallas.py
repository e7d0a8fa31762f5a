"""Lockstep Pallas encoder: 1024 independent blocks per kernel instance.

TPU-native replacement for the encoder hot loop (`encoder.rs:313-337`).
Design (driven by the measurements in `scripts/ablate*.py` — Mosaic has no
per-lane gather/scatter, sub-tile row slicing costs ~100 cycles, and VMEM
compare-scans stream at ~3.7 TB/s):

* **Packed lockstep**: state lives in native (8, 128) tiles — sublane s,
  lane l is block-group s*128+l — so the per-step dependent op chain is
  amortized over 1024 blocks (one byte each per step).
* **Step-indexed dictionary, one i32 per entry**: the (prefix<<8|byte) key is
  20 bits and codes are 12 bits, so an entry packs as ``key << 12 | code``
  exactly into an i32.  Entries are stored at row = global step index — a
  *uniform* row across lanes, so an insert is a single native tile store (the
  scatter-free answer to the reference's trie `add`, `encoder.rs:120-143`).
  Hit steps store a hole sentinel.
* **Lookup = masked compare-scan** over the step rows written so far: the
  matched entry *contains* its code, so no index extraction or value gather
  is needed.  The scan bound ramps with the stream position (a dynamic
  tile-aligned slice loop), and holes/row-reuse need no masking because the
  sentinel never equals a real key.
* Block size is fixed at SLOTS-1 = 4096 bytes: the fixed-12 dictionary
  freezes at 4096 entries (`encoder.rs:645-647`) after at most 4096 inserts,
  so a 4 KiB block bounds the table at one screenful of rows with no
  compaction or merge machinery.  Larger logical blocks are handled by the
  container as multiples of 4 KiB (ratio cost measured < 2% on the corpora).

The kernel emits one i32 slot per input byte: the evicted prefix code on a
miss, -1 on a hit (hole).  Holes are compacted outside the kernel
(`lzw_tpu.kernels.common.compact_columns_jax`) and the dense stream is packed
with static arithmetic (12-bit pairs -> 3 bytes); no bit-level scatter
anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lzw_tpu.kernels.common import compact_columns_jax
from lzw_tpu.spec import MAX_TABLE_SIZE

__all__ = ["encode_blocks_fixed_tpu",
           "encode_blocks_variable_codes_tpu", "encode_pack_variable_tpu",
           "BLOCK_SIZE", "GROUP",
           "GROUP_CHUNKED", "CHUNK", "group_for"]

BLOCK_SIZE = 4096  # single-launch device block size (bytes); bigger blocks
# run the chunked driver (one launch per CHUNK bytes, dictionary carried)
GROUP = 2048  # blocks per kernel instance (16 sublanes x 128 lanes; the
# wider state tiles amortize the per-step dependent-chain latency, +6% over
# 1024 on chip; decode keeps 1024 for VMEM headroom)
GROUP_CHUNKED = 1024  # chunked path instance (r5 sweep: 8 sublanes with the
# G=2 pipeline beat 16 sublanes in one group by ~9%, and the finer grid
# cell below by ~15% more; arbiter-verified vs the native decoder)
CHUNK = 2048  # steps per launch of the chunked driver (the working table is
# MAX_TABLE_SIZE + CHUNK rows; 2048 keeps it + the scan temporaries inside
# VMEM at 16 sublanes, and measures within noise of 4096 on the corpora)
CELL = 512  # steps per grid cell (VMEM streaming tile)
SEG = 512  # scan segment rows (dense-table scan)
SSEG = 64  # stage-scan segment rows: the stage holds only rows [0, j) live
# at step j, so scanning it in smaller segments bounded by j skips the dead
# tail of the 512-row buffer; r4 chip sweep: 64 beats the old 128 default
# by ~3% on fixed-12 (242 vs 236 MiB/s) and both clear 2x the reference
# r5: the single-launch STAGE path (4 KiB blocks) runs fastest at finer
# tiles — cell 256 compiles cleanly now (the r4 pathological-compile
# blocker is gone) and with sseg 32 / seg 256 measures 255.9 MiB/s vs
# 241.8 at the old defaults (2.13x vs 2.02x the reference anchor); the
# chunked driver keeps the 512/512/64 config (its stage is DMA-paced).
CELL_STAGE = 256
SEG_STAGE = 256
SSEG_STAGE = 32
CELL_CHUNK = 64  # chunked-driver grid cell (r5 sweep: 64 beats 512 by 23%
# on var64k image encode — small stages keep the per-step stage scan and
# append trivial; chunk=1024 and group=512 shapes MISCOMPILE, see
# EVOLUTION.md r5 retirement section, and stay excluded)
# Table hole: entry code fields are always >= 256 (first dynamic code), so a
# zero word can never satisfy the range test below.
HOLE = 0
FIRST_FREE = 256
DYN_CODES = MAX_TABLE_SIZE - FIRST_FREE  # 3840 dynamic entries
# Max grid groups per compiled program before the driver serializes through
# lax.map super-groups (the r3 G>=3 miscompile containment).  Read at trace
# time; A/B scripts flip it (with jax.clear_caches()) to probe retirement.
SUPER_GROUP_MAX = 2


def _make_kernel(seg: int, spec_key):
    """spec_key: None for the fixed flavor, else (first_free, max_code,
    reset_threshold) for a variable flavor."""

    def kernel(x_ref, len_ref, out_ref, err_ref, ptab_ref, state_ref):
        return _encode_kernel(
            x_ref, len_ref, out_ref, err_ref, ptab_ref, state_ref, seg,
            spec_key,
        )

    return kernel


def _make_kernel_bucket(seg: int, spec_key=None):
    """Bucketed-table-compaction kernel (fixed + variable flavors).

    Inserts stay step-indexed within the current cell; at each cell boundary
    the cell's rows are hole-compacted IN PLACE (log-step rolls over one
    small [cell] window — compile-light, unlike cross-cell shifts) and the
    per-cell entry count goes to an SMEM table.  Lookups then scan past
    cells only up to their recorded counts: scan work tracks the miss count
    (~0.45x of steps on the image corpus) instead of the step count, and
    post-freeze cells cost nothing.

    Variable flavors handle the CLEAR reset (`encoder.rs:330-333`) by
    physically zeroing the resetting lane's column across the whole table —
    holes never match, so no epoch bookkeeping is needed, and a reset
    happens at most once per 4 KiB block (usually never)."""
    variable = spec_key is not None
    if variable:
        first_free, max_code, reset_threshold = spec_key
    else:
        first_free, max_code, reset_threshold = FIRST_FREE, 255, None
    dyn_codes = MAX_TABLE_SIZE - first_free

    def kernel(x_ref, len_ref, out_ref, err_ref, dtab_ref, cnt_ref,
               segbase_ref, state_ref):
        c = pl.program_id(1)
        last_cell = c == pl.num_programs(1) - 1
        cell = x_ref.shape[1]
        sub = dtab_ref.shape[1]

        @pl.when(c == 0)
        def _init():
            dtab_ref[:] = jnp.full(dtab_ref.shape, HOLE, jnp.int32)
            state_ref[0] = jnp.zeros((sub, 128), jnp.int32)  # prefix
            state_ref[1] = jnp.full((sub, 128), first_free, jnp.int32)
            state_ref[2] = jnp.zeros((sub, 128), jnp.int32)  # error flag
            state_ref[3] = jnp.zeros((sub, 128), jnp.int32)  # error code
            cnt_ref[0] = 0  # slot 0 holds the dense-segment count

        lens = len_ref[0, 0]
        base = c * cell
        n_dense = cnt_ref[0]

        def step(j, carry):
            prefix, nxt, err, err_code = carry
            i = base + j
            k = x_ref[0, j]
            active = (i < lens) & (err == 0)
            final = (i == lens) & (lens > 0) & (err == 0)
            is_first = i == 0

            if variable:
                bad = active & jnp.logical_not(is_first) & (k > max_code)
                err = jnp.where(bad, 1, err)
                err_code = jnp.where(bad, k, err_code)
                active = active & jnp.logical_not(bad)

            key = prefix * 256 + k
            tbase = (key << 12) + first_free
            neg = jnp.full((sub, 128), -1, jnp.int32)

            # Past cells: one flat loop over the dense-segment list (the
            # physical row starts of all compacted entries, maintained in
            # SMEM at cell boundaries) — no per-cell loop launches.
            def scan_seg(s, acc):
                rows = dtab_ref[pl.ds(segbase_ref[s], seg)]
                d = rows - tbase[None]
                sel = jnp.where((d >= 0) & (d < dyn_codes), d, -1)
                return jnp.maximum(acc, jnp.max(sel, axis=0))

            matched_d = jax.lax.fori_loop(0, n_dense, scan_seg, neg)

            # Current cell: raw step-indexed rows (holes never match),
            # scanned only up to the rows written so far (row j is this
            # step's own slot, still unwritten).
            def scan_cur(s, acc):
                rows = dtab_ref[pl.ds(base + s * seg, seg)]
                d = rows - tbase[None]
                sel = jnp.where((d >= 0) & (d < dyn_codes), d, -1)
                return jnp.maximum(acc, jnp.max(sel, axis=0))

            matched_d = jax.lax.fori_loop(
                0, (j + seg - 1) // seg, scan_cur, matched_d
            )

            matched = matched_d + first_free
            miss = active & (matched_d < 0) & jnp.logical_not(is_first)
            hit = active & (matched_d >= 0) & jnp.logical_not(is_first)

            out_ref[0, j] = jnp.where(miss | final, prefix, -1)

            if variable:
                ins = miss
                dtab_ref[base + j] = jnp.where(
                    ins, (key << 12) | (nxt & 0xFFF), HOLE
                )
                reset = ins & (nxt == reset_threshold)
                nxt = jnp.where(
                    reset, first_free, nxt + ins.astype(jnp.int32)
                )

                # Table-full CLEAR: wipe the lane's column everywhere
                # (including the entry that tripped the reset).
                @pl.when(jnp.any(reset))
                def _invalidate():
                    dtab_ref[:] = jnp.where(reset[None], HOLE, dtab_ref[:])
            else:
                ins = miss & (nxt < MAX_TABLE_SIZE)
                dtab_ref[base + j] = jnp.where(ins, (key << 12) | nxt, HOLE)
                nxt = nxt + ins.astype(jnp.int32)

            prefix = jnp.where(
                active & is_first, k,
                jnp.where(miss, k, jnp.where(hit, matched, prefix)),
            )
            return prefix, nxt, err, err_code

        carry = tuple(state_ref[r] for r in range(4))
        carry = jax.lax.fori_loop(0, cell, step, carry)
        for r in range(4):
            state_ref[r] = carry[r]

        # In-place bucket compaction; append this cell's dense segments
        # (max count over lanes) to the SMEM segment list.
        from lzw_tpu.kernels.common import compact_columns_jax

        entries = dtab_ref[pl.ds(base, cell)]
        compacted, cnt = compact_columns_jax(
            entries, entries != HOLE, fill=HOLE
        )
        dtab_ref[pl.ds(base, cell)] = compacted
        k0 = cnt_ref[0]
        n2 = (jnp.max(cnt) + seg - 1) // seg

        def put(i2, _):
            segbase_ref[k0 + i2] = base + i2 * seg
            return 0

        jax.lax.fori_loop(0, n2, put, 0)
        cnt_ref[0] = k0 + n2

        @pl.when(last_cell)
        def _finish():
            err_ref[0, 0] = carry[2]
            err_ref[0, 1] = carry[3]

    return kernel


def _clamp_sseg(sseg: int | None, cell: int) -> int | None:
    """Clamp the stage-scan segment to the cell; when it does not divide the
    cell evenly, fall back to whole-cell sweeps (the pre-sseg behavior)
    instead of rejecting an otherwise-valid static config."""
    if sseg is None:
        return None
    sseg = min(sseg, cell)
    return sseg if cell % sseg == 0 else cell


def _stage_step_fn(x_ref, out_ref, dense_ref, stage_ref, lens, off, n_dense,
                   seg, sub, spec_key, sseg=None, range_test="maxval",
                   n_base=None, row_iota=None, eq16=None):
    """The staged-append parse step, shared by the single-launch and chunked
    kernels.  ``off`` is the global stream index of this cell's step 0 (a
    traced scalar: ``c*cell`` single-launch, ``chunk0 + c*cell`` chunked).
    ``sseg`` is the stage-scan segment size (defaults to ``seg``): only rows
    [0, j) of the stage are live at step j, so a smaller segment bounds the
    stage sweep by the step index instead of the whole buffer.
    ``range_test`` selects the scan's match-test form, so A/B scripts
    measure the one shared implementation instead of a drifting copy:

    * "maxval" (default, 3 ops/row): live keys are unique per lane, so the
      match is simply the MAXIMUM table value strictly below
      ``tlimit = tbase + dyn`` — per row just cmp + select(INT_MIN) + max;
      the range validation ``0 <= m - tbase < dyn`` runs once per step on
      the (sub, 128) accumulator instead of per row.  Safety: append holes
      (0) give ``d = -tbase`` which can never land in [0, dyn) because
      key<<12 is a multiple of 4096 and codes sit in [first_free, 4096);
      the INT_MIN sentinel wraps to ``d = dyn`` exactly at the extreme
      tbase = 0x7FFFF000 + first_free — excluded by the strict upper bound;
      foreign keys differ by a multiple of 4096 mod 2^32, outside (-dyn,
      dyn) \\ {0}.  Chip A/B r3 (fixed 4 KiB, 32 MiB, same day/chip):
      maxval 237.1 vs drop_ge 196.5 MiB/s (+21%).
    * "drop_ge" (4 ops/row): per-row range test with the d >= 0 compare
      dropped (negative deltas lose the running max against -1).  Chip A/B
      r3 (pre-pad-skip): drop_ge 155.6 vs full 148.9 MiB/s on fixed 4 KiB.
    * "full" (5 ops/row): the two-compare range test.

    ``n_base`` (chunked kernels only, with ``row_iota`` = a hoisted
    (seg, sub, 128) row iota): number of leading *code-indexed* dense
    segments.  The between-launch recompaction leaves each lane's live
    entries at row = code - first_free (codes are assigned sequentially,
    `encoder.rs:120-143`; the compaction is stable; CLEAR resets wipe whole
    columns), so rows [0, n_base*seg) store the bare 20-bit key (hole -1)
    and match with a 3-op equality scan whose matched ROW is the code —
    25% fewer VPU ops than the 4-op range test on the dominant scan.

    ``eq16`` (chunked kernels): the eq-region runs on TWO i16 planes
    (key & 0x7FFF, key >> 15; holes stay -1 in the high plane, which a
    5-bit key-high can never equal) — 5 half-rate ops/row = 2.5 i32-op
    equivalents vs the 3-op i32 equality, a ~17% cut on the dominant scan
    (`scripts/probe_i16.py` measured the 2x i16 lane-rate premise).
    NEGATIVE RESULT on hardware (r5): Mosaic rejects the scan's axis-0
    reduction at i16 ("Reductions over int16 not implemented"), and
    hoisting only the compares to i16 costs MORE i32-equivalents (3.5)
    than the straight i32 equality — the lever is blocked at the
    toolchain, not the ALU (EVOLUTION.md "i16 wall").  Interpret mode
    still runs it; keep ``eq16=False`` on hardware."""
    if sseg is None:
        sseg = seg
    assert range_test in ("full", "drop_ge", "maxval")
    full_test = range_test == "full"
    maxval = range_test == "maxval"
    int_min = jnp.int32(-(2**31))
    variable = spec_key is not None
    if variable:
        first_free, max_code, reset_threshold = spec_key
    else:
        first_free, max_code, reset_threshold = FIRST_FREE, 255, None
    dyn_codes = MAX_TABLE_SIZE - first_free
    # Steps past every lane's end (the final-prefix pad cell) skip all scans:
    # no lane can consume a byte at i >= lens_max, so no lookup is needed and
    # no insert can fire.  At 4 KiB blocks the pad cell is 1/9 of all steps.
    lens_max = jnp.max(lens)

    def step(j, carry):
        prefix, nxt, err, err_code = carry
        i = off + j
        k = x_ref[0, j]
        active = (i < lens) & (err == 0)
        final = (i == lens) & (lens > 0) & (err == 0)
        is_first = i == 0

        if variable:
            bad = active & jnp.logical_not(is_first) & (k > max_code)
            err = jnp.where(bad, 1, err)
            err_code = jnp.where(bad, k, err_code)
            active = active & jnp.logical_not(bad)

        key = prefix * 256 + k
        tbase = (key << 12) + first_free
        neg = jnp.full((sub, 128), -1, jnp.int32)

        if maxval:
            tlimit = tbase + dyn_codes

            def match_acc(rows, acc):
                cand = jnp.where(rows < tlimit[None], rows, int_min)
                return jnp.maximum(acc, jnp.max(cand, axis=0))
        else:

            def match(d):
                # NOTE: a single unsigned compare (u32(d) < dyn) measures 9%
                # SLOWER on chip than this two-compare form — Mosaic fuses
                # the signed range test; don't "optimize" it.
                if full_test:
                    return jnp.where((d >= 0) & (d < dyn_codes), d, -1)
                # negatives lose the max
                return jnp.where(d < dyn_codes, d, -1)

            def match_acc(rows, acc):
                return jnp.maximum(acc, jnp.max(match(rows - tbase[None]),
                                                axis=0))

        # Scan bounds collapse to zero on pad steps (see lens_max above).
        live = j + off < lens_max

        if n_base is None:
            base_segs = 0
            row_d = neg
        else:
            base_segs = jnp.where(live, n_base, 0)

            if eq16 is not None:
                klo_ref, khi_ref, iota16 = eq16
                key_lo = (key & 0x7FFF).astype(jnp.int16)
                key_hi = (key >> 15).astype(jnp.int16)

                def scan_base(s, acc):
                    lo = klo_ref[pl.ds(s * seg, seg)]
                    hi = khi_ref[pl.ds(s * seg, seg)]
                    hit = (lo == key_lo[None]) & (hi == key_hi[None])
                    lm = jnp.max(
                        jnp.where(hit, iota16, jnp.int16(-1)), axis=0
                    )
                    return jnp.where(
                        lm >= 0, lm.astype(jnp.int32) + s * seg, acc
                    )
            else:

                def scan_base(s, acc):
                    rows = dense_ref[pl.ds(s * seg, seg)]
                    lm = jnp.max(
                        jnp.where(rows == key[None], row_iota, -1), axis=0
                    )
                    return jnp.where(lm >= 0, lm + s * seg, acc)

            row_d = jax.lax.fori_loop(0, base_segs, scan_base, neg)

        acc0 = jnp.full((sub, 128), int_min, jnp.int32) if maxval else neg

        def scan_dense(s, acc):
            return match_acc(dense_ref[pl.ds(s * seg, seg)], acc)

        acc = jax.lax.fori_loop(
            base_segs, jnp.where(live, n_dense, 0), scan_dense, acc0
        )

        def scan_stage(s, acc):
            return match_acc(stage_ref[pl.ds(s * sseg, sseg)], acc)

        acc = jax.lax.fori_loop(
            0, jnp.where(live, (j + sseg - 1) // sseg, 0), scan_stage, acc
        )

        if maxval:
            d = acc - tbase
            matched_d = jnp.where((d >= 0) & (d < dyn_codes), d, row_d)
        else:
            matched_d = jnp.maximum(acc, row_d)

        matched = matched_d + first_free
        miss = active & (matched_d < 0) & jnp.logical_not(is_first)
        hit = active & (matched_d >= 0) & jnp.logical_not(is_first)

        out_ref[0, j] = jnp.where(miss | final, prefix, -1)

        if variable:
            ins = miss
            stage_ref[j] = jnp.where(
                ins, (key << 12) | (nxt & 0xFFF), HOLE
            )
            reset = ins & (nxt == reset_threshold)
            nxt = jnp.where(
                reset, first_free, nxt + ins.astype(jnp.int32)
            )

            @pl.when(jnp.any(reset))
            def _invalidate():
                if n_base is None:
                    dense_ref[:] = jnp.where(
                        reset[None], HOLE, dense_ref[:]
                    )
                else:
                    # Two hole encodings: code-indexed segments wipe to -1,
                    # packed append segments to 0 (see the format note in
                    # the docstring).  Rare: at most once per block per lane.
                    def wipe(s, _):
                        fill = jnp.where(s < n_base, -1, HOLE)
                        rows = dense_ref[pl.ds(s * seg, seg)]
                        dense_ref[pl.ds(s * seg, seg)] = jnp.where(
                            reset[None], fill, rows
                        )
                        return 0

                    jax.lax.fori_loop(0, n_dense, wipe, 0)
                    if eq16 is not None:
                        klo_ref, khi_ref, _ = eq16

                        def wipe16(s, _):
                            lo = klo_ref[pl.ds(s * seg, seg)]
                            hi = khi_ref[pl.ds(s * seg, seg)]
                            klo_ref[pl.ds(s * seg, seg)] = jnp.where(
                                reset[None], jnp.int16(0x7FFF), lo
                            )
                            khi_ref[pl.ds(s * seg, seg)] = jnp.where(
                                reset[None], jnp.int16(-1), hi
                            )
                            return 0

                        jax.lax.fori_loop(0, n_base, wipe16, 0)
                stage_ref[:] = jnp.where(
                    reset[None], HOLE, stage_ref[:]
                )
        else:
            ins = miss & (nxt < MAX_TABLE_SIZE)
            stage_ref[j] = jnp.where(ins, (key << 12) | nxt, HOLE)
            nxt = nxt + ins.astype(jnp.int32)

        prefix = jnp.where(
            active & is_first, k,
            jnp.where(miss, k, jnp.where(hit, matched, prefix)),
        )
        return prefix, nxt, err, err_code

    return step


def _stage_append(dense_ref, stage_ref, cur_ref, cell):
    """Stage -> dense append at the shared cursor (whole-row writes)."""
    entries = stage_ref[:]
    compacted, cnt = compact_columns_jax(entries, entries != HOLE, fill=HOLE)
    k0 = cur_ref[0]
    dense_ref[pl.ds(k0, cell)] = compacted
    cur_ref[0] = k0 + jnp.max(cnt)


def _make_kernel_chunk(seg: int, spec_key=None, sseg: int | None = None,
                       eq16: bool = False):
    """Chunked staged-append kernel: ONE launch per CHUNK steps, dictionary
    state (dense table, parse state, cursor) carried as kernel I/O.

    This is how big container blocks (the default 64 KiB variable block)
    run on the chip: the single-launch stage kernel's in-kernel
    recompaction blows up the Mosaic compile (EVOLUTION.md V4), so instead
    the driver (`_run_encode_kernel_chunked`) recompacts the carried table
    BETWEEN launches under XLA — where log-step roll cascades compile fine
    — and each launch appends at a cursor that provably fits
    ``4096 + chunk`` rows (live entries are bounded by the dictionary's own
    reset/freeze semantics, `encoder.rs:330-333`, `:645-647`; per-chunk
    appends are bounded by the step count)."""

    def kernel(x_ref, len_ref, chunk0_ref, dense_in_hbm, state_in_ref,
               cur_in_ref, out_ref, err_ref, dense_out_hbm, state_out_ref,
               dense_ref, stage_ref, cur_ref, dma_sem, *eq_scratch):
        g = pl.program_id(0)
        c = pl.program_id(1)
        last_cell = c == pl.num_programs(1) - 1
        cell = x_ref.shape[1]
        sub = stage_ref.shape[1]

        # The dense table stays in HBM as kernel I/O (it is scan-carried
        # state at the JAX level); one VMEM scratch window serves both
        # directions so the lane count isn't halved by double windows.
        # cur_in is the exact max-lane live count after the between-launch
        # recompaction; rows [0, cur_in) are code-indexed bare keys (padded
        # with -1 holes to the seg-aligned append base), appends land past
        # the aligned base in packed key<<12|code form.
        n_base = (cur_in_ref[g, 0] + seg - 1) // seg

        @pl.when(c == 0)
        def _init():
            dma = pltpu.make_async_copy(
                dense_in_hbm.at[g], dense_ref, dma_sem
            )
            dma.start()
            dma.wait()
            state_out_ref[0] = state_in_ref[0]
            cur_ref[0] = n_base * seg
            if eq16:
                klo_ref, khi_ref = eq_scratch

                def conv(s, _):
                    rows = dense_ref[pl.ds(s * seg, seg)]
                    klo_ref[pl.ds(s * seg, seg)] = (
                        rows & 0x7FFF
                    ).astype(jnp.int16)
                    khi_ref[pl.ds(s * seg, seg)] = (
                        jax.lax.shift_right_arithmetic(rows, 15)
                    ).astype(jnp.int16)
                    return 0

                jax.lax.fori_loop(0, n_base, conv, 0)

        stage_ref[:] = jnp.full(stage_ref.shape, HOLE, jnp.int32)
        lens = len_ref[0, 0]
        off = chunk0_ref[0] + c * cell
        n_dense = (cur_ref[0] + seg - 1) // seg
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (seg, sub, 128), 0)
        eq_refs = None
        if eq16:
            iota16 = jax.lax.broadcasted_iota(
                jnp.int16, (seg, sub, 128), 0
            )
            eq_refs = (eq_scratch[0], eq_scratch[1], iota16)

        step = _stage_step_fn(
            x_ref, out_ref, dense_ref, stage_ref, lens, off, n_dense, seg,
            sub, spec_key, sseg, n_base=n_base, row_iota=row_iota,
            eq16=eq_refs,
        )
        carry = tuple(state_out_ref[0, r] for r in range(4))
        carry = jax.lax.fori_loop(0, cell, step, carry)
        for r in range(4):
            state_out_ref[0, r] = carry[r]

        _stage_append(dense_ref, stage_ref, cur_ref, cell)

        @pl.when(last_cell)
        def _finish():
            err_ref[0, 0] = carry[2]
            err_ref[0, 1] = carry[3]
            dma = pltpu.make_async_copy(
                dense_ref, dense_out_hbm.at[g], dma_sem
            )
            dma.start()
            dma.wait()

    return kernel


def _make_kernel_stage(seg: int, block_size: int, spec_key=None,
                       sseg: int | None = None):
    """Staged-append kernel (all flavors): bounded VMEM at ANY block size.

    The dictionary holds at most 4096 live entries (the fixed flavor
    freezes, `encoder.rs:645-647`; variable flavors CLEAR-reset,
    `encoder.rs:330-333`), so the dense table is bounded regardless of
    block length.  Inserts land step-indexed in a per-cell staging buffer;
    at each cell boundary the stage is hole-compacted and written at a
    *uniform* scalar cursor into a contiguous dense table (whole-row
    writes — no per-lane shifts).  Lanes with fewer entries leave holes
    under the max-count cursor, which the next append overwrites.  Lookups
    scan dense rows [0, cursor) in one straight loop plus the written
    prefix of the stage.  Variable CLEAR resets physically wipe the
    resetting lane's column in both tables.

    This is both the small-block default (a simpler, faster replacement for
    the segment-list bucket design at 4 KiB) and, in interpret mode, the
    single-launch big-block oracle; on hardware, big blocks run the chunked
    kernel instead (`_make_kernel_chunk`) because the recompaction body here
    blows up the Mosaic compile (EVOLUTION.md V4)."""
    first_free = FIRST_FREE if spec_key is None else spec_key[0]

    def kernel(x_ref, len_ref, out_ref, err_ref, dense_ref, stage_ref,
               cur_ref, state_ref):
        c = pl.program_id(1)
        last_cell = c == pl.num_programs(1) - 1
        cell = x_ref.shape[1]
        sub = dense_ref.shape[1]

        @pl.when(c == 0)
        def _init():
            dense_ref[:] = jnp.full(dense_ref.shape, HOLE, jnp.int32)
            state_ref[0] = jnp.zeros((sub, 128), jnp.int32)  # prefix
            state_ref[1] = jnp.full((sub, 128), first_free, jnp.int32)
            state_ref[2] = jnp.zeros((sub, 128), jnp.int32)  # error flag
            state_ref[3] = jnp.zeros((sub, 128), jnp.int32)  # error code
            cur_ref[0] = 0  # dense cursor (rows appended so far)

        stage_ref[:] = jnp.full(stage_ref.shape, HOLE, jnp.int32)
        lens = len_ref[0, 0]
        base = c * cell
        n_dense = (cur_ref[0] + seg - 1) // seg

        step = _stage_step_fn(
            x_ref, out_ref, dense_ref, stage_ref, lens, base, n_dense, seg,
            sub, spec_key, sseg,
        )
        carry = tuple(state_ref[r] for r in range(4))
        carry = jax.lax.fori_loop(0, cell, step, carry)
        for r in range(4):
            state_ref[r] = carry[r]

        # The cursor advances by the per-cell max over lanes, so lanes with
        # fewer entries leave holes and the cursor can outrun any single
        # lane's live-entry bound: when the next append would overflow,
        # re-compact the whole dense table (squeezes all holes; per-lane
        # live entries are bounded by the reset/freeze semantics, so space
        # is guaranteed).  At block sizes <= 4096 the cursor is bounded by
        # the step count and the recompaction body is statically omitted —
        # which is why this single-launch kernel only runs on hardware for
        # small blocks.
        D_ROWS = dense_ref.shape[0]
        if block_size + cell > D_ROWS:

            @pl.when(cur_ref[0] + cell > D_ROWS)
            def _recompact():
                allrows = dense_ref[:]
                squeezed, dcnt = compact_columns_jax(
                    allrows, allrows != HOLE, fill=HOLE
                )
                dense_ref[:] = squeezed
                cur_ref[0] = jnp.max(dcnt)

        _stage_append(dense_ref, stage_ref, cur_ref, cell)

        @pl.when(last_cell)
        def _finish():
            err_ref[0, 0] = carry[2]
            err_ref[0, 1] = carry[3]

    return kernel


def _make_kernel_compact(seg: int, spec_key):
    def kernel(x_ref, len_ref, out_ref, err_ref, dtab_ref, ctab_ref,
               state_ref):
        return _encode_kernel_compact(
            x_ref, len_ref, out_ref, err_ref, dtab_ref, ctab_ref, state_ref,
            seg, spec_key,
        )

    return kernel


def _encode_kernel_compact(x_ref, len_ref, out_ref, err_ref, dtab_ref,
                           ctab_ref, state_ref, SEG, spec_key):
    """Compacted-table variant: inserts land step-indexed in a per-cell
    buffer; at each cell boundary the fresh entries are hole-compacted and
    appended (per-lane shift) to a dense table, so the per-step compare-scan
    covers ~miss-count rows instead of ~step-count rows.  ~1.5x less scan
    bandwidth at typical 0.4-0.6 miss rates."""
    from lzw_tpu.kernels.common import compact_columns_jax, shift_columns_jax

    c = pl.program_id(1)
    last_cell = c == pl.num_programs(1) - 1
    cell = x_ref.shape[1]
    D_ROWS, sub = dtab_ref.shape[:2]
    variable = spec_key is not None
    if variable:
        first_free, max_code, reset_threshold = spec_key
    else:
        first_free, max_code, reset_threshold = FIRST_FREE, 255, None
    dyn_codes = MAX_TABLE_SIZE - first_free

    @pl.when(c == 0)
    def _init():
        dtab_ref[:] = jnp.full(dtab_ref.shape, HOLE, jnp.int32)
        state_ref[0] = jnp.zeros((sub, 128), jnp.int32)  # prefix
        state_ref[1] = jnp.full((sub, 128), first_free, jnp.int32)  # next
        state_ref[2] = jnp.zeros((sub, 128), jnp.int32)  # dense epoch start
        state_ref[3] = jnp.zeros((sub, 128), jnp.int32)  # error flag
        state_ref[4] = jnp.zeros((sub, 128), jnp.int32)  # error code
        state_ref[5] = jnp.zeros((sub, 128), jnp.int32)  # dense count

    # The in-cell buffer restarts every cell.
    ctab_ref[:] = jnp.full(ctab_ref.shape, HOLE, jnp.int32)

    lens = len_ref[0, 0]  # (sub, 128)
    base = c * cell
    dc0 = state_ref[5]
    # Dense rows to scan this cell (dense table is frozen between cells).
    s_hi = (jnp.max(dc0) + SEG - 1) // SEG
    s_lo = jnp.min(state_ref[2]) // SEG if variable else 0
    ROW0 = jax.lax.broadcasted_iota(jnp.int32, (SEG, sub, 128), 0)

    def step(j, carry):
        prefix, nxt, est, err, err_code = carry  # (sub, 128) each
        i = base + j
        k = x_ref[0, j]
        active = (i < lens) & (err == 0)
        final = (i == lens) & (lens > 0) & (err == 0)
        is_first = i == 0

        if variable:
            bad = active & jnp.logical_not(is_first) & (k > max_code)
            err = jnp.where(bad, 1, err)
            err_code = jnp.where(bad, k, err_code)
            active = active & jnp.logical_not(bad)

        key = prefix * 256 + k
        tbase = (key << 12) + first_free

        def scan_dense(s, acc):
            seg_rows = dtab_ref[pl.ds(s * SEG, SEG)]
            d = seg_rows - tbase[None]
            valid = (d >= 0) & (d < dyn_codes)
            if variable:
                valid &= (ROW0 + s * SEG) >= est[None]
            sel = jnp.where(valid, d, -1)
            return jnp.maximum(acc, jnp.max(sel, axis=0))

        acc0 = jnp.full((sub, 128), -1, jnp.int32)
        matched_d = jax.lax.fori_loop(s_lo, s_hi, scan_dense, acc0)
        # Fresh entries of this cell (rows past j are holes).
        dcell = ctab_ref[:] - tbase[None]
        cvalid = (dcell >= 0) & (dcell < dyn_codes)
        matched_d = jnp.maximum(
            matched_d, jnp.max(jnp.where(cvalid, dcell, -1), axis=0)
        )

        matched = matched_d + first_free
        miss = active & (matched_d < 0) & jnp.logical_not(is_first)
        hit = active & (matched_d >= 0) & jnp.logical_not(is_first)

        out_ref[0, j] = jnp.where(miss | final, prefix, -1)

        if variable:
            ins = miss
            ctab_ref[j] = jnp.where(ins, (key << 12) | (nxt & 0xFFF), HOLE)
            reset = ins & (nxt == reset_threshold)
            nxt = jnp.where(reset, first_free, nxt + ins.astype(jnp.int32))

            # A reset invalidates the lane's dense region (epoch bound) and
            # its fresh in-cell entries (zeroed in place; rare).  With the
            # fresh entries gone, the lane's post-reset appends land exactly
            # at dense row dc0, which becomes the new epoch bound.
            @pl.when(jnp.any(reset))
            def _invalidate():
                ctab_ref[:] = jnp.where(reset[None], HOLE, ctab_ref[:])

            est = jnp.where(reset, dc0, est)
        else:
            ins = miss & (nxt < MAX_TABLE_SIZE)
            ctab_ref[j] = jnp.where(ins, (key << 12) | nxt, HOLE)
            nxt = nxt + ins.astype(jnp.int32)

        prefix = jnp.where(
            active & is_first, k,
            jnp.where(miss, k, jnp.where(hit, matched, prefix)),
        )
        return prefix, nxt, est, err, err_code

    carry = tuple(state_ref[r] for r in range(5))
    carry = jax.lax.fori_loop(0, cell, step, carry)
    for r in range(5):
        state_ref[r] = carry[r]

    # Cell-boundary compaction: fresh entries -> dense table append.
    entries = ctab_ref[:]
    compacted, cnt = compact_columns_jax(entries, entries != HOLE, fill=HOLE)
    staged = jnp.concatenate(
        [compacted, jnp.zeros((D_ROWS - cell, sub, 128), jnp.int32)], axis=0
    )
    staged = shift_columns_jax(staged, dc0, fill=HOLE)
    dtab_ref[:] = dtab_ref[:] | staged
    state_ref[5] = dc0 + cnt

    @pl.when(last_cell)
    def _finish():
        err_ref[0, 0] = carry[3]
        err_ref[0, 1] = carry[4]


def _encode_kernel(x_ref, len_ref, out_ref, err_ref, ptab_ref, state_ref,
                   SEG, spec_key):
    """Grid: (groups, cells).  Scratch persists across the cell dimension."""
    c = pl.program_id(1)
    last_cell = c == pl.num_programs(1) - 1
    cell = x_ref.shape[1]
    T_ROWS, sub = ptab_ref.shape[:2]
    variable = spec_key is not None
    if variable:
        first_free, max_code, reset_threshold = spec_key
    else:
        first_free, max_code, reset_threshold = FIRST_FREE, 255, None
    dyn_codes = MAX_TABLE_SIZE - first_free

    @pl.when(c == 0)
    def _init():
        ptab_ref[:] = jnp.full(ptab_ref.shape, HOLE, jnp.int32)
        state_ref[0] = jnp.zeros((sub, 128), jnp.int32)  # prefix
        state_ref[1] = jnp.full((sub, 128), first_free, jnp.int32)  # next
        state_ref[2] = jnp.zeros((sub, 128), jnp.int32)  # epoch start row
        state_ref[3] = jnp.zeros((sub, 128), jnp.int32)  # error flag
        state_ref[4] = jnp.zeros((sub, 128), jnp.int32)  # error code

    lens = len_ref[0, 0]  # (sub, 128)
    base = c * cell
    # Rows written so far live in [0, cell_end); tile-aligned segment count.
    n_segs = jnp.minimum((base + cell + SEG - 1) // SEG, T_ROWS // SEG)
    ROW0 = jax.lax.broadcasted_iota(jnp.int32, (SEG, sub, 128), 0)

    def step(j, carry):
        prefix, nxt, estart, err, err_code = carry  # (sub, 128) each
        i = base + j
        k = x_ref[0, j]  # (sub, 128) native tile
        active = (i < lens) & (err == 0)
        final = (i == lens) & (lens > 0) & (err == 0)
        is_first = i == 0

        if variable:
            bad = active & jnp.logical_not(is_first) & (k > max_code)
            err = jnp.where(bad, 1, err)
            err_code = jnp.where(bad, k, err_code)
            active = active & jnp.logical_not(bad)

        key = prefix * 256 + k  # 20-bit dictionary key

        # Compare-scan over written rows.  Entry = key<<12 | code with code in
        # [first_free, 4096), so "entry - (target+first_free) in
        # [0, dyn_codes)" is an exact match test that also rejects holes and
        # wrapped deltas; the matched difference IS code-first_free — no
        # index extraction, no value gather.  For variable flavors entries
        # from before the lane's last dictionary reset are masked by row.
        tbase = (key << 12) + first_free

        def scan_seg(s, acc):
            seg = ptab_ref[pl.ds(s * SEG, SEG)]  # (SEG, sub, 128)
            d = seg - tbase[None]
            valid = (d >= 0) & (d < dyn_codes)
            if variable:
                valid &= (ROW0 + s * SEG) >= estart[None]
            sel = jnp.where(valid, d, -1)
            return jnp.maximum(acc, jnp.max(sel, axis=0))

        matched_d = jax.lax.fori_loop(
            0, n_segs, scan_seg, jnp.full((sub, 128), -1, jnp.int32)
        )
        matched = matched_d + first_free  # valid only where matched_d >= 0
        miss = active & (matched_d < 0) & jnp.logical_not(is_first)
        hit = active & (matched_d >= 0) & jnp.logical_not(is_first)

        out_ref[0, j] = jnp.where(miss | final, prefix, -1)

        # Insert: one uniform tile store at the current step row.  Variable
        # flavors insert unconditionally (the entry that trips the reset is
        # immediately invalidated by the epoch rewind and never matchable).
        if variable:
            ins = miss
            ptab_ref[base + j] = jnp.where(
                ins, (key << 12) | (nxt & 0xFFF), HOLE
            )
            reset = ins & (nxt == reset_threshold)
            nxt = jnp.where(reset, first_free, nxt + ins.astype(jnp.int32))
            estart = jnp.where(reset, i + 1, estart)
        else:
            ins = miss & (nxt < MAX_TABLE_SIZE)
            ptab_ref[base + j] = jnp.where(ins, (key << 12) | nxt, HOLE)
            nxt = nxt + ins.astype(jnp.int32)

        prefix = jnp.where(
            active & is_first, k,
            jnp.where(miss, k, jnp.where(hit, matched, prefix)),
        )
        return prefix, nxt, estart, err, err_code

    carry = tuple(state_ref[r] for r in range(5))
    carry = jax.lax.fori_loop(0, cell, step, carry)
    for r in range(5):
        state_ref[r] = carry[r]

    @pl.when(last_cell)
    def _finish():
        err_ref[0, 0] = carry[3]
        err_ref[0, 1] = carry[4]


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


def _run_encode_kernel(blocks, lens, block_size, spec_key, interpret, group,
                       cell, seg, compact=False, sseg=None):
    """Shared pallas_call driver; returns (codes [G,slots,sub,128], err)."""
    N, B = blocks.shape
    assert B == block_size
    if compact != "stage":
        assert block_size <= BLOCK_SIZE  # step-indexed tables track steps
    assert block_size % cell == 0 and cell % min(seg, cell) == 0
    assert N % group == 0 and group % 128 == 0
    sub = group // 128
    G = N // group
    slots = B + cell

    # [N, B] -> [G, slots, sub, 128] step-major tiles, widened to i32.
    x = blocks.astype(jnp.int32).reshape(G, sub, 128, B).transpose(0, 3, 1, 2)
    x = jnp.concatenate(
        [x, jnp.zeros((G, slots - B, sub, 128), jnp.int32)], axis=1
    )
    l = lens.reshape(G, 1, sub, 128)

    if compact == "stage":
        sseg = _clamp_sseg(sseg, cell)
        kernel = _make_kernel_stage(min(seg, cell), block_size, spec_key,
                                    sseg)
        scratch = [
            pltpu.VMEM((MAX_TABLE_SIZE + cell, sub, 128), jnp.int32),  # dense
            pltpu.VMEM((cell, sub, 128), jnp.int32),  # per-cell stage
            pltpu.SMEM((1,), jnp.int32),  # dense cursor
            pltpu.VMEM((4, sub, 128), jnp.int32),
        ]
    elif compact == "bucket":
        seg_b = min(seg, 128)
        kernel = _make_kernel_bucket(seg_b, spec_key)
        scratch = [
            pltpu.VMEM((slots, sub, 128), jnp.int32),  # bucketed table
            pltpu.SMEM((1,), jnp.int32),  # dense-segment count
            pltpu.SMEM((slots // seg_b + 8,), jnp.int32),  # segment list
            pltpu.VMEM((4, sub, 128), jnp.int32),
        ]
    elif compact:
        kernel = _make_kernel_compact(seg, spec_key)
        scratch = [
            pltpu.VMEM((slots + cell, sub, 128), jnp.int32),  # dense table
            pltpu.VMEM((cell, sub, 128), jnp.int32),  # in-cell buffer
            pltpu.VMEM((6, sub, 128), jnp.int32),
        ]
    else:
        kernel = _make_kernel(seg, spec_key)
        scratch = [
            pltpu.VMEM((slots, sub, 128), jnp.int32),
            pltpu.VMEM((5, sub, 128), jnp.int32),
        ]

    codes, errs = pl.pallas_call(
        kernel,
        grid=(G, slots // cell),
        in_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 1, sub, 128), lambda g, c: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 8, sub, 128), lambda g, c: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, slots, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, sub, 128), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, l)

    # Compact holes per block column, back to [N, slots] block-major.
    return _compact_grouped_codes(codes, errs, G, slots, group, N)


def _compact_grouped_codes(codes, errs, G, total, group, N):
    """Per-block-column hole compaction + layout restore (shared tail)."""
    flat = codes.reshape(G, total, group)
    dense, counts = jax.vmap(
        lambda v: compact_columns_jax(v, v >= 0, fill=0)
    )(flat)
    dense = dense.transpose(0, 2, 1).reshape(N, total)
    counts = counts.reshape(N)
    errs = errs.reshape(G, 8, group).transpose(0, 2, 1).reshape(N, 8)
    return dense, counts, errs[:, 0], errs[:, 1]


def _run_encode_kernel_chunked(blocks, lens, block_size, spec_key, interpret,
                               group, cell, seg, chunk, sseg=None,
                               eq16=False):
    """Chunked pallas driver: any block size with a statically bounded table.

    One launch of `_make_kernel_chunk` per ``chunk`` steps; the dictionary
    (dense table, parse state, append cursor) is carried between launches
    through a `lax.scan`, and the dense table is hole-recompacted under XLA
    after each launch — XLA compiles the log-step roll cascades fine, where
    Mosaic does not (EVOLUTION.md V4).  Live entries per lane are bounded by
    the dictionary's own reset/freeze semantics (`encoder.rs:330-333`,
    `:645-647`) at < 4096, and per-chunk appends by the step count, so the
    in-kernel table is exactly ``MAX_TABLE_SIZE + chunk`` rows at ANY block
    size."""
    N, B = blocks.shape
    assert B == block_size and block_size % cell == 0
    assert chunk % cell == 0 and cell % min(seg, cell) == 0
    assert N % group == 0 and group % 128 == 0
    seg = min(seg, cell)
    # The aligned eq-region base must stay within the table and on segment
    # boundaries for every reachable cursor (cursor <= MAX_TABLE_SIZE).
    assert MAX_TABLE_SIZE % seg == 0
    sub = group // 128
    G = N // group
    slots = B + cell  # the final-prefix emission lands one step past lens
    n_chunks = -(-slots // chunk)
    total = n_chunks * chunk
    R = MAX_TABLE_SIZE + chunk

    x = blocks.astype(jnp.int32).reshape(G, sub, 128, B).transpose(0, 3, 1, 2)
    x = jnp.concatenate(
        [x, jnp.zeros((G, total - B, sub, 128), jnp.int32)], axis=1
    )
    xs = x.reshape(G, n_chunks, chunk, sub, 128).transpose(1, 0, 2, 3, 4)
    l = lens.reshape(G, 1, sub, 128)
    sseg = _clamp_sseg(sseg, cell)

    # The scan+pallas pipeline MISCOMPUTES on hardware once one compiled
    # program holds G >= 3 grid groups (r3) — and the r5 arbiter probes
    # (scripts/ab_supergroup.py + native round-trip checks) showed the old
    # lax.map "super-group" serialization does NOT contain it: lax.map
    # inlines its body into the same XLA program, and map-wrapped G<=2
    # bodies corrupt at 64 KiB just like direct G>=3 (N=4096/group=1024
    # and group=512 both produced wrong bytes on every row; direct G<=2
    # is byte-exact vs the native decoder).  True isolation needs separate
    # XLA executables, so the PUBLIC entry points slice big batches into
    # <= SUPER_GROUP_MAX-group calls OUTSIDE their jit
    # (`_chunked_row_batches`); this driver only accepts safe shapes.
    assert interpret or G <= SUPER_GROUP_MAX, (
        "chunked encode compiled with G > SUPER_GROUP_MAX grid groups: "
        "callers must slice batches outside jit (miscompile family #1)", G,
    )
    codes, errs = _scan_chunks(
        xs, l, G, sub, n_chunks, chunk, cell, seg, sseg, spec_key, R,
        total, interpret, eq16,
    )
    return _compact_grouped_codes(codes, errs, G, total, group, N)


def _scan_chunks(xs, l, G, sub, n_chunks, chunk, cell, seg, sseg, spec_key,
                 R, total, interpret, eq16=False):
    """One lax.scan over the chunk axis for G grid groups; returns the raw
    code slots (G, total, sub, 128) and the final error planes."""
    first_free = FIRST_FREE if spec_key is None else spec_key[0]
    dense0 = jnp.full((G, R, sub, 128), HOLE, jnp.int32)
    state0 = jnp.stack(
        [jnp.zeros((G, sub, 128), jnp.int32),               # prefix
         jnp.full((G, sub, 128), first_free, jnp.int32),    # next code
         jnp.zeros((G, sub, 128), jnp.int32),               # error flag
         jnp.zeros((G, sub, 128), jnp.int32)], axis=1,      # error code
    )
    cur0 = jnp.zeros((G, 1), jnp.int32)
    offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[:, None]

    call = pl.pallas_call(
        _make_kernel_chunk(seg, spec_key, sseg, eq16),
        grid=(G, chunk // cell),
        in_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 1, sub, 128), lambda g, c: (g, 0, 0, 0)),
            pl.BlockSpec((1,), lambda g, c: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # dense table (HBM)
            pl.BlockSpec((1, 4, sub, 128), lambda g, c: (g, 0, 0, 0)),
            # Whole-array SMEM view indexed by program_id(0) in the kernel:
            # a (1, 1) block over (G, 1) trips Mosaic's block-shape rule
            # for G > 1 (first seen at 4 groups).
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cell, sub, 128), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 8, sub, 128), lambda g, c: (g, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # dense table (HBM)
            pl.BlockSpec((1, 4, sub, 128), lambda g, c: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, chunk, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, R, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 4, sub, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, sub, 128), jnp.int32),     # dense working window
            pltpu.VMEM((cell, sub, 128), jnp.int32),  # per-cell stage
            pltpu.SMEM((1,), jnp.int32),              # append cursor
            pltpu.SemaphoreType.DMA,                  # table in/out copies
        ] + ([pltpu.VMEM(
            ((-(-MAX_TABLE_SIZE // seg)) * seg, sub, 128), jnp.int16
        )] * 2 if eq16 else []),                      # i16 eq-region planes
        input_output_aliases={3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    rowix = jnp.arange(R, dtype=jnp.int32)[None, :, None, None]

    def body(carry, xc):
        dense, state, cur = carry
        xi, off = xc
        codes_c, errs_c, dense2, state2 = call(xi, l, off, dense, state, cur)
        # dense2 is format-split (see _stage_step_fn): rows below the
        # seg-aligned append base hold bare keys (hole -1), rows above hold
        # packed key<<12|code appends (hole 0).  Convert everything to bare
        # keys, re-compact (stable per lane, so row = code - first_free
        # again), and re-establish the two hole encodings around the new
        # aligned base for the next launch.
        base = (((cur + seg - 1) // seg) * seg)[:, :, None, None]
        in_base = rowix < base
        valid = jnp.where(in_base, dense2 >= 0, dense2 != HOLE)
        keys = jnp.where(
            in_base, dense2, jax.lax.shift_right_logical(dense2, 12)
        )
        dense3, cnts = jax.vmap(
            lambda v, m: compact_columns_jax(v, m, fill=-1)
        )(keys, valid)
        cur2 = jnp.max(cnts.reshape(G, -1), axis=1).astype(jnp.int32)[:, None]
        base2 = (((cur2 + seg - 1) // seg) * seg)[:, :, None, None]
        dense3 = jnp.where(rowix < base2, dense3, HOLE)
        return (dense3, state2, cur2), (codes_c, errs_c)

    (_, _, _), (codes_all, errs_all) = jax.lax.scan(
        body, (dense0, state0, cur0), (xs, offs)
    )
    codes = codes_all.transpose(1, 0, 2, 3, 4).reshape(G, total, sub, 128)
    return codes, errs_all[-1]


def _stage_knobs(chunked: bool, compact, cell, seg, sseg):
    """Resolve tile knobs: the single-launch stage path defaults to the
    finer r5-tuned tiles; the chunked driver keeps the coarser config."""
    stage = (not chunked) and compact == "stage"
    if cell is None:
        cell = CELL_STAGE if stage else (CELL_CHUNK if chunked else CELL)
    if seg is None:
        seg = SEG_STAGE if stage else SEG
    if sseg is None:
        sseg = SSEG_STAGE if stage else SSEG
    return cell, seg, sseg


def group_for(block_size: int) -> int:
    """Blocks-per-instance the kernels expect callers to pad to."""
    return GROUP if block_size <= BLOCK_SIZE else GROUP_CHUNKED


def encode_blocks_fixed_tpu(blocks, lens, block_size: int = BLOCK_SIZE,
                            little: bool = True, interpret: bool = False,
                            group: int | None = None,
                            cell: int | None = None,
                            seg: int | None = None,
                            compact: str | bool = "stage",
                            chunk: int = CHUNK, sseg: int | None = None,
                            chunked: bool | None = None,
                            eq16: bool = False):
    """Fixed-12-bit block-parallel encode on TPU (see the jitted worker
    below for the contract).  This wrapper slices batches that would
    compile more than SUPER_GROUP_MAX grid groups into SEPARATE jit
    executions — lax.map/in-program splits do NOT contain the G>=3
    chunked-scan miscompile (r5 arbiter find); only distinct XLA
    executables do.  Dispatches are async, so slices still pipeline."""
    if group is None:
        group = group_for(block_size)
    if chunked is None:
        chunked = block_size > BLOCK_SIZE
    N = blocks.shape[0]
    lim = SUPER_GROUP_MAX * group
    if chunked and N > lim:
        parts = [
            _encode_blocks_fixed_jit(
                blocks[i : i + lim], lens[i : i + lim], block_size, little,
                interpret, group, cell, seg, compact, chunk, sseg, chunked,
                eq16,
            )
            for i in range(0, N, lim)
        ]
        return tuple(
            jnp.concatenate(xs, axis=0) for xs in zip(*parts)
        )
    return _encode_blocks_fixed_jit(
        blocks, lens, block_size, little, interpret, group, cell, seg,
        compact, chunk, sseg, chunked, eq16,
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "little", "interpret", "group", "cell",
                     "seg", "compact", "chunk", "sseg", "chunked", "eq16"),
)
def _encode_blocks_fixed_jit(blocks, lens, block_size: int = BLOCK_SIZE,
                            little: bool = True, interpret: bool = False,
                            group: int | None = None,
                            cell: int | None = None,
                            seg: int | None = None,
                            compact: str | bool = "stage",
                            chunk: int = CHUNK, sseg: int | None = None,
                            chunked: bool | None = None,
                            eq16: bool = False):
    """Fixed-12-bit block-parallel encode on TPU.

    Args:
      blocks: u8[N, block_size], N a multiple of ``group``; block sizes past
        BLOCK_SIZE run the chunked driver (`_run_encode_kernel_chunked`).
      lens:   i32[N] valid byte counts.
      group: blocks per kernel instance (``group_for(block_size)`` on
        hardware; smaller in interpret-mode tests — a multiple of 128).
      cell/seg/chunk: streaming tile / scan segment / launch sizes (knobs).
    Returns:
      payloads u8[N, PB] (zero-padded), lengths i32[N].
    """
    if group is None:
        group = group_for(block_size)
    if chunked is None:
        chunked = block_size > BLOCK_SIZE
    cell, seg, sseg = _stage_knobs(chunked, compact, cell, seg, sseg)
    if chunked:
        dense, counts, _, _ = _run_encode_kernel_chunked(
            blocks, lens, block_size, None, interpret, group, cell, seg,
            chunk, sseg, eq16,
        )
    else:
        dense, counts, _, _ = _run_encode_kernel(
            blocks, lens, block_size, None, interpret, group, cell, seg,
            compact, sseg,
        )
    payloads, lengths = _pack12(dense, counts, little)
    return payloads, lengths


def encode_blocks_variable_codes_tpu(blocks, lens, spec,
                                     block_size: int = BLOCK_SIZE,
                                     interpret: bool = False,
                                     group: int | None = None,
                                     cell: int | None = None,
                                     seg: int | None = None,
                                     compact: str | bool = "stage",
                                     chunk: int = CHUNK,
                                     sseg: int | None = None,
                                     chunked: bool | None = None,
                                     eq16: bool = False):
    """Variable-flavor block encode (see the jitted worker below for the
    contract).  Slices batches past SUPER_GROUP_MAX grid groups into
    separate jit executions — the only isolation that actually contains
    the G>=3 chunked-scan miscompile (r5 arbiter find)."""
    if group is None:
        group = group_for(block_size)
    if chunked is None:
        chunked = block_size > BLOCK_SIZE
    N = blocks.shape[0]
    lim = SUPER_GROUP_MAX * group
    if chunked and N > lim:
        parts = [
            _encode_blocks_variable_jit(
                blocks[i : i + lim], lens[i : i + lim], spec, block_size,
                interpret, group, cell, seg, compact, chunk, sseg, chunked,
                eq16,
            )
            for i in range(0, N, lim)
        ]
        return tuple(
            jnp.concatenate(xs, axis=0) for xs in zip(*parts)
        )
    return _encode_blocks_variable_jit(
        blocks, lens, spec, block_size, interpret, group, cell, seg,
        compact, chunk, sseg, chunked, eq16,
    )


@functools.partial(
    jax.jit,
    static_argnames=("spec", "block_size", "interpret", "group", "cell",
                     "seg", "compact", "chunk", "sseg", "chunked", "eq16"),
)
def _encode_blocks_variable_jit(blocks, lens, spec,
                                     block_size: int = BLOCK_SIZE,
                                     interpret: bool = False,
                                     group: int | None = None,
                                     cell: int | None = None,
                                     seg: int | None = None,
                                     compact: str | bool = "stage",
                                     chunk: int = CHUNK,
                                     sseg: int | None = None,
                                     chunked: bool | None = None,
                                     eq16: bool = False):
    """Variable-flavor block encode on TPU: dense data codes per block.

    The wire layout of a variable stream is a static function of the
    emission ordinal (`lzw_tpu.kernels.schedule`), so the kernel only
    produces code values; callers pack with ``schedule.pack_variable``.
    Block sizes past BLOCK_SIZE run the chunked driver.

    Returns (dense i32[N, S], counts i32[N], err i32[N], err_code i32[N]).
    """
    spec.validate()
    spec_key = (
        spec.first_free_code,
        spec.max_code_value,
        MAX_TABLE_SIZE - spec.strategy.increment,
    )
    if group is None:
        group = group_for(block_size)
    if chunked is None:
        chunked = block_size > BLOCK_SIZE
    cell, seg, sseg = _stage_knobs(chunked, compact, cell, seg, sseg)
    if chunked:
        return _run_encode_kernel_chunked(
            blocks, lens, block_size, spec_key, interpret, group, cell, seg,
            chunk, sseg, eq16,
        )
    return _run_encode_kernel(
        blocks, lens, block_size, spec_key, interpret, group, cell, seg,
        compact, sseg,
    )


def encode_pack_variable_tpu(blocks, lens, spec,
                             block_size: int = BLOCK_SIZE,
                             fix_eoi: bool = True,
                             return_codes: bool = False, **kw):
    """Variable encode + device bit-pack as TWO separate XLA programs.

    Do NOT wrap :func:`encode_blocks_variable_codes_tpu` and
    ``schedule.pack_variable_device`` in one outer ``jax.jit`` on TPU
    hardware: the fused program mis-packs the stream (r3 live find — with
    the chunked 64 KiB driver the dense code matrix is bit-exact but the
    fused pack diverges from ~the 9-bit segment on, on every row, on both
    corpora; an ``optimization_barrier`` between the stages does NOT fix
    it, and each stage compiled as its own program is byte-exact vs the
    oracle).  Shape-triggered XLA/relay miscompiles in this pipeline have
    precedent (`_run_encode_kernel_chunked`'s G>=3 super-group map).  This
    helper is the sanctioned composition; the container
    (`parallel/block.py`) uses the same two-dispatch split.

    Returns (payload u8[N, PB], n_bytes i32[N], err i32[N], err_code
    i32[N]); with ``return_codes`` the dense code matrix and counts are
    appended so callers (oracle checks, A/B harnesses) can reuse them
    without re-tracing the encode kernel.
    """
    from lzw_tpu.kernels import schedule as _sched

    enc = _encode_codes_jitted(spec, block_size, tuple(sorted(kw.items())))
    dense, counts, errs, err_codes = enc(blocks, lens)
    bufs, nb = _sched.pack_variable_device(dense, counts, spec,
                                           fix_eoi=fix_eoi)
    if return_codes:
        return bufs, nb, errs, err_codes, dense, counts
    return bufs, nb, errs, err_codes


@functools.lru_cache(maxsize=16)
def _encode_codes_jitted(spec, block_size, kw_items):
    kw = dict(kw_items)

    def f(blocks, lens):
        return encode_blocks_variable_codes_tpu(
            blocks, lens, spec, block_size, **kw
        )

    # NOT re-wrapped in jax.jit: the public wrapper slices big batches
    # into separate executions precisely so that no single program holds
    # G > SUPER_GROUP_MAX grid groups; an outer jit would inline the
    # slices back into one program (r5 arbiter find).
    return f
