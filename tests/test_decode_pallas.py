"""Pallas decode pass-1 + native copy-apply vs the oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lzw_tpu.kernels import decode_pallas
from lzw_tpu.native.runtime import get_runtime, native_available
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import Endianness, LzwSpec

FIXED_LE = LzwSpec.fixed(Endianness.LITTLE)
FIXED_BE = LzwSpec.fixed(Endianness.BIG)


def decode_via_kernel(payload_list, spec, block_size, group=128, cell=64,
                      seg=64):
    n = len(payload_list)
    N = ((n + group - 1) // group) * group
    pb = max((len(p) for p in payload_list), default=1)
    pb = ((pb + 2) // 3) * 3
    payloads = np.zeros((N, pb), np.uint8)
    plens = np.zeros(N, np.int32)
    for i, p in enumerate(payload_list):
        payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
        plens[i] = len(p)
    words, n_codes, totals, errs, err_codes, _ = decode_pallas.decode_pass1_fixed_tpu(
        jnp.asarray(payloads), jnp.asarray(plens), block_size,
        little=spec.endianness is Endianness.LITTLE,
        interpret=True, group=group, cell=cell, seg=seg,
    )
    words = np.asarray(words)
    totals = np.asarray(totals)
    errs = np.asarray(errs)
    assert not errs[:n].any(), f"unexpected errors {errs[:n]}"
    if native_available():
        out, lengths = get_runtime().apply_words(words[:n], block_size)
        assert (lengths == totals[:n]).all()
        return [out[i, : lengths[i]].tobytes() for i in range(n)]
    pytest.skip("native runtime unavailable")


@pytest.mark.parametrize("spec", [FIXED_LE, FIXED_BE], ids=["le", "be"])
def test_random_payloads(spec):
    rng = np.random.default_rng(0)
    datas = [
        rng.integers(0, 256, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(8)
    ]
    payloads = [oracle.encode_bytes(d, spec) for d in datas]
    got = decode_via_kernel(payloads, spec, block_size=128)
    for i, d in enumerate(datas):
        assert got[i] == d, f"block {i}"


def test_compressible_payloads():
    datas = [
        bytes([1] * 60 + [2] * 40 + [1, 2, 3] * 9),
        (b"ababab" * 22)[:128],
        b"\x00" * 128,
        b"",
        b"\x41",
    ]
    payloads = [oracle.encode_bytes(d, FIXED_LE) for d in datas]
    got = decode_via_kernel(payloads, FIXED_LE, block_size=128)
    for i, d in enumerate(datas):
        assert got[i] == d, f"block {i}"


def test_kwkwk_heavy():
    data = bytes([7] * 120)  # pure run: KwKwK chain
    payloads = [oracle.encode_bytes(data, FIXED_LE)]
    got = decode_via_kernel(payloads, FIXED_LE, block_size=128)
    assert got[0] == data


def test_unexpected_code_flagged():
    # Code far beyond next index on the second code.
    bad = oracle.pack_codes([(65, 12), (3000, 12)], Endianness.LITTLE)
    N, pb = 128, 3
    payloads = np.zeros((N, pb), np.uint8)
    payloads[0, : len(bad)] = np.frombuffer(bad, np.uint8)
    plens = np.zeros(N, np.int32)
    plens[0] = len(bad)
    _, _, _, errs, err_codes, _ = decode_pallas.decode_pass1_fixed_tpu(
        jnp.asarray(payloads), jnp.asarray(plens), 128,
        interpret=True, group=128, cell=64, seg=64,
    )
    assert int(np.asarray(errs)[0]) == 1
    assert int(np.asarray(err_codes)[0]) == 3000


@pytest.mark.slow
def test_table_freeze_decode():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    payloads = [oracle.encode_bytes(data, FIXED_LE)]
    got = decode_via_kernel(payloads, FIXED_LE, block_size=4096,
                            cell=512, seg=512)
    assert got[0] == data


class TestVariableStrict:
    def _roundtrip(self, datas, spec, block_size, **kw):
        payload_list = [
            oracle.encode_bytes(d, spec) for d in datas
        ]
        n = len(payload_list)
        kw.setdefault("group", 128)
        group = kw["group"]
        N = ((n + group - 1) // group) * group
        pb = max((len(p) for p in payload_list), default=1)
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(payload_list):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        words, counts, totals, errs, err_codes, strict, _ = (
            decode_pallas.decode_pass1_variable_tpu(
                payloads, plens, spec, block_size, interpret=True, **kw
            )
        )
        assert strict[:n].all(), "strict streams misdetected"
        assert not np.asarray(errs)[:n].any()
        out, lengths = get_runtime().apply_words(
            np.asarray(words)[:n], block_size
        )
        assert (lengths == np.asarray(totals)[:n]).all()
        return [out[i, : lengths[i]].tobytes() for i in range(n)]

    @pytest.mark.parametrize("spec", [LzwSpec.gif(7), LzwSpec.tiff(),
                                      LzwSpec.gif(2)],
                             ids=["gif7", "tiff", "gif2"])
    def test_random(self, spec):
        if not native_available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(0)
        hi = 1 << spec.code_size
        datas = [
            rng.integers(0, hi, size=int(rng.integers(0, 129))).astype(
                np.uint8
            ).tobytes()
            for _ in range(8)
        ] + [bytes([1] * 100)]
        got = self._roundtrip(datas, spec, 128, cell=64, seg=64)
        for i, d in enumerate(datas):
            assert got[i] == d, f"block {i}"

    @pytest.mark.slow
    def test_dictionary_reset(self):
        if not native_available():
            pytest.skip("native runtime unavailable")
        spec = LzwSpec.variable(8, Endianness.LITTLE)
        rng = np.random.default_rng(5)
        datas = [rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()]
        got = self._roundtrip(datas, spec, 4096, cell=512, seg=512)
        assert got[0] == datas[0]

    def test_wide_block_format(self):
        # block_size > 4096 switches pass 1 to the two-plane table and the
        # 17-bit descriptor payload; small data keeps interpret mode fast.
        if not native_available():
            pytest.skip("native runtime unavailable")
        spec = LzwSpec.gif(7)
        rng = np.random.default_rng(11)
        datas = [rng.integers(0, 128, size=300).astype(np.uint8).tobytes(),
                 (b"waxwax" * 60)[:300]]
        got = self._roundtrip(datas, spec, 8192, cell=64, seg=64)
        for i, d in enumerate(datas):
            assert got[i] == d, f"block {i}"

    @pytest.mark.slow
    def test_wide_block_deep_src(self):
        # Output beyond 4096 bytes: srcs and descriptor payloads past the
        # old 12/13-bit fields (the r2 flagship gap, VERDICT #1).
        if not native_available():
            pytest.skip("native runtime unavailable")
        spec = LzwSpec.gif(7)
        rng = np.random.default_rng(12)
        data = rng.integers(0, 128, size=6000).astype(np.uint8).tobytes()
        got = self._roundtrip([data], spec, 8192, cell=256, seg=128)
        assert got[0] == data

    def test_nonstrict_flagged(self):
        spec = LzwSpec.gif(2)
        cw = [(4, 3), (0, 3), (4, 3), (0, 3), (5, 3)]  # early CLEAR
        enc = oracle.pack_codes(cw, spec.endianness)
        payloads = np.zeros((128, 4), np.uint8)
        payloads[0, : len(enc)] = np.frombuffer(enc, np.uint8)
        plens = np.zeros(128, np.int32)
        plens[0] = len(enc)
        *_, strict, _tabs = decode_pallas.decode_pass1_variable_tpu(
            payloads, plens, spec, 128, interpret=True, group=128,
            cell=64, seg=64,
        )
        assert not strict[0]


class TestDevicePass2:
    def _roundtrip(self, datas, spec, block_size, group=128, cell=64, seg=64):
        payload_list = [oracle.encode_bytes(d, spec) for d in datas]
        n = len(payload_list)
        N = ((n + group - 1) // group) * group
        pb = max((len(p) for p in payload_list), default=1)
        pb = ((pb + 2) // 3) * 3
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(payload_list):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        words, n_codes, totals, errs, _, (pair, codes) = (
            decode_pallas.decode_pass1_fixed_tpu(
                jnp.asarray(payloads), jnp.asarray(plens), block_size,
                little=spec.endianness is Endianness.LITTLE,
                interpret=True, group=group, cell=cell, seg=seg,
            )
        )
        assert not np.asarray(errs)[:n].any()
        out = decode_pallas.decode_pass2_device(
            codes, pair, n_codes, totals, block_size,
            interpret=True, group=group, cell=cell, seg=seg,
        )
        out = np.asarray(out)
        totals = np.asarray(totals)
        return [out[i, : totals[i]].tobytes() for i in range(n)]

    def test_random_all_device(self):
        rng = np.random.default_rng(3)
        datas = [
            rng.integers(0, 256, size=int(rng.integers(0, 129))).astype(
                np.uint8
            ).tobytes()
            for _ in range(8)
        ] + [bytes([9] * 100), (b"zqzqzq" * 22)[:128]]
        got = self._roundtrip(datas, FIXED_LE, 128)
        for i, d in enumerate(datas):
            assert got[i] == d, f"block {i}"

    @pytest.mark.slow
    def test_full_block_all_device(self):
        rng = np.random.default_rng(6)
        datas = [rng.integers(0, 64, size=4096).astype(np.uint8).tobytes()]
        got = self._roundtrip(datas, FIXED_LE, 4096, cell=512, seg=512)
        assert got[0] == datas[0]

    def test_many_groups_super_group_map(self):
        # G = N/group > 2 routes pass 2 through lax.map super-groups of <= 2
        # grid groups (the G>2 shapes miscompute on the chip, same class as
        # the chunked encoder's G>=3 issue).  N=512/group=128 -> G=4, nsg=2;
        # payloads land in different super-groups so a group-indexing slip
        # (wrong block fetched per map step) cannot round-trip.
        rng = np.random.default_rng(13)
        datas = [rng.integers(0, 256, size=64).astype(np.uint8).tobytes()
                 for _ in range(4)]
        payload_list = [oracle.encode_bytes(d, FIXED_LE) for d in datas]
        N, group = 512, 128
        pb = ((max(len(p) for p in payload_list) + 2) // 3) * 3
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(payload_list):
            row = i * group + i  # one payload per grid group, offset lanes
            payloads[row, : len(p)] = np.frombuffer(p, np.uint8)
            plens[row] = len(p)
        words, n_codes, totals, errs, _, (pair, codes) = (
            decode_pallas.decode_pass1_fixed_tpu(
                jnp.asarray(payloads), jnp.asarray(plens), 128,
                little=True, interpret=True, group=group, cell=64, seg=64,
            )
        )
        out = decode_pallas.decode_pass2_device(
            codes, pair, n_codes, totals, 128,
            interpret=True, group=group, cell=64, seg=64,
        )
        out, totals = np.asarray(out), np.asarray(totals)
        for i, d in enumerate(datas):
            row = i * group + i
            assert out[row, : totals[row]].tobytes() == d, f"group {i}"


class TestVariableAllDevice:
    def test_variable_all_device_round_trip(self):
        # Pass 2 with row-matched pair lookups: the per-word epoch start
        # rides the high bits of the codes matrix (static schedule).
        spec = LzwSpec.gif(7)
        rng = np.random.default_rng(8)
        datas = [
            rng.integers(0, 128, size=int(rng.integers(0, 129))).astype(
                np.uint8
            ).tobytes()
            for _ in range(8)
        ] + [(b"zqzq" * 40)[:128], bytes([7] * 100), b""]
        pls = [oracle.encode_bytes(d, spec) for d in datas]
        n = len(pls)
        N = 128
        pb = max(len(p) for p in pls)
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(pls):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        out, totals, errs, _, strict = (
            decode_pallas.decode_variable_all_device(
                payloads, plens, spec, 128, interpret=True, group=128,
                cell=64, seg=64, group2=128, seg2=64,
            )
        )
        assert strict[:n].all()
        assert not np.asarray(errs)[:n].any()
        out = np.asarray(out)
        totals = np.asarray(totals)
        for i, d in enumerate(datas):
            assert out[i, : totals[i]].tobytes() == d, f"block {i}"

    @pytest.mark.slow
    def test_variable_all_device_with_reset(self):
        # A stream long enough to CLEAR-reset: epoch tracking in pass 2
        # must follow each word into its own epoch's pair rows.
        spec = LzwSpec.variable(8, Endianness.LITTLE)
        rng = np.random.default_rng(9)
        data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
        p = oracle.encode_bytes(data, spec)
        N = 128
        pb = len(p)
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        payloads[0, :] = np.frombuffer(p, np.uint8)
        plens[0] = len(p)
        out, totals, errs, _, strict = (
            decode_pallas.decode_variable_all_device(
                payloads, plens, spec, 4096, interpret=True, group=128,
                cell=512, seg=128, group2=128, seg2=128,
            )
        )
        assert strict[0] and not np.asarray(errs)[0]
        assert np.asarray(out)[0, : np.asarray(totals)[0]].tobytes() == data


@pytest.mark.slow
def test_pass2_scan_segment_alignment():
    # When the code-slot count S is NOT a multiple of the pass-2 scan
    # segment, the bounded row-match scans used to slice past the table and
    # the clamped dynamic-slice start shifted rows under the match iota:
    # every word in the final partial segment resolved garbage (r3 live
    # find: S=2944, seg2=256 corrupted exactly the blocks with more than
    # 2816 words).  Distilled: cell=128 rounds S to 384 for ~300 words,
    # (384//256)*256 = 256, so words past 256 sit in the partial segment.
    spec = LzwSpec.gif(7)
    base = (b"the quick brown fox jumps over the lazy dog. " * 40)
    data = bytes(b % 128 for b in base)
    # pick a prefix whose encoding lands in (256, 384] data codes
    lo, hi = len(data) // 4, len(data)
    pick = None
    for cut in range(hi, lo, -16):
        n = len(oracle.encode_codes(data[:cut], spec)) - 2
        if 256 < n <= 384:
            pick = data[:cut]
            break
    assert pick is not None, "corpus never lands in the hazard window"
    p = oracle.encode_bytes(pick, spec)
    N = 128
    payloads = np.zeros((N, len(p)), np.uint8)
    payloads[:] = np.frombuffer(p, np.uint8)
    plens = np.full(N, len(p), np.int64)
    out, totals, errs, _, strict = decode_pallas.decode_variable_all_device(
        payloads, plens, spec, 2048, interpret=True, group=128, cell=128,
        group2=128,  # seg2 stays at the 256 default > cell
    )
    assert strict.all() and not np.asarray(errs).any()
    assert np.asarray(out)[0, : np.asarray(totals)[0]].tobytes() == pick
    assert np.asarray(out)[127, : np.asarray(totals)[127]].tobytes() == pick
