"""Epoch-split decode helpers (r4): static epoch bounds, per-epoch byte
totals from pass-1 descriptors, and the shifted-sum reassembly."""

import numpy as np
import jax.numpy as jnp

from lzw_tpu.kernels import decode_pallas as dp, schedule as sched_mod
from lzw_tpu.spec import LzwSpec


def test_epoch_bounds_match_schedule_clears():
    spec = LzwSpec.gif(7)
    S = 28672
    bounds = dp.epoch_bounds(spec, S)
    sched = sched_mod.emission_schedule(spec, S)
    # contiguous cover of [0, S)
    assert bounds[0][0] == 0 and bounds[-1][1] == S
    for (a, b), (a2, _b2) in zip(bounds, bounds[1:]):
        assert b == a2
    # every interior boundary sits right after a schedule CLEAR
    for a, _b in bounds[1:]:
        assert sched.clear_after[a - 1]
    # no CLEAR inside an epoch
    for a, b in bounds:
        assert not sched.clear_after[a : b - 1].any()


def test_epoch_totals_sums_word_lengths_per_slice():
    spec = LzwSpec.gif(7)
    S = 8192
    bounds = dp.epoch_bounds(spec, S)
    rng = np.random.default_rng(0)
    N = 4
    lens = rng.integers(1, 30, (N, S)).astype(np.int32)
    kinds = rng.choice(
        [dp.KIND_LIT, dp.KIND_COPY, dp.KIND_HOLE], (N, S), p=[.3, .6, .1]
    ).astype(np.int32)
    words = (kinds << 29) | (lens << 17)
    te = np.asarray(dp._epoch_totals(jnp.asarray(words), spec, S))
    assert te.shape == (N, len(bounds))
    eff = np.where(kinds == dp.KIND_HOLE, 0, lens)
    for e, (a, b) in enumerate(bounds):
        assert (te[:, e] == eff[:, a:b].sum(axis=1)).all()


def test_assemble_epochs_places_disjoint_parts():
    rng = np.random.default_rng(1)
    N, Bp = 8, 2048
    p1 = rng.integers(1, 256, (N, 512)).astype(np.uint8)
    p2 = rng.integers(1, 256, (N, 1024)).astype(np.uint8)
    t1 = rng.integers(1, 512, N).astype(np.int32)
    t2 = rng.integers(1, 1024, N).astype(np.int32)
    for arr, t in ((p1, t1), (p2, t2)):
        for i in range(N):
            arr[i, t[i]:] = 0  # zero past each unit's total (the contract)
    cum1 = np.zeros(N, np.int32)
    cum2 = t1.astype(np.int32)
    out = np.asarray(dp._assemble_epochs(
        (jnp.asarray(p1), jnp.asarray(p2)),
        (jnp.asarray(cum1), jnp.asarray(cum2)),
        Bp, 1500, 2,
    ))
    for i in range(N):
        exp = np.zeros(1500, np.uint8)
        exp[: t1[i]] = p1[i, : t1[i]]
        exp[t1[i] : t1[i] + t2[i]] = p2[i, : t2[i]]
        assert (out[i] == exp).all(), i


class TestStride2:
    """Stride-2 pass 2 (r5): pair² descriptors + packed double-head refill,
    two bytes per round."""

    def _fixed_roundtrip(self, datas, block_size, cell=64, seg=64):
        from lzw_tpu.ops import reference as oracle
        from lzw_tpu.spec import Endianness

        spec = LzwSpec.fixed(Endianness.LITTLE)
        pls = [oracle.encode_bytes(d, spec) for d in datas]
        N, group = 128, 128
        pb = ((max(len(p) for p in pls) + 2) // 3) * 3
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(pls):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        w, nc, tot, errs, _, (pair, codes) = dp.decode_pass1_fixed_tpu(
            jnp.asarray(payloads), jnp.asarray(plens), block_size,
            little=True, interpret=True, group=group, cell=cell, seg=seg,
            pair2=True,
        )
        assert not np.asarray(errs)[: len(datas)].any()
        out = dp.decode_pass2_stride2(
            codes, pair, nc, tot, block_size, interpret=True, group=group,
            cell=cell, seg=seg, first_free=256,
        )
        out, tot = np.asarray(out), np.asarray(tot)
        return [out[i, : tot[i]].tobytes() for i in range(len(datas))]

    def test_fixed_stride2_mixed(self):
        rng = np.random.default_rng(21)
        datas = [
            rng.integers(0, 256, size=int(n)).astype(np.uint8).tobytes()
            for n in rng.integers(0, 129, 6)
        ] + [
            b"a" * 128,                    # KwKwK ladder, odd/even words
            (b"ab" * 64),                  # 2-cycles
            bytes([0]),                    # single byte (odd total)
            b"",                           # empty
            (b"xyz" * 43)[:128],           # 3-cycle tail
        ]
        got = self._fixed_roundtrip(datas, 128)
        for i, d in enumerate(datas):
            assert got[i] == d, f"block {i}"

    def test_variable_stride2_vs_stride1(self):
        # Equivalence of the two pass-2 engines over the same pass 1.
        from lzw_tpu.ops import reference as oracle

        spec = LzwSpec.gif(7)
        rng = np.random.default_rng(22)
        datas = [
            rng.integers(0, 128, size=int(n)).astype(np.uint8).tobytes()
            for n in rng.integers(1, 500, 4)
        ] + [b"q" * 501, (b"no" * 250)[:499]]
        pls = [oracle.encode_bytes(d, spec) for d in datas]
        N = 128
        pb = max(len(p) for p in pls)
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(pls):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        counts, strict, sched_arr, S = dp.prepare_variable_decode(
            payloads, plens, spec
        )
        assert strict[: len(datas)].all()
        outs = {}
        for stride2 in (False, True):
            out, tot, errs, _, _ok = dp.decode_variable_epochs_run(
                payloads, counts, sched_arr, spec, S, 512,
                interpret=True, group=128, cell=64, seg=64, group2=128,
                seg2=64, stride2=stride2,
            )
            assert not np.asarray(errs)[: len(datas)].any()
            outs[stride2] = (np.asarray(out), np.asarray(tot))
        assert (outs[True][1][: len(datas)]
                == outs[False][1][: len(datas)]).all()
        for i, d in enumerate(datas):
            assert outs[True][0][i, : outs[True][1][i]].tobytes() == d
            assert (outs[True][0][i] == outs[False][0][i]).all()

    def test_variable_pooled_matches_oracle(self):
        # The sorted-pool driver (bench/container path): mixed block
        # sizes so units spread across size-sorted batches, plus the
        # windowed placement assembly's edge cases (empty trailing
        # epochs, partial last epochs, zero-te units parked mid-pool).
        from lzw_tpu.ops import reference as oracle

        spec = LzwSpec.gif(7)
        rng = np.random.default_rng(24)
        datas = [
            rng.integers(0, 128, size=int(n)).astype(np.uint8).tobytes()
            for n in rng.integers(1, 2000, 5)
        ] + [b"k" * 2048, (b"pq" * 1024)[:2047], bytes([1])]
        pls = [oracle.encode_bytes(d, spec) for d in datas]
        N = 128
        pb = max(len(p) for p in pls)
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(pls):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        counts, strict, sched_arr, S = dp.prepare_variable_decode(
            payloads, plens, spec
        )
        assert strict[: len(datas)].all()
        out, tot, errs, _, _ok = dp.decode_variable_epochs_pooled(
            payloads, counts, sched_arr, spec, S, 2048,
            interpret=True, group=128, cell=64, seg=64, group2=128,
            seg2=64, batch=128,
        )
        out, tot = np.asarray(out), np.asarray(tot)
        assert not np.asarray(errs)[: len(datas)].any()
        for i, d in enumerate(datas):
            assert tot[i] == len(d), f"block {i}"
            assert out[i, : tot[i]].tobytes() == d, f"block {i}"
        assert (out[len(datas):] == 0).all()

    def test_variable_pooled_small_batch_defaults(self):
        # N=128 with the DEFAULT pooled knobs: U = E*N can be smaller
        # than the default batch size, which must clamp to U instead of
        # producing zero batches (an all-zero "decode").
        from lzw_tpu.ops import reference as oracle

        spec = LzwSpec.gif(7)
        rng = np.random.default_rng(25)
        datas = [
            rng.integers(0, 128, size=int(n)).astype(np.uint8).tobytes()
            for n in rng.integers(1, 400, 4)
        ]
        pls = [oracle.encode_bytes(d, spec) for d in datas]
        N = 128
        pb = max(len(p) for p in pls)
        payloads = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(pls):
            payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        out, tot, errs, _, strict = dp.decode_variable_all_device(
            payloads, plens, spec, 512, interpret=True,
        )
        assert strict[: len(datas)].all()
        assert not np.asarray(errs)[: len(datas)].any()
        out, tot = np.asarray(out), np.asarray(tot)
        for i, d in enumerate(datas):
            assert tot[i] == len(d) and out[i, : tot[i]].tobytes() == d, i

    def test_variable_stride2_multi_epoch(self):
        # A stream crossing a CLEAR reset: per-epoch units, stride-2 walk.
        from lzw_tpu.ops import reference as oracle
        from lzw_tpu.spec import Endianness

        spec = LzwSpec.variable(8, Endianness.BIG)
        rng = np.random.default_rng(23)
        data = rng.integers(0, 256, size=6000).astype(np.uint8).tobytes()
        p = oracle.encode_bytes(data, spec)
        N = 128
        payloads = np.zeros((N, len(p)), np.uint8)
        plens = np.zeros(N, np.int32)
        payloads[0] = np.frombuffer(p, np.uint8)
        plens[0] = len(p)
        out, tot, errs, _, strict = dp.decode_variable_all_device(
            payloads, plens, spec, 8192, interpret=True, group=128,
            cell=512, seg=128, group2=128, seg2=128,
        )
        assert strict[0] and not np.asarray(errs)[0]
        assert np.asarray(out)[0, : np.asarray(tot)[0]].tobytes() == data
