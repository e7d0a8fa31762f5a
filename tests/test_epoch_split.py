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
