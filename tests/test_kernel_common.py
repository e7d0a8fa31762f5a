"""Tests for the scatter-free compaction/shift primitives."""

import numpy as np

import jax.numpy as jnp

from lzw_tpu.kernels.common import compact_columns_jax, shift_columns_jax


def test_compact_columns_random():
    rng = np.random.default_rng(0)
    S, L = 256, 16
    values = rng.integers(1, 1000, size=(S, L)).astype(np.int32)
    valid = rng.random((S, L)) < 0.4
    out, counts = compact_columns_jax(
        jnp.asarray(values), jnp.asarray(valid), fill=-1
    )
    out = np.asarray(out)
    counts = np.asarray(counts)
    for l in range(L):
        expect = values[valid[:, l], l]
        assert counts[l] == len(expect)
        assert (out[: len(expect), l] == expect).all()
        assert (out[len(expect):, l] == -1).all()


def test_compact_columns_edge_cases():
    S, L = 64, 4
    values = np.arange(S * L, dtype=np.int32).reshape(S, L)
    for valid in (np.zeros((S, L), bool), np.ones((S, L), bool)):
        out, counts = compact_columns_jax(
            jnp.asarray(values), jnp.asarray(valid), fill=0
        )
        out = np.asarray(out)
        if valid.all():
            assert (out == values).all()
            assert (np.asarray(counts) == S).all()
        else:
            assert (out == 0).all()
            assert (np.asarray(counts) == 0).all()


def test_shift_columns():
    rng = np.random.default_rng(1)
    S, L = 128, 8
    values = rng.integers(1, 100, size=(S, L)).astype(np.int32)
    shifts = rng.integers(0, S, size=L).astype(np.int32)
    out = np.asarray(
        shift_columns_jax(jnp.asarray(values), jnp.asarray(shifts), fill=-7)
    )
    for l in range(L):
        s = shifts[l]
        assert (out[:s, l] == -7).all()
        assert (out[s:, l] == values[: S - s, l]).all()


def test_shift_zero():
    values = np.arange(32, dtype=np.int32).reshape(32, 1)
    out = np.asarray(
        shift_columns_jax(jnp.asarray(values), jnp.zeros(1, jnp.int32))
    )
    assert (out[:, 0] == values[:, 0]).all()
