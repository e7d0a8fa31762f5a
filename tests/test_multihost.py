"""Multihost helpers in the single-process configuration (CI-runnable)."""

import numpy as np

import jax

from lzw_tpu.parallel.multihost import MultiHostBlockCodec, _process_slice
from lzw_tpu.spec import Endianness, LzwSpec


def test_process_slice_balance():
    for n_blocks in (0, 1, 7, 64, 65):
        for n_proc in (1, 2, 4):
            spans = [_process_slice(n_blocks, p, n_proc) for p in range(n_proc)]
            assert spans[0][0] == 0
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c
            assert spans[-1][1] == n_blocks


def test_single_process_round_trip():
    assert jax.process_count() == 1
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=20000).astype(np.uint8).tobytes()
    codec = MultiHostBlockCodec(LzwSpec.fixed(Endianness.LITTLE),
                                block_size=4096)
    container = codec.encode(data)
    assert codec.decode(container) == data
