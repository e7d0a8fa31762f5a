"""Lockstep Pallas encoder vs the oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import Endianness, LzwSpec

FIXED_LE = LzwSpec.fixed(Endianness.LITTLE)
FIXED_BE = LzwSpec.fixed(Endianness.BIG)


def run_kernel(blocks_list, spec, block_size, group=128, cell=64, seg=64):
    n = len(blocks_list)
    N = ((n + group - 1) // group) * group
    blocks = np.zeros((N, block_size), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks_list):
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(blocks), jnp.asarray(lens), block_size,
        little=spec.endianness is Endianness.LITTLE,
        interpret=True, group=group, cell=cell, seg=seg,
    )
    payloads = np.asarray(payloads)
    lengths = np.asarray(lengths)
    return [payloads[i, : lengths[i]].tobytes() for i in range(n)]


@pytest.mark.parametrize("spec", [FIXED_LE, FIXED_BE], ids=["le", "be"])
def test_random_blocks_match_oracle(spec):
    rng = np.random.default_rng(0)
    blocks = [
        rng.integers(0, 256, size=rng.integers(0, 128 + 1)).astype(
            np.uint8
        ).tobytes()
        for _ in range(10)
    ]
    got = run_kernel(blocks, spec, block_size=128)
    for i, b in enumerate(blocks):
        assert got[i] == oracle.encode_bytes(b, spec), f"block {i} len {len(b)}"


def test_compressible_blocks_match_oracle():
    rng = np.random.default_rng(1)
    blocks = [
        bytes([1] * 50 + [2] * 30 + [1, 2, 3] * 10),
        (b"abcabcabc" * 14)[:128],
        rng.integers(0, 4, size=128).astype(np.uint8).tobytes(),
        b"\x00" * 128,
    ]
    got = run_kernel(blocks, FIXED_LE, block_size=128)
    for i, b in enumerate(blocks):
        assert got[i] == oracle.encode_bytes(b, FIXED_LE), f"block {i}"


def test_empty_and_single():
    blocks = [b"", b"\x07", b"\x00\x00"]
    got = run_kernel(blocks, FIXED_LE, block_size=64, cell=64, seg=64)
    for i, b in enumerate(blocks):
        assert got[i] == oracle.encode_bytes(b, FIXED_LE)


def test_extreme_key_values():
    # Bytes 255 after high-prefix chains stress the packed key<<12 format.
    data = bytes([255] * 100 + [0] * 28)
    got = run_kernel([data], FIXED_LE, block_size=128)
    assert got[0] == oracle.encode_bytes(data, FIXED_LE)


@pytest.mark.slow
def test_table_freeze():
    # Enough distinct digrams to hit the 4096-entry freeze inside one block.
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    got = run_kernel([data], FIXED_LE, block_size=4096, group=128,
                     cell=512, seg=512)
    assert got[0] == oracle.encode_bytes(data, FIXED_LE)


@pytest.mark.parametrize("spec", [FIXED_LE, FIXED_BE], ids=["le", "be"])
def test_compact_variant_matches_oracle(spec):
    rng = np.random.default_rng(11)
    blocks = [
        rng.integers(0, 256, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(10)
    ] + [bytes([3] * 100), (b"xyxyxy" * 22)[:128]]
    n = len(blocks)
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat), jnp.asarray(lens), 128,
        little=spec.endianness is Endianness.LITTLE,
        interpret=True, group=128, cell=64, seg=64, compact=True,
    )
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i, b in enumerate(blocks):
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(b, spec), f"block {i}"


@pytest.mark.parametrize("spec", [FIXED_LE, FIXED_BE], ids=["le", "be"])
def test_bucket_variant_matches_oracle(spec):
    rng = np.random.default_rng(13)
    blocks = [
        rng.integers(0, 256, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(10)
    ] + [bytes([5] * 100), (b"pqpqpq" * 22)[:128]]
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat), jnp.asarray(lens), 128,
        little=spec.endianness is Endianness.LITTLE,
        interpret=True, group=128, cell=64, seg=64, compact="bucket",
    )
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i, b in enumerate(blocks):
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(b, spec), f"block {i}"


@pytest.mark.slow
def test_bucket_variant_full_block():
    rng = np.random.default_rng(14)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    mat = np.zeros((2048, 4096), np.uint8)
    mat[0] = np.frombuffer(data, np.uint8)
    lens = np.zeros(2048, np.int32)
    lens[0] = 4096
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat[:128]), jnp.asarray(lens[:128]), 4096,
        interpret=True, group=128, cell=512, seg=512, compact="bucket",
    )
    got = np.asarray(payloads)[0, : np.asarray(lengths)[0]].tobytes()
    assert got == oracle.encode_bytes(data, FIXED_LE)


def test_stage_variant_matches_oracle():
    spec = FIXED_LE
    rng = np.random.default_rng(7)
    blocks = [
        rng.integers(0, 256, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(8)
    ] + [bytes([1] * 60 + [2] * 40 + [1, 2, 3] * 9), b""]
    n = len(blocks)
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat), jnp.asarray(lens), 128,
        interpret=True, group=128, cell=64, seg=64, compact="stage",
    )
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i, b in enumerate(blocks):
        expect = oracle.encode_bytes(b, spec)
        assert payloads[i, : lengths[i]].tobytes() == expect, f"block {i}"


@pytest.mark.parametrize("sseg", [32, 64])
def test_stage_variant_sseg_finer_than_seg(sseg):
    # The stage sweep runs in sseg-row segments bounded by the step index
    # (V8, EVOLUTION.md); sseg strictly finer than the dense seg must not
    # change the wire bytes.
    spec = FIXED_LE
    rng = np.random.default_rng(11)
    blocks = [
        rng.integers(0, 256, size=int(rng.integers(1, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(6)
    ] + [bytes([5] * 50 + [6] * 30 + [5, 6, 7] * 16)]
    n = len(blocks)
    mat = np.zeros((128, 128), np.uint8)
    lens = np.zeros(128, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat), jnp.asarray(lens), 128,
        interpret=True, group=128, cell=128, seg=128, compact="stage",
        sseg=sseg,
    )
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i, b in enumerate(blocks):
        expect = oracle.encode_bytes(b, spec)
        assert payloads[i, : lengths[i]].tobytes() == expect, f"block {i}"


@pytest.mark.slow
def test_stage_variant_big_block():
    # 16 KiB block: the dictionary freezes mid-block; dense table stays
    # bounded. Mixed content so the dictionary fills, then frozen lookups.
    spec = FIXED_LE
    rng = np.random.default_rng(9)
    data = (rng.integers(0, 256, size=9000).astype(np.uint8).tobytes()
            + (b"steady state pattern " * 400)[:7384])
    B = 16384
    mat = np.zeros((128, B), np.uint8)
    mat[0, : len(data)] = np.frombuffer(data, np.uint8)
    lens = np.zeros(128, np.int32)
    lens[0] = len(data)
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat), jnp.asarray(lens), B,
        interpret=True, group=128, cell=512, seg=128, compact="stage",
    )
    expect = oracle.encode_bytes(data, spec)
    assert np.asarray(payloads)[0, : np.asarray(lengths)[0]].tobytes() \
        == expect


@pytest.mark.slow
def test_stage_variant_recompaction():
    # Two lanes miss heavily in ALTERNATING cells, so the shared dense
    # cursor (sum of per-cell max counts) outruns the 4096+cell table and
    # forces the in-kernel full recompaction path.
    spec = FIXED_LE
    rng = np.random.default_rng(21)
    B, cell = 16384, 512
    lanes = np.zeros((2, B), np.uint8)
    for c in range(B // cell):
        seg = slice(c * cell, (c + 1) * cell)
        noise = rng.integers(0, 256, size=cell).astype(np.uint8)
        const = np.full(cell, 7, np.uint8)
        lanes[0, seg] = noise if c % 2 == 0 else const
        lanes[1, seg] = const if c % 2 == 0 else noise
    mat = np.zeros((128, B), np.uint8)
    mat[:2] = lanes
    lens = np.zeros(128, np.int32)
    lens[:2] = B
    payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
        jnp.asarray(mat), jnp.asarray(lens), B,
        interpret=True, group=128, cell=cell, seg=128, compact="stage",
    )
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i in range(2):
        expect = oracle.encode_bytes(lanes[i].tobytes(), spec)
        assert payloads[i, : lengths[i]].tobytes() == expect, f"lane {i}"


@pytest.mark.slow
def test_chunked_driver_matches_oracle():
    # Block sizes past BLOCK_SIZE run one launch per chunk with the
    # dictionary carried and XLA-recompacted between launches.
    spec = FIXED_LE
    rng = np.random.default_rng(23)
    B = 2048
    blocks = [
        rng.integers(0, 256, size=900).astype(np.uint8).tobytes()
        + (b"steady pattern " * 200)[:1148],
        rng.integers(0, 8, size=B).astype(np.uint8).tobytes(),
        b"",
        b"\x07\x07\x07",
    ]
    mat = np.zeros((128, B), np.uint8)
    lens = np.zeros(128, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    from lzw_tpu.kernels.encode_pallas import _run_encode_kernel_chunked

    dense, counts, errs, _ = _run_encode_kernel_chunked(
        jnp.asarray(mat), jnp.asarray(lens), B, None, True, 128, 128, 128,
        512, 32,  # sseg finer than the dense seg (V8)
    )
    payloads, lengths = encode_pallas._pack12(dense, counts, True)
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i, b in enumerate(blocks):
        expect = oracle.encode_bytes(b, spec)
        assert payloads[i, : lengths[i]].tobytes() == expect, f"block {i}"


@pytest.mark.slow
def test_chunked_driver_multi_group():
    # Two kernel-grid groups whose dictionary cursors diverge sharply
    # (random bytes insert ~every step; a constant run barely inserts): the
    # per-group carried cursor must not leak across groups (regression: the
    # chunked kernel once read group 0's cursor for every group).
    spec = FIXED_LE
    rng = np.random.default_rng(7)
    B = 1024
    mat = np.zeros((512, B), np.uint8)
    mat[:128] = rng.integers(0, 256, size=(128, B)).astype(np.uint8)
    mat[128:256] = 9  # second group: single-symbol runs, tiny dictionaries
    mat[256:384] = rng.integers(0, 4, size=(128, B)).astype(np.uint8)
    mat[384:] = np.arange(B, dtype=np.uint8)[None]
    lens = np.full(512, B, np.int32)
    from lzw_tpu.kernels.encode_pallas import _run_encode_kernel_chunked

    # G=4 also exercises the lax.map super-group path (hardware runs the
    # scan+pallas pipeline per <=2 grid groups; see _run_encode_kernel_chunked)
    dense, counts, errs, _ = _run_encode_kernel_chunked(
        jnp.asarray(mat), jnp.asarray(lens), B, None, True, 128, 128, 128,
        512, 32,
    )
    payloads, lengths = encode_pallas._pack12(dense, counts, True)
    payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i in (0, 64, 127, 128, 200, 255, 300, 400, 511):
        expect = oracle.encode_bytes(mat[i].tobytes(), spec)
        assert payloads[i, : lengths[i]].tobytes() == expect, f"block {i}"
