"""Variable-flavor Pallas encoder + static-schedule packing vs the oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas, schedule
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import CodeSizeStrategy, Endianness, LzwSpec

SPECS = [
    LzwSpec.gif(2), LzwSpec.gif(7), LzwSpec.tiff(),
    LzwSpec.variable(4, Endianness.BIG, CodeSizeStrategy.TIFF),
]
IDS = ["gif2", "gif7", "tiff", "var4"]


def encode_via_kernel(blocks_list, spec, block_size, group=128, cell=64,
                      seg=64, fix_eoi=True):
    n = len(blocks_list)
    N = ((n + group - 1) // group) * group
    blocks = np.zeros((N, block_size), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks_list):
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dense, counts, errs, err_codes = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(blocks), jnp.asarray(lens), spec, block_size,
        interpret=True, group=group, cell=cell, seg=seg,
    )
    dense = np.asarray(dense)
    counts = np.asarray(counts)
    errs = np.asarray(errs)[:n]
    payloads, lengths = schedule.pack_variable(
        dense[:n], counts[:n], spec, fix_eoi=fix_eoi
    )
    return ([payloads[i, : lengths[i]].tobytes() for i in range(n)],
            errs, np.asarray(err_codes)[:n])


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_random_blocks_match_oracle(spec):
    rng = np.random.default_rng(0)
    hi = 1 << spec.code_size
    blocks = [
        rng.integers(0, hi, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(10)
    ]
    got, errs, _ = encode_via_kernel(blocks, spec, 128, fix_eoi=False)
    assert not errs.any()
    for i, b in enumerate(blocks):
        assert got[i] == oracle.encode_bytes(b, spec), f"block {i} ({len(b)}B)"


def test_compressible_blocks():
    spec = LzwSpec.gif(7)
    blocks = [
        (b"the quick brown fox " * 10)[:128],
        bytes([1] * 128),
        bytes(range(128)),
    ]
    got, errs, _ = encode_via_kernel(blocks, spec, 128, fix_eoi=False)
    assert not errs.any()
    for i, b in enumerate(blocks):
        assert got[i] == oracle.encode_bytes(b, spec), f"block {i}"


def test_unexpected_code_flagged():
    spec = LzwSpec.gif(2)
    blocks = [bytes([0, 1, 8, 3])]
    _, errs, err_codes = encode_via_kernel(blocks, spec, 128)
    assert errs[0] == 1
    assert err_codes[0] == 8


def test_first_byte_not_checked():
    spec = LzwSpec.gif(2)
    _, errs, _ = encode_via_kernel([bytes([200])], spec, 128, fix_eoi=False)
    assert not errs.any()


def test_fix_eoi_round_trips():
    # Quirky stream: EOI fix keeps the stream decodable by our own decoder.
    spec = LzwSpec.gif(2)
    rng = np.random.default_rng(0)
    for _ in range(300):
        data = rng.integers(0, 4, size=int(rng.integers(4, 40))).astype(
            np.uint8
        ).tobytes()
        if oracle.eoi_width_quirk(oracle.encode_codes(data, spec), spec):
            got, errs, _ = encode_via_kernel([data], spec, 64, cell=64,
                                             seg=64, fix_eoi=True)
            assert not errs.any()
            assert oracle.decode_bytes(got[0], spec) == data
            return
    pytest.fail("no quirky stream found")


@pytest.mark.slow
def test_dictionary_reset_in_kernel():
    # 4096-byte random block at cs=8 overflows the table -> epoch rewind.
    spec = LzwSpec.variable(8, Endianness.LITTLE)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    got, errs, _ = encode_via_kernel([data], spec, 4096, cell=512, seg=512,
                                     fix_eoi=False)
    assert not errs.any()
    assert got[0] == oracle.encode_bytes(data, spec)


def test_compact_variant_matches_oracle():
    spec = LzwSpec.gif(7)
    rng = np.random.default_rng(2)
    blocks = [
        rng.integers(0, 128, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(8)
    ] + [(b"compressible text " * 8)[:128]]
    n = len(blocks)
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 128,
        interpret=True, group=128, cell=64, seg=64, compact=True,
    )
    assert not np.asarray(errs)[:n].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:n], np.asarray(counts)[:n], spec, fix_eoi=False
    )
    for i, b in enumerate(blocks):
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(b, spec), f"block {i}"


@pytest.mark.slow
def test_compact_variant_dictionary_reset():
    spec = LzwSpec.variable(8, Endianness.LITTLE)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    mat = np.zeros((128, 4096), np.uint8)
    mat[0] = np.frombuffer(data, np.uint8)
    lens = np.zeros(128, np.int32)
    lens[0] = 4096
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 4096,
        interpret=True, group=128, cell=512, seg=512, compact=True,
    )
    assert not np.asarray(errs)[0].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:1], np.asarray(counts)[:1], spec, fix_eoi=False
    )
    assert payloads[0, : lengths[0]].tobytes() == oracle.encode_bytes(
        data, spec
    )


def test_bucket_variant_matches_oracle():
    spec = LzwSpec.gif(7)
    rng = np.random.default_rng(4)
    blocks = [
        rng.integers(0, 128, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(8)
    ] + [(b"compressible text " * 8)[:128], bytes([3] * 128)]
    n = len(blocks)
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 128,
        interpret=True, group=128, cell=64, seg=64, compact="bucket",
    )
    assert not np.asarray(errs)[:n].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:n], np.asarray(counts)[:n], spec, fix_eoi=False
    )
    for i, b in enumerate(blocks):
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(b, spec), f"block {i}"


def test_bucket_variant_error_contract():
    # byte > 2^code_size under a variable spec -> UnexpectedCode flag.
    spec = LzwSpec.gif(2)
    mat = np.zeros((128, 128), np.uint8)
    mat[0, :4] = [0, 1, 7, 2]  # 7 > max_code 3
    lens = np.zeros(128, np.int32)
    lens[0] = 4
    _, _, errs, err_codes = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 128,
        interpret=True, group=128, cell=64, seg=64, compact="bucket",
    )
    assert int(np.asarray(errs)[0]) == 1
    assert int(np.asarray(err_codes)[0]) == 7


@pytest.mark.slow
def test_bucket_variant_dictionary_reset():
    spec = LzwSpec.variable(8, Endianness.LITTLE)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    mat = np.zeros((128, 4096), np.uint8)
    mat[0] = np.frombuffer(data, np.uint8)
    # a second lane with compressible data (no reset) sharing the group
    mat[1] = np.frombuffer((b"ab" * 2048), np.uint8)
    lens = np.zeros(128, np.int32)
    lens[0] = 4096
    lens[1] = 4096
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 4096,
        interpret=True, group=128, cell=512, seg=512, compact="bucket",
    )
    assert not np.asarray(errs)[:2].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:2], np.asarray(counts)[:2], spec, fix_eoi=False
    )
    for i in range(2):
        d = mat[i].tobytes()
        assert payloads[i, : lengths[i]].tobytes() == oracle.encode_bytes(
            d, spec
        ), f"lane {i}"


def test_stage_variant_matches_oracle():
    spec = LzwSpec.gif(7)
    rng = np.random.default_rng(6)
    blocks = [
        rng.integers(0, 128, size=int(rng.integers(0, 129))).astype(
            np.uint8
        ).tobytes()
        for _ in range(8)
    ] + [(b"compressible text " * 8)[:128], bytes([5] * 128), b""]
    n = len(blocks)
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 128,
        interpret=True, group=128, cell=64, seg=64, compact="stage",
    )
    assert not np.asarray(errs)[:n].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:n], np.asarray(counts)[:n], spec, fix_eoi=False
    )
    for i, b in enumerate(blocks):
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(b, spec), f"block {i}"


@pytest.mark.slow
def test_stage_variant_dictionary_reset():
    spec = LzwSpec.variable(8, Endianness.LITTLE)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    mat = np.zeros((128, 4096), np.uint8)
    mat[0] = np.frombuffer(data, np.uint8)
    mat[1] = np.frombuffer(b"cd" * 2048, np.uint8)
    lens = np.zeros(128, np.int32)
    lens[:2] = 4096
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, 4096,
        interpret=True, group=128, cell=512, seg=512, compact="stage",
    )
    assert not np.asarray(errs)[:2].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:2], np.asarray(counts)[:2], spec, fix_eoi=False
    )
    for i in range(2):
        d = mat[i].tobytes()
        assert payloads[i, : lengths[i]].tobytes() == oracle.encode_bytes(
            d, spec
        ), f"lane {i}"


def test_chunked_variable_matches_oracle():
    # The chunked driver (block sizes past BLOCK_SIZE) under a variable spec.
    spec = LzwSpec.gif(7)
    rng = np.random.default_rng(31)
    B = 1024
    blocks = [
        (b"the quick brown fox jumps " * 64)[:B],
        rng.integers(0, 128, size=B).astype(np.uint8).tobytes(),
        b"",
    ]
    mat = np.zeros((128, B), np.uint8)
    lens = np.zeros(128, np.int32)
    for i, b in enumerate(blocks):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, B,
        interpret=True, group=128, cell=128, seg=128, chunk=512,
    )
    assert not np.asarray(errs)[:3].any()
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:3], np.asarray(counts)[:3], spec, fix_eoi=True
    )
    for i, b in enumerate(blocks):
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(b, spec), f"block {i}"


@pytest.mark.slow
def test_chunked_variable_dictionary_reset():
    # Random bytes at cs=8 overflow the 4096-entry table inside chunk 3: the
    # CLEAR reset (column wipe) must survive the between-chunk recompaction
    # and the carried cursor/state.
    spec = LzwSpec.variable(8, Endianness.LITTLE)
    rng = np.random.default_rng(33)
    B = 4224
    mat = np.zeros((128, B), np.uint8)
    mat[0] = rng.integers(0, 256, size=B)
    mat[1] = np.frombuffer((b"ab" * (B // 2)), np.uint8)
    lens = np.zeros(128, np.int32)
    lens[:2] = B
    dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
        jnp.asarray(mat), jnp.asarray(lens), spec, B,
        interpret=True, group=128, cell=128, seg=128, chunk=1152,
    )
    assert not np.asarray(errs)[:2].any()
    n0 = int(np.asarray(counts)[0])
    sched = schedule.emission_schedule(spec, n0 + 1)
    assert sched.clear_after[:n0].any(), "test data never tripped a reset"
    payloads, lengths = schedule.pack_variable(
        np.asarray(dense)[:2], np.asarray(counts)[:2], spec, fix_eoi=True
    )
    for i in range(2):
        d = mat[i].tobytes()
        got = payloads[i, : lengths[i]].tobytes()
        assert got == oracle.encode_bytes(d, spec), f"lane {i}"


def test_chunked_wrapper_slices_into_separate_executions(monkeypatch):
    """Batches past SUPER_GROUP_MAX grid groups must be sliced OUTSIDE the
    jit into separate executions — lax.map / in-program splits do not
    contain the G>=3 chunked-scan miscompile (r5 arbiter find)."""
    import numpy as np

    from lzw_tpu.kernels import encode_pallas as ep
    from lzw_tpu.ops import reference as oracle
    from lzw_tpu.kernels import schedule as sc

    spec = LzwSpec.gif(7)
    B = 8192  # > BLOCK_SIZE: chunked driver
    group = 128
    N = 512  # G = 4 > SUPER_GROUP_MAX -> two slices of 256
    rng = np.random.default_rng(17)
    blocks = rng.integers(0, 128, (N, B)).astype(np.uint8)
    lens = np.full(N, B, np.int32)

    calls = []
    real = ep._encode_blocks_variable_jit

    def spy(bl, ln, *a, **k):
        calls.append(bl.shape[0])
        return real(bl, ln, *a, **k)

    monkeypatch.setattr(ep, "_encode_blocks_variable_jit", spy)
    dense, counts, errs, _ = ep.encode_blocks_variable_codes_tpu(
        blocks, lens, spec, B, interpret=True, group=group
    )
    assert calls == [256, 256], calls
    assert not np.asarray(errs).any()
    pay, nb = sc.pack_variable(
        np.asarray(dense), np.asarray(counts), spec
    )
    for i in (0, 255, 256, 511):  # rows straddling the slice boundary
        want = oracle.encode_bytes(blocks[i].tobytes(), spec)
        assert bytes(pay[i, : nb[i]]) == want, f"row {i}"
