"""Block-parallel container tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from lzw_tpu.ops import reference as oracle
from lzw_tpu.parallel import BlockParallelCodec, framing
from lzw_tpu.spec import Endianness, LzwSpec, UnexpectedCodeError


GIF7 = LzwSpec.gif(7)
FIXED_LE = LzwSpec.fixed(Endianness.LITTLE)
TIFF = LzwSpec.tiff()


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("spec", [GIF7, FIXED_LE, TIFF],
                         ids=["gif7", "fixed_le", "tiff"])
def test_round_trip_multi_block(spec, tokyo_pixels):
    data = tokyo_pixels[:40000]
    codec = BlockParallelCodec(spec, block_size=4096)
    container = codec.encode(data)
    assert codec.decode(container) == data


def test_incompressible_round_trip_fixed():
    # Random bytes barely compress, so payload lengths approach the packed
    # bound — the shape class whose worst-case-sized decode tables OOM'd
    # the chip's VMEM before the actual-length sizing + adaptive group
    # fallback (r3); the container must still round-trip.
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=4096 * 3 + 17).astype(np.uint8).tobytes()
    codec = BlockParallelCodec(FIXED_LE, block_size=4096)
    assert codec.decode(codec.encode(data)) == data


def test_blocks_are_reference_streams(lorem_ipsum):
    # Every payload must decode standalone with the plain reference oracle.
    codec = BlockParallelCodec(GIF7, block_size=4096)
    header, payloads = framing.parse_frame(codec.encode(lorem_ipsum))
    assert header.n_blocks == 6
    out = b"".join(
        oracle.decode_bytes(bytes(p), GIF7) for p in payloads
    )
    assert out == lorem_ipsum


def test_single_block_equals_reference_stream(lorem_ipsum, lorem_ipsum_encoded):
    # With one block (no EOI quirk on this stream) the payload is the exact
    # reference single-stream bytes.
    codec = BlockParallelCodec(GIF7, block_size=1 << 15)
    _, payloads = framing.parse_frame(codec.encode(lorem_ipsum))
    assert len(payloads) == 1
    assert bytes(payloads[0]) == lorem_ipsum_encoded


def test_size_budget(tokyo_pixels):
    # BASELINE budget: block-mode compressed size stays within the reference
    # single-stream output plus framing (measured: +0.49% at 64 KiB blocks on
    # the image corpus; dictionary restarts at block boundaries cost little
    # because the reference itself resets every ~4k codes).
    single = len(oracle.encode_bytes(tokyo_pixels, GIF7))
    codec = BlockParallelCodec(GIF7, block_size=1 << 16)
    container = codec.encode(tokyo_pixels)
    header, _ = framing.parse_frame(container)
    framing_bytes = framing.HEADER_SIZE + 4 * header.n_blocks
    assert len(container) <= int(single * 1.01) + framing_bytes


def test_empty_input():
    codec = BlockParallelCodec(FIXED_LE, block_size=1024)
    container = codec.encode(b"")
    assert codec.decode(container) == b""


def test_non_multiple_sizes():
    codec = BlockParallelCodec(FIXED_LE, block_size=1000)
    rng = np.random.default_rng(4)
    for n in (1, 999, 1000, 1001, 8001):
        data = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
        assert codec.decode(codec.encode(data)) == data


def test_eoi_quirk_blocks_still_round_trip():
    # Find a block whose final code lands on a width-bump threshold; the
    # container's EOI width fix must keep it decodable.
    spec = LzwSpec.gif(2)
    rng = np.random.default_rng(0)
    hit = None
    for trial in range(200):
        data = rng.integers(0, 4, size=int(rng.integers(4, 40))).astype(
            np.uint8
        ).tobytes()
        if oracle.eoi_width_quirk(oracle.encode_codes(data, spec), spec):
            hit = data
            break
    assert hit is not None, "no quirky stream found"
    codec = BlockParallelCodec(spec, block_size=64)
    assert codec.decode(codec.encode(hit)) == hit


def test_encode_error_propagates():
    codec = BlockParallelCodec(LzwSpec.gif(2), block_size=16)
    with pytest.raises(UnexpectedCodeError) as exc:
        codec.encode(bytes([0, 1, 2, 3, 200, 1]))
    assert exc.value.code == 200


def test_corrupt_container_rejected(lorem_ipsum):
    codec = BlockParallelCodec(GIF7, block_size=4096)
    container = bytearray(codec.encode(lorem_ipsum))
    container[0:4] = b"NOPE"
    with pytest.raises(framing.FramingError):
        codec.decode(bytes(container))


def test_truncated_container_rejected(lorem_ipsum):
    codec = BlockParallelCodec(GIF7, block_size=4096)
    container = codec.encode(lorem_ipsum)
    with pytest.raises(framing.FramingError):
        codec.decode(container[: len(container) // 2])


def test_decode_range_random_access(lorem_ipsum):
    # Resume/fault-isolation story: any block range decodes independently.
    codec = BlockParallelCodec(GIF7, block_size=4096)
    container = codec.encode(lorem_ipsum)
    header, _ = framing.parse_frame(container)
    for lo, hi in [(0, 1), (2, 5), (header.n_blocks - 1, header.n_blocks),
                   (0, header.n_blocks), (3, 3)]:
        expect = lorem_ipsum[lo * 4096 : hi * 4096]
        assert codec.decode_range(container, lo, hi) == expect
    with pytest.raises(IndexError):
        codec.decode_range(container, 0, header.n_blocks + 1)


def test_determinism_across_backends(tokyo_pixels):
    # Same input -> identical container bytes, run-to-run and backend-
    # independent payloads (the reference's determinism tests generalized,
    # `encoder.rs:715-737`).
    data = tokyo_pixels[:30000]
    codec = BlockParallelCodec(GIF7, block_size=4096)
    assert codec.encode(data) == codec.encode(data)
    from lzw_tpu.ops import reference as oracle_mod

    _, payloads = framing.parse_frame(codec.encode(data))
    for i, p in enumerate(payloads):
        chunk = data[i * 4096 : (i + 1) * 4096]
        codes = oracle_mod.encode_codes(chunk, GIF7)
        if not oracle_mod.eoi_width_quirk(codes, GIF7):
            assert bytes(p) == oracle_mod.pack_codes(codes, GIF7.endianness)
