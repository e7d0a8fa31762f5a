"""Cross-implementation differential fuzzing.

The reference's differential oracle is its exploration crate asserting six
encoder designs produce identical code streams (`exploration/src/lib.rs:
539-607`).  Here all four implementations of this framework — scalar oracle,
XLA codecs, Pallas kernels (interpret mode) and the native C++ runtime — are
driven over randomized inputs and must agree byte-for-byte, flavor by flavor.

Runtime-bounded: sizes and trial counts are chosen to keep the whole module
under ~1 minute on CI hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lzw_tpu.api import LzwCodec
from lzw_tpu.kernels import encode_pallas, schedule
from lzw_tpu.native.runtime import get_runtime, native_available
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import CodeSizeStrategy, Endianness, LzwSpec

SPECS = [
    LzwSpec.gif(3),
    LzwSpec.tiff(),
    LzwSpec.fixed(Endianness.LITTLE),
    LzwSpec.fixed(Endianness.BIG),
    LzwSpec.variable(6, Endianness.BIG, CodeSizeStrategy.TIFF),
]
IDS = ["gif3", "tiff", "fixed_le", "fixed_be", "var6_be_tiff"]


def _gen_inputs(spec, rng, n_cases=6):
    hi = 1 << spec.code_size
    out = []
    for _ in range(n_cases):
        kind = rng.integers(0, 4)
        n = int(rng.integers(0, 300))
        if kind == 0:  # uniform random
            data = rng.integers(0, hi, size=n)
        elif kind == 1:  # runs
            data = np.repeat(rng.integers(0, hi, size=max(n // 9, 1)), 9)[:n]
        elif kind == 2:  # tiny alphabet (KwKwK-heavy)
            data = rng.integers(0, min(3, hi), size=n)
        else:  # periodic
            period = rng.integers(1, 8)
            data = np.tile(rng.integers(0, hi, size=period), n // period + 1)[:n]
        out.append(data.astype(np.uint8).tobytes())
    return out


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_all_backends_agree(spec):
    rng = np.random.default_rng(0xC0DEC)
    jax_codec = LzwCodec(spec, backend="jax")
    rt = get_runtime() if native_available() else None

    for data in _gen_inputs(spec, rng):
        golden = oracle.encode_bytes(data, spec)
        assert jax_codec.encode(data) == golden, f"jax encode ({len(data)}B)"
        if rt is not None:
            assert rt.encode(data, spec) == golden, "native encode"
        codes = oracle.encode_codes(data, spec)
        if not oracle.eoi_width_quirk(codes, spec):
            assert jax_codec.decode(golden) == data, "jax decode"
            if rt is not None:
                assert rt.decode(golden, spec) == data, "native decode"


@pytest.mark.parametrize("spec", [LzwSpec.gif(3), LzwSpec.fixed(Endianness.BIG)],
                         ids=["gif3", "fixed_be"])
def test_pallas_kernel_agrees(spec):
    rng = np.random.default_rng(0xF00D)
    datas = _gen_inputs(spec, rng, n_cases=5)
    datas = [d[:128] for d in datas]
    N = 128
    mat = np.zeros((N, 128), np.uint8)
    lens = np.zeros(N, np.int32)
    for i, d in enumerate(datas):
        mat[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    if spec.variable:
        dense, counts, errs, _ = encode_pallas.encode_blocks_variable_codes_tpu(
            jnp.asarray(mat), jnp.asarray(lens), spec, 128,
            interpret=True, group=128, cell=64, seg=64,
        )
        assert not np.asarray(errs)[: len(datas)].any()
        payloads, lengths = schedule.pack_variable(
            np.asarray(dense)[: len(datas)], np.asarray(counts)[: len(datas)],
            spec, fix_eoi=False,
        )
    else:
        payloads, lengths = encode_pallas.encode_blocks_fixed_tpu(
            jnp.asarray(mat), jnp.asarray(lens), 128,
            little=spec.endianness is Endianness.LITTLE,
            interpret=True, group=128, cell=64, seg=64,
        )
        payloads, lengths = np.asarray(payloads), np.asarray(lengths)
    for i, d in enumerate(datas):
        assert payloads[i, : lengths[i]].tobytes() == oracle.encode_bytes(
            d, spec
        ), f"case {i}"
