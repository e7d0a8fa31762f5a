"""Foreign early-CLEAR variable streams on the device path.

The reference's decoder accepts CLEAR at any position
(`decoder.rs:222-227`); the TPU path reaches parity by resegmenting at
the CLEARs and decoding strict per-epoch sub-streams on the device
(`lzw_tpu/kernels/nonstrict.py`).  Kernels run in interpret mode here.
"""

import numpy as np
import pytest

from lzw_tpu.kernels import nonstrict as nsx
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import LzwSpec, TruncatedStreamError
from lzw_tpu.utils.testdata import spliced_nonstrict_stream


def _matrix(streams):
    pb = max(len(s) for s in streams)
    pay = np.zeros((len(streams), pb), np.uint8)
    plens = np.zeros(len(streams), np.int64)
    for i, s in enumerate(streams):
        pay[i, : len(s)] = np.frombuffer(s, np.uint8)
        plens[i] = len(s)
    return pay, plens


def test_parse_epochs_strict_stream_is_one_epoch_per_reset():
    rng = np.random.default_rng(0)
    spec = LzwSpec.gif(7)
    src = bytes(rng.integers(0, 128, 9000).astype(np.uint8))
    pay, plens = _matrix([oracle.encode_bytes(src, spec)])
    dense, cnt, owner, _ = nsx.parse_epochs(pay, plens, spec)
    assert (owner == 0).all()
    assert int(cnt.sum()) == sum(
        1 for c, _ in oracle.encode_codes(src, spec)
        if c not in (spec.clear_code, spec.end_code)
    )


def test_nonstrict_device_decode_matches_oracle():
    rng = np.random.default_rng(1)
    spec = LzwSpec.gif(7)
    srcs, streams = [], []
    for i in range(4):
        src = bytes(rng.integers(0, 128, 2500 + 2100 * i).astype(np.uint8))
        srcs.append(src)
        streams.append(spliced_nonstrict_stream(src, spec, piece=900 + 250 * i))
    # mix in a strict stream: the resegmenter must be a superset decoder
    srcs.append(bytes(rng.integers(0, 128, 5000).astype(np.uint8)))
    streams.append(oracle.encode_bytes(srcs[-1], spec))
    pay, plens = _matrix(streams)
    outs = nsx.decode_variable_nonstrict_device(
        pay, plens, spec, 1 << 14, interpret=True
    )
    for i, src in enumerate(srcs):
        assert outs[i] == oracle.decode_bytes(streams[i], spec) == src


def test_nonstrict_tiff_flavor():
    rng = np.random.default_rng(2)
    spec = LzwSpec.tiff()
    src = bytes(rng.integers(0, 256, 4200).astype(np.uint8))
    stream = spliced_nonstrict_stream(src, spec, piece=1300)
    pay, plens = _matrix([stream])
    outs = nsx.decode_variable_nonstrict_device(
        pay, plens, spec, 1 << 13, interpret=True
    )
    assert outs[0] == src


def test_nonstrict_truncated_stream_raises():
    rng = np.random.default_rng(3)
    spec = LzwSpec.gif(7)
    src = bytes(rng.integers(0, 128, 3000).astype(np.uint8))
    stream = spliced_nonstrict_stream(src, spec, piece=1000)
    pay, plens = _matrix([stream[: len(stream) // 2]])
    with pytest.raises(TruncatedStreamError):
        nsx.decode_variable_nonstrict_device(
            pay, plens, spec, 1 << 13, interpret=True
        )


def test_container_nonstrict_path_stitches_blocks():
    """Foreign payloads inside an LZWT container decode through the
    resegmentation path (exercised directly; the hardware codec routes
    here when pass 1 reports non-strict blocks)."""
    from lzw_tpu.parallel import framing
    from lzw_tpu.parallel.block import BlockParallelCodec

    rng = np.random.default_rng(4)
    spec = LzwSpec.gif(7)
    bs = 1 << 13
    data = bytes(rng.integers(0, 128, bs * 2 + 777).astype(np.uint8))
    payloads = [
        spliced_nonstrict_stream(data[i : i + bs], spec, piece=1100)
        for i in range(0, len(data), bs)
    ]
    container = framing.pack_frame(spec, bs, len(data), payloads)
    header, ps = framing.parse_frame(container)
    codec = BlockParallelCodec(spec, block_size=bs, use_pallas=False)
    # interpret-mode kernels under the CPU backend
    import lzw_tpu.kernels.nonstrict as mod

    orig = mod.decode_variable_nonstrict_device

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    mod_dict = mod.__dict__
    mod_dict["decode_variable_nonstrict_device"] = interp
    try:
        out = codec._decode_variable_nonstrict(header, ps)
    finally:
        mod_dict["decode_variable_nonstrict_device"] = orig
    assert out == data


def _truncated_strict_stream(spec, n_data: int, tail=()):
    """A valid stream of exactly ``n_data`` data codes built by truncating
    an oracle encode, with ``tail`` (code, width) symbols appended."""
    from lzw_tpu.kernels import schedule as sched_mod

    rng = np.random.default_rng(42)
    hi = spec.max_code_value + 1
    src = bytes(rng.integers(0, hi, 4 * n_data + 4096).astype(np.uint8))
    cw = oracle.encode_codes(src, spec)
    body = [
        (c, w) for c, w in cw
        if c not in (spec.clear_code, spec.end_code)
    ]
    assert len(body) > n_data
    head = [cw[0]] + body[:n_data]
    return oracle.pack_codes(head + list(tail), spec.endianness)


def test_nonstrict_tiff_multi_epoch_table_full():
    """A strict TIFF stream with a table-full epoch must resegment: the
    early-change strategy trips table-full one code sooner, so the epoch
    bound must come from the schedule (r4 advisor find)."""
    rng = np.random.default_rng(7)
    spec = LzwSpec.tiff()
    src = bytes(rng.integers(0, 256, 1 << 14).astype(np.uint8))
    stream = oracle.encode_bytes(src, spec)
    n_codes = sum(
        1 for c, _ in oracle.encode_codes(src, spec)
        if c not in (spec.clear_code, spec.end_code)
    )
    assert n_codes > nsx._full_epoch_len(spec)  # really multi-epoch
    pay, plens = _matrix([stream])
    outs = nsx.decode_variable_nonstrict_device(
        pay, plens, spec, 1 << 14, interpret=True
    )
    assert outs[0] == src


def test_nonstrict_eoi_on_last_slot_of_full_epoch():
    """EOI occupying the final data slot of a would-be-full epoch must
    terminate the parse (slot end = offset + width, not the next slot's
    offset past the mandatory-CLEAR gap; r4 advisor find)."""
    from lzw_tpu.kernels import schedule as sched_mod

    spec = LzwSpec.gif(7)
    S_e = nsx._full_epoch_len(spec)
    n = S_e - 1
    sched = sched_mod.emission_schedule(spec, S_e + 2)
    w_eoi = sched.eoi_width(n, True)
    stream = _truncated_strict_stream(spec, n, [(spec.end_code, w_eoi)])
    want = oracle.decode_bytes(stream, spec)
    pay, plens = _matrix([stream])
    outs = nsx.decode_variable_nonstrict_device(
        pay, plens, spec, 1 << 14, interpret=True
    )
    assert outs[0] == want


def test_nonstrict_eoi_in_table_full_gap():
    """A stream ending with EOI exactly where the table-full CLEAR would
    sit (the fix_eoi ending) parses as a completed stream."""
    from lzw_tpu.kernels import schedule as sched_mod

    spec = LzwSpec.gif(7)
    S_e = nsx._full_epoch_len(spec)
    sched = sched_mod.emission_schedule(spec, S_e + 2)
    w_eoi = sched.eoi_width(S_e, True)
    assert w_eoi == 12
    stream = _truncated_strict_stream(spec, S_e, [(spec.end_code, w_eoi)])
    want = oracle.decode_bytes(stream, spec)
    pay, plens = _matrix([stream])
    outs = nsx.decode_variable_nonstrict_device(
        pay, plens, spec, 1 << 14, interpret=True
    )
    assert outs[0] == want


def test_nonstrict_corrupt_table_full_gap_raises():
    """A non-CLEAR data code where the table-full CLEAR must sit is the
    reference's missing-CLEAR error (`decoder.rs:281-283`) — the parse must
    not silently decode past it (r4 advisor find)."""
    from lzw_tpu.spec import MissingClearCodeError

    spec = LzwSpec.gif(7)
    S_e = nsx._full_epoch_len(spec)
    stream = _truncated_strict_stream(
        spec, S_e, [(300, 12), (spec.end_code, 12)]
    )
    with pytest.raises(MissingClearCodeError):
        oracle.decode_bytes(stream, spec)
    pay, plens = _matrix([stream])
    with pytest.raises(MissingClearCodeError):
        nsx.decode_variable_nonstrict_device(
            pay, plens, spec, 1 << 14, interpret=True
        )
