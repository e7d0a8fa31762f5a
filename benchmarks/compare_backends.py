"""Comparative benchmark: all flavors x both corpora x available backends.

The criterion-equivalent of the reference's `lzw/benches/compare_crates.rs`:
five groups (encode/decode GIF-style, encode/decode TIFF-style, fixed both
endiannesses) over the text and image corpora, throughput in *uncompressed*
bytes/s (`README.md:16-19`).  Where the reference compares against the `lzw`
and `weezl` crates, this harness compares this framework's own backends —
the TPU device path, the threaded native runtime, and the scalar oracle —
which doubles as a cross-implementation differential test (`SURVEY.md` §4.3).

Emits one JSON line per measurement; pass --json FILE to persist.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from lzw_tpu.spec import Endianness, LzwSpec
from lzw_tpu.utils.corpus import load_corpus
from lzw_tpu.utils.profiling import RunMetrics

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"

FLAVORS = {
    "gif_cs7": LzwSpec.gif(7),
    "tiff": LzwSpec.tiff(),
    "fixed_le": LzwSpec.fixed(Endianness.LITTLE),
    "fixed_be": LzwSpec.fixed(Endianness.BIG),
}


def bench_native(spec, name, corpus_name, data, results, repeats=3):
    from lzw_tpu.native.runtime import get_runtime

    rt = get_runtime()
    enc = rt.encode(data, spec)
    best = min(
        _t(lambda: rt.encode(data, spec)) for _ in range(repeats)
    )
    results.append(RunMetrics("encode", name, len(data), len(enc), best)
                   .to_json().replace('"}', f'", "backend": "native", '
                                            f'"corpus": "{corpus_name}"}}'))
    best = min(_t(lambda: rt.decode(enc, spec)) for _ in range(repeats))
    results.append(RunMetrics("decode", name, len(enc), len(data), best)
                   .to_json().replace('"}', f'", "backend": "native", '
                                            f'"corpus": "{corpus_name}"}}'))
    # threaded block mode
    best = min(
        _t(lambda: rt.encode_blocks(data, spec, 1 << 14)) for _ in range(repeats)
    )
    results.append(RunMetrics("encode", name, len(data), len(enc), best,
                              n_blocks=len(data) // (1 << 14) + 1)
                   .to_json().replace('"}', f'", "backend": "native-mt", '
                                            f'"corpus": "{corpus_name}"}}'))


def bench_oracle(spec, name, corpus_name, data, results, repeats=3):
    """Scalar NumPy oracle — the in-repo semantics reference
    (`lzw_tpu/ops/reference.py`), the analog of benching the `lzw` crate."""
    from lzw_tpu.ops import reference as oracle

    enc = oracle.encode_bytes(data, spec)
    best = min(
        _t(lambda: oracle.encode_bytes(data, spec)) for _ in range(repeats)
    )
    results.append(RunMetrics("encode", name, len(data), len(enc), best)
                   .to_json().replace('"}', f'", "backend": "oracle", '
                                            f'"corpus": "{corpus_name}"}}'))
    best = min(
        _t(lambda: oracle.decode_bytes(enc, spec)) for _ in range(repeats)
    )
    results.append(RunMetrics("decode", name, len(enc), len(data), best)
                   .to_json().replace('"}', f'", "backend": "oracle", '
                                            f'"corpus": "{corpus_name}"}}'))


def bench_device(spec, name, corpus_name, data, results, repeats=3):
    """HBM-to-HBM kernel rates on the chip (input blocks resident, payload
    matrix / decoded matrix produced on device) — the apples-to-apples
    analog of the reference's RAM-to-RAM criterion loops.  Container-e2e
    rates through the dev relay measure the tunnel, not the codec, so they
    are deliberately not part of this table (see bench.py's note)."""
    import jax
    import jax.numpy as jnp

    if not any(d.platform == "tpu" for d in jax.devices()):
        return
    from lzw_tpu.kernels import (
        decode_pallas as dp, encode_pallas as ep, schedule as sc,
    )

    B = 4096
    N = ep.GROUP
    if spec.variable:
        hi = spec.max_code_value + 1
        data = bytes(b % hi for b in data)
    blocks = np.frombuffer(
        (data * (N * B // len(data) + 1))[: N * B], np.uint8
    ).reshape(N, B)
    db = jnp.asarray(blocks)
    dl = jnp.full((N,), B, jnp.int32)
    np.asarray(db[0, :4])
    little = spec.endianness is Endianness.LITTLE

    def enc(d):
        if spec.variable:
            dense, counts, _, _ = ep.encode_blocks_variable_codes_tpu(
                d, dl, spec, B, compact="stage"
            )
            return sc.pack_variable_device(dense, counts, spec, fix_eoi=True)
        return ep.encode_blocks_fixed_tpu(d, dl, B, little=little,
                                          compact="stage")

    bufs, nb = enc(db)
    np.asarray(nb[:4])  # force compile + run

    def timed_enc(rep):
        dvar = db.at[0, 0].set((rep + 1) % 120)
        np.asarray(dvar[0, :4])
        t0 = time.perf_counter()
        _, nb_ = enc(dvar)
        np.asarray(nb_[:4])
        return time.perf_counter() - t0

    best = min(timed_enc(r) for r in range(repeats))
    comp_bytes = int(np.asarray(nb).astype(np.int64).sum())
    results.append(RunMetrics(
        "encode", name, N * B, comp_bytes, best, n_blocks=N, n_devices=1,
    ).to_json().replace('"}', f'", "backend": "tpu-hbm", '
                              f'"corpus": "{corpus_name}"}}'))

    # Decode: all-device (pass 1 + chain-walk pass 2).
    pb_act = int(np.asarray(jnp.max(nb)))
    if spec.variable:
        pay_np = np.asarray(bufs)[:, :pb_act]
        nb_np = np.asarray(nb)

        def dec(p, l):
            out, tot, errs, _, strict = dp.decode_variable_all_device(
                p, l, spec, B
            )
            return out, tot, errs, strict

        out, tot, errs, strict = dec(pay_np, nb_np)
        assert bool(np.asarray(strict).all()), "non-strict self-stream?"

        def timed_dec(rep):
            # Variable pass 1 recovers counts host-side; perturb by rotating
            # whole rows (payloads + lengths together stay valid).
            p = np.ascontiguousarray(np.roll(pay_np, rep, axis=0))
            l = np.roll(nb_np, rep)
            t0 = time.perf_counter()
            out_, tot_, _, _ = dec(p, l)
            np.asarray(tot_[:4])
            return time.perf_counter() - t0

        bestd = min(timed_dec(r + 1) for r in range(repeats))
    else:
        PB3 = ((pb_act + 2) // 3) * 3
        pay = (bufs[:, :PB3] if PB3 <= bufs.shape[1]
               else jnp.pad(bufs, ((0, 0), (0, PB3 - bufs.shape[1]))))

        def dec(p):
            w, nc, tot, de, dec_, (pair, codes) = dp.decode_pass1_fixed_tpu(
                p, nb, B, little=little
            )
            return dp.decode_pass2_device(codes, pair, nc, tot, B), tot

        out, tot = dec(pay)
        np.asarray(tot[:4])

        def timed_dec(rep):
            pvar = pay.at[0, 0].set(rep % 251)
            np.asarray(pvar[0, :4])
            t0 = time.perf_counter()
            _, tot_ = dec(pvar)
            np.asarray(tot_[:4])
            return time.perf_counter() - t0

        bestd = min(timed_dec(r) for r in range(repeats))
        assert (np.asarray(out[1:9]) == blocks[1:9]).all(), "round trip"

    results.append(RunMetrics(
        "decode", name, comp_bytes, N * B, bestd, n_blocks=N, n_devices=1,
    ).to_json().replace('"}', f'", "backend": "tpu-hbm", '
                              f'"corpus": "{corpus_name}"}}'))


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=pathlib.Path, default=None)
    ap.add_argument("--device", action="store_true",
                    help="include the TPU device path")
    ap.add_argument("--oracle", action="store_true",
                    help="include the scalar Python oracle (slow on "
                         "--scale'd corpora; minutes per MiB)")
    ap.add_argument("--scale", type=int, default=1,
                    help="corpus replication factor")
    args = ap.parse_args()

    corpus = load_corpus(ASSETS)
    results: list[str] = []
    for corpus_name, data in corpus.items():
        data = data * args.scale
        for name, spec in FLAVORS.items():
            if args.oracle:
                bench_oracle(spec, name, corpus_name, data, results)
            bench_native(spec, name, corpus_name, data, results)
            if args.device:
                bench_device(spec, name, corpus_name, data, results)

    for line in results:
        print(line)
    if args.json:
        args.json.write_text("\n".join(results) + "\n")


if __name__ == "__main__":
    main()
