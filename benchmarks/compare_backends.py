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


def bench_device(spec, name, corpus_name, data, results, repeats=3):
    import jax

    from lzw_tpu.parallel.block import BlockParallelCodec

    codec = BlockParallelCodec(spec, block_size=4096)
    if not codec.use_pallas:
        return
    codec.encode(data)  # compile
    best = min(_t(lambda: codec.encode(data)) for _ in range(repeats))
    results.append(RunMetrics(
        "encode", name, len(data), 0, best,
        n_blocks=len(data) // 4096 + 1, n_devices=len(jax.devices()),
    ).to_json().replace('"}', f'", "backend": "tpu-container", '
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
    ap.add_argument("--scale", type=int, default=1,
                    help="corpus replication factor")
    args = ap.parse_args()

    corpus = load_corpus(ASSETS)
    results: list[str] = []
    for corpus_name, data in corpus.items():
        data = data * args.scale
        for name, spec in FLAVORS.items():
            bench_native(spec, name, corpus_name, data, results)
            if args.device:
                bench_device(spec, name, corpus_name, data, results)

    for line in results:
        print(line)
    if args.json:
        args.json.write_text("\n".join(results) + "\n")


if __name__ == "__main__":
    main()
