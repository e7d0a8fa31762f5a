"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): fixed-12-bit LZW encode throughput on the
image corpus, block-parallel on the available TPU chip(s), measured in
uncompressed bytes/s (the reference's definition, `README.md:16-19`).
Baseline: the reference's 120 MiB/s single-core fixed-12 encode.

Runs on the default JAX platform (the real TPU under the driver).  Use
``--all`` for the full suite of flavor/corpus combinations (human-readable
lines to stderr, still one JSON line to stdout).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

ASSETS = pathlib.Path(__file__).resolve().parent / "test-assets"
BASELINE_FIXED12_ENCODE = 120 * (1 << 20)  # bytes/s, reference README.md:27


def _corpus(target_bytes: int) -> bytes:
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    base = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    reps = max(1, target_bytes // len(base))
    return (base * reps)[:target_bytes]


def _time_encode(codec, data: bytes, repeats: int = 3) -> float:
    """Best-of-N end-to-end container encode, seconds."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        codec.encode(data)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from lzw_tpu.parallel.block import BlockParallelCodec
    from lzw_tpu.spec import Endianness, LzwSpec

    import jax

    n_dev = len(jax.devices())
    spec = LzwSpec.fixed(Endianness.LITTLE)
    block_size = 1 << 16

    # Scale the corpus so one encode stays in single-digit seconds: calibrate
    # on a small slice first.
    codec = BlockParallelCodec(spec, block_size=block_size)
    small = _corpus(block_size * max(4, n_dev))
    codec.encode(small)  # compile
    t_small = _time_encode(codec, small, repeats=1)
    rate_guess = len(small) / max(t_small, 1e-9)
    target = int(min(max(rate_guess * 4.0, len(small)), 512 << 20))
    data = _corpus(target)

    codec.encode(data[: len(small)])  # warm caches for this shape family
    dt = _time_encode(codec, data)
    rate = len(data) / dt

    # Round-trip sanity on a slice (compressed correctness gate).
    slice_ = data[: block_size * 2 + 123]
    assert codec.decode(codec.encode(slice_)) == slice_

    result = {
        "metric": "fixed12_encode_bytes_per_s_1chip",
        "value": round(rate, 1),
        "unit": "bytes/s",
        "vs_baseline": round(rate / BASELINE_FIXED12_ENCODE, 4),
    }
    print(json.dumps(result))
    print(
        f"# {len(data)/1e6:.1f} MB in {dt:.3f}s = {rate/1e6:.1f} MB/s "
        f"({rate / BASELINE_FIXED12_ENCODE:.2f}x reference single-core), "
        f"{n_dev} device(s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
