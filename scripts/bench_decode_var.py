"""On-chip variable strict decode: correctness + throughput."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from lzw_tpu.kernels import decode_pallas
from lzw_tpu.native.runtime import get_runtime
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    print("devices:", jax.devices(), flush=True)
    spec = LzwSpec.gif(7)
    B, N = 4096, 2048
    rt = get_runtime()

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    payload_list = rt.encode_blocks(data, spec, B)
    pb = max(len(p) for p in payload_list)
    payloads = np.zeros((N, pb), np.uint8)
    plens = np.zeros(N, np.int32)
    for i, p in enumerate(payload_list):
        payloads[i, : len(p)] = np.frombuffer(p, np.uint8)
        plens[i] = len(p)

    t0 = time.perf_counter()
    words, counts, totals, errs, err_codes, strict = (
        decode_pallas.decode_pass1_variable_tpu(payloads, plens, spec, B)
    )
    words_np = np.asarray(words)
    print(f"first call: {time.perf_counter()-t0:.1f}s", flush=True)
    assert strict.all(), f"{(~strict).sum()} non-strict?!"
    assert not np.asarray(errs).any()
    out, lengths = rt.apply_words(words_np, B)
    assert out.tobytes() == data, "mismatch"
    print("correctness: OK", flush=True)

    best = float("inf")
    for rep in range(3):
        var = payloads.copy()
        var[0, pb - 1] = rep + 1  # defeats relay cache, past valid payload
        t0 = time.perf_counter()
        o = decode_pallas.decode_pass1_variable_tpu(var, plens, spec, B)
        np.asarray(o[2])
        best = min(best, time.perf_counter() - t0)
    print(f"pass1 (incl host unpack): {N*B/2**20:.0f} MiB in {best:.3f}s = "
          f"{N*B/best/2**20:.0f} MiB/s "
          f"({N*B/best/(200*2**20):.2f}x reference variable-decode)",
          flush=True)


if __name__ == "__main__":
    main()
