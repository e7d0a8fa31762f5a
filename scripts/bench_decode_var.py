"""On-chip variable strict decode: correctness + throughput.

Measures (a) host-side count recovery, (b) device unpack + pass-1 with the
payloads resident in HBM (the dev relay uploads at ~16 MB/s, so any
transfer-inclusive number measures the tunnel), (c) native copy-apply.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from lzw_tpu.kernels import decode_pallas, schedule as sched_mod
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
    words, counts, totals, errs, err_codes, strict, _ = (
        decode_pallas.decode_pass1_variable_tpu(payloads, plens, spec, B)
    )
    words_np = np.asarray(words)
    print(f"first call: {time.perf_counter()-t0:.1f}s", flush=True)
    assert strict.all(), f"{(~strict).sum()} non-strict?!"
    assert not np.asarray(errs).any()
    out, lengths = rt.apply_words(words_np, B)
    assert out.tobytes() == data, "mismatch"
    print("correctness: OK", flush=True)

    # Host prep (count recovery) timing.
    t0 = time.perf_counter()
    counts_h, strict_h, S_raw = sched_mod.recover_counts(
        payloads, plens.astype(np.int64), spec
    )
    t_host = time.perf_counter() - t0
    print(f"host recover_counts: {t_host*1000:.0f} ms "
          f"({N*B/t_host/2**20:.0f} MiB/s)", flush=True)

    # Device-resident unpack + pass-1.
    cell = decode_pallas.CELL
    S = max(((S_raw + cell - 1) // cell) * cell, cell)
    sched = sched_mod.emission_schedule(spec, S)
    sched_arr = np.zeros((2, S), np.int32)
    sched_arr[0, :] = (sched.nxt_of[:S] - 1).astype(np.int32)
    sched_arr[1, :] = sched.epoch_start[:S].astype(np.int32)
    dp = jnp.asarray(payloads)
    dc = jnp.asarray(counts_h.astype(np.int32))
    ds = jnp.asarray(sched_arr)
    np.asarray(dp[0, :4])

    def f(p):
        return decode_pallas._variable_pass1_from_payloads(
            p, dc, ds, spec, S, B, False, decode_pallas.GROUP_VAR, cell, 128
        )

    o = f(dp)
    np.asarray(o[1][:, 1])
    best = float("inf")
    for rep in range(3):
        dvar = dp.at[0, pb - 1].set(rep + 1)  # past plen; defeats exec cache
        np.asarray(dvar[0, :2])
        t0 = time.perf_counter()
        o = f(dvar)
        np.asarray(o[1][:, 1])
        best = min(best, time.perf_counter() - t0)
    print(f"device unpack+pass1 (HBM-resident): {N*B/2**20:.0f} MiB in "
          f"{best:.3f}s = {N*B/best/2**20:.0f} MiB/s "
          f"({N*B/best/(200*2**20):.2f}x reference variable-decode)",
          flush=True)

    t0 = time.perf_counter()
    rt.apply_words(words_np, B)
    t_apply = time.perf_counter() - t0
    print(f"native apply: {t_apply:.3f}s = {N*B/t_apply/2**20:.0f} MiB/s "
          f"(overlappable)", flush=True)


if __name__ == "__main__":
    main()
