"""On-chip correctness + throughput for the variable Pallas encoder."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas, schedule
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import Endianness, LzwSpec
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    print("devices:", jax.devices(), flush=True)
    spec = LzwSpec.gif(7)
    B, N = 4096, 2048

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    base = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)
    f = jax.jit(lambda b, l: encode_pallas.encode_blocks_variable_codes_tpu(
        b, l, spec, B))

    dl = jnp.asarray(lens)
    out = f(jnp.asarray(base), dl)
    jax.block_until_ready(out)
    print("compiled", flush=True)

    dense, counts, errs, _ = out
    dense, counts = np.asarray(dense), np.asarray(counts)
    assert not np.asarray(errs).any()
    # correctness vs oracle on a few blocks (codes + packed bytes)
    payloads, lengths = schedule.pack_variable(
        dense[:4], counts[:4], spec, fix_eoi=False)
    for i in range(4):
        expect = oracle.encode_bytes(base[i].tobytes(), spec)
        got = payloads[i, : lengths[i]].tobytes()
        assert got == expect, f"block {i}: {len(got)} vs {len(expect)}"
    print("correctness vs oracle: OK", flush=True)

    best = float("inf")
    for rep in range(3):
        var = base.copy(); var[0, 0] = rep + 1
        db = jnp.asarray(var); jax.block_until_ready(db)
        t0 = time.perf_counter()
        dense, counts, errs, _ = f(db, dl)
        np.asarray(counts)
        best = min(best, time.perf_counter() - t0)
    rate = N * B / best
    print(f"device codes: {N*B/2**20:.0f} MiB in {best:.3f}s = "
          f"{rate/2**20:.0f} MiB/s ({rate/(70*2**20):.2f}x reference "
          f"variable-encode single-core)", flush=True)

    # host pack throughput
    t0 = time.perf_counter()
    schedule.pack_variable(np.asarray(dense), np.asarray(counts), spec)
    print(f"host pack: {time.perf_counter()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
