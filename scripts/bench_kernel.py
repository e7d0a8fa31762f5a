"""On-chip correctness + throughput for the lockstep Pallas encoder."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import Endianness, LzwSpec
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    print("devices:", jax.devices())
    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    blocks = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)

    f = lambda b, l: encode_pallas.encode_blocks_fixed_tpu(b, l, B)
    assert B == encode_pallas.BLOCK_SIZE, "v3 kernel uses 4KiB device blocks"
    db, dl = jnp.asarray(blocks), jnp.asarray(lens)

    t0 = time.perf_counter()
    payloads, lengths = f(db, dl)
    jax.block_until_ready((payloads, lengths))
    print(f"first call (compile): {time.perf_counter()-t0:.1f}s")

    # correctness vs oracle on a few blocks
    pl_np, ln_np = np.asarray(payloads), np.asarray(lengths)
    for i in (0, 1, N // 2, N - 1):
        expect = oracle.encode_bytes(blocks[i].tobytes(), spec)
        got = pl_np[i, : ln_np[i]].tobytes()
        assert got == expect, f"block {i} mismatch: {len(got)} vs {len(expect)}"
    print("correctness vs oracle: OK")

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(db, dl)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rate = N * B / dt
    print(f"throughput: {N*B/1e6:.1f} MB in {dt*1e3:.1f} ms = "
          f"{rate/2**20:.0f} MiB/s ({rate/(120*2**20):.2f}x reference)")


if __name__ == "__main__":
    main()
