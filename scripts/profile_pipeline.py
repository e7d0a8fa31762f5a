"""Stage-by-stage timing of the container encode pipeline on TPU."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def t(label, fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best*1e3:8.1f} ms", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    B, N = 4096, 1024  # 4 MiB
    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    data = (tokyo * (N * B // len(tokyo) + 1))[: N * B]
    blocks = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)

    dev = jax.devices()[0]

    def h2d():
        b = jax.device_put(blocks, dev)
        jax.block_until_ready(b)
        return b

    t("H2D 16MiB u8", h2d)
    db = h2d()
    dl = jax.device_put(lens, dev)

    f = jax.jit(lambda b, l: encode_pallas.encode_blocks_fixed_tpu(b, l, B))
    bufs, lengths = f(db, dl)
    jax.block_until_ready((bufs, lengths))
    print("payload matrix:", bufs.shape, bufs.dtype,
          f"{bufs.size/2**20:.0f} MiB", flush=True)

    t("device encode (jit, resident)", lambda: jax.block_until_ready(f(db, dl)))

    def d2h():
        return np.asarray(bufs)

    t("D2H payload matrix", d2h)

    t("D2H lengths only", lambda: np.asarray(lengths))

    # host slicing cost
    pb = np.asarray(bufs)
    ln = np.asarray(lengths)

    def slice_payloads():
        return [pb[i, : ln[i]].tobytes() for i in range(N)]

    t("host payload slicing", slice_payloads)


if __name__ == "__main__":
    main()
