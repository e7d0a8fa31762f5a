"""On-chip all-device fixed-12 decode benchmark (pass 1 + pass 2).

Usage: python scripts/bench_decode.py [--mb 64] [--group 4096]
       [--group2 1024] [--seg 64] [--seg2 128] [--corpus image]

Encodes the corpus into 4 KiB fixed blocks on device, then measures the
HBM-to-HBM decode rate (payload matrix in, decoded byte matrix out) in
uncompressed bytes/s — the reference's decompression-speed definition
(`README.md:16-19`).  Verifies output equality with the input blocks.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--group", type=int, default=None)   # pass 1
    ap.add_argument("--group2", type=int, default=1024)  # pass 2
    ap.add_argument("--seg", type=int, default=None)     # pass 1
    ap.add_argument("--seg2", type=int, default=128)     # pass 2
    ap.add_argument("--corpus", default="image")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pass1-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep
    from lzw_tpu.spec import Endianness, LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    B = 4096
    group = args.group or dp.GROUP
    seg = args.seg or dp.SEG

    if args.corpus == "image":
        base = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    else:
        base = (ASSETS / "lorem_ipsum.txt").read_bytes()
    N = max((args.mb << 20) // B, group)
    N = (N // group) * group
    data = (base * (N * B // len(base) + 1))[: N * B]
    mat = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)

    t0 = time.perf_counter()
    parts = []
    rows = max(1, (4 << 20) // B)
    for i in range(0, N, rows):
        p = jnp.asarray(mat[i : i + rows])
        np.asarray(p[0, :4])
        parts.append(p)
    blocks = jnp.concatenate(parts, axis=0)
    print(f"# upload {N*B>>20} MiB: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    # Encode on device (fixed LE), pad payload bound to a multiple of 3.
    bufs, nb = ep.encode_blocks_fixed_tpu(blocks, jnp.asarray(lens), B)
    pb_act = int(np.asarray(jnp.max(nb)))
    PB = ((pb_act + 2) // 3) * 3
    payloads = bufs[:, :PB] if PB <= bufs.shape[1] else jnp.pad(
        bufs, ((0, 0), (0, PB - bufs.shape[1]))
    )
    np.asarray(nb[:4])
    print(f"# encoded; payload matrix {payloads.shape}", file=sys.stderr)

    @jax.jit
    def full_decode(pay, pl_):
        words, n_codes, totals, errs, errc, (pair, codes) = (
            dp.decode_pass1_fixed_tpu(pay, pl_, B, little=True,
                                      group=group, seg=seg)
        )
        out = dp.decode_pass2_device(codes, pair, n_codes, totals, B,
                                     group=args.group2, seg=args.seg2)
        return out, totals, errs

    @jax.jit
    def pass1_only(pay, pl_):
        words, n_codes, totals, errs, errc, (pair, codes) = (
            dp.decode_pass1_fixed_tpu(pay, pl_, B, little=True,
                                      group=group, seg=seg)
        )
        return totals, errs

    run = pass1_only if args.pass1_only else full_decode

    t0 = time.perf_counter()
    res = run(payloads, nb)
    np.asarray(res[-1][:4])
    print(f"# first run (compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    best = float("inf")
    for rep in range(args.reps):
        pvar = payloads.at[0, 0].set(rep % 251)  # perturb defeats caching
        np.asarray(pvar[0, :4])
        t0 = time.perf_counter()
        res = run(pvar, nb)
        np.asarray(res[-1][:4])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# rep {rep}: {dt:.3f}s = {N*B/dt/2**20:.1f} MiB/s",
              file=sys.stderr)

    if not args.pass1_only:
        out = res[0]
        # Verify a slice (block 0 was perturbed; check 1..64).
        got = np.asarray(out[1:65])
        assert (got == mat[1:65]).all(), "decode mismatch"
    rate = N * B / best
    what = "pass1" if args.pass1_only else "full"
    print(f"fixed12 decode {what} group={group}/{args.group2} "
          f"seg={seg}/{args.seg2}: {rate/2**20:.1f} MiB/s")


if __name__ == "__main__":
    main()
