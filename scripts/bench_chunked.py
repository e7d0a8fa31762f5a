"""On-chip sweep of the chunked big-block encoder (fixed + variable).

Usage: python scripts/bench_chunked.py [--flavor gif7|fixed] [--block 65536]
       [--chunk 4096] [--group 2048] [--mb 64] [--corpus image|text|mixed]

Measures HBM-to-HBM throughput (same methodology as bench.py) and verifies
block 0 against the scalar oracle.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def corpus(kind: str, nbytes: int, max_value: int) -> bytes:
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    img = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    txt = (ASSETS / "lorem_ipsum.txt").read_bytes()
    if kind == "image":
        base = img
    elif kind == "text":
        base = txt
    else:
        base = img + txt + img[::2] + txt
    base = bytes(b % (max_value + 1) for b in base) if max_value < 255 else base
    return (base * (nbytes // len(base) + 1))[:nbytes]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flavor", default="gif7")
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--group", type=int, default=None)
    ap.add_argument("--seg", type=int, default=512)
    ap.add_argument("--cell", type=int, default=512)
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--corpus", default="image")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import encode_pallas as ep, schedule as sched
    from lzw_tpu.ops import reference as oracle
    from lzw_tpu.spec import Endianness, LzwSpec

    if args.flavor == "fixed":
        spec = LzwSpec.fixed(Endianness.LITTLE)
        max_value = 255
    elif args.flavor.startswith("gif"):
        spec = LzwSpec.gif(int(args.flavor[3:]))
        max_value = (1 << spec.code_size) - 1
    elif args.flavor == "tiff":
        spec = LzwSpec.tiff()
        max_value = 255
    else:
        raise SystemExit(f"unknown flavor {args.flavor}")

    B = args.block
    group = args.group or ep.group_for(B)
    N = max((args.mb << 20) // B, group)
    N = (N // group) * group
    data = corpus(args.corpus, N * B, max_value)
    mat = np.frombuffer(data, np.uint8).reshape(N, B)
    lens = np.full(N, B, np.int32)

    t0 = time.perf_counter()
    parts = []
    for i in range(0, N, max(1, (4 << 20) // B)):
        p = jnp.asarray(mat[i : i + max(1, (4 << 20) // B)])
        np.asarray(p[0, :4])
        parts.append(p)
    db = jnp.concatenate(parts, axis=0)
    dl = jnp.asarray(lens)
    np.asarray(db[0, :4])
    print(f"# upload {N*B>>20} MiB: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    def run(d):
        if spec.variable:
            dense, counts, errs, _ = ep.encode_blocks_variable_codes_tpu(
                d, dl, spec, B, group=group, chunk=args.chunk, seg=args.seg,
                cell=args.cell, compact="stage",
            )
            bufs, nb = sched.pack_variable_device(
                dense, counts, spec, fix_eoi=True
            )
        else:
            bufs, nb = ep.encode_blocks_fixed_tpu(
                d, dl, B, group=group, chunk=args.chunk, seg=args.seg,
                cell=args.cell, compact="stage",
            )
        return bufs, nb

    t0 = time.perf_counter()
    bufs, nb = run(db)
    np.asarray(nb[:4])
    print(f"# first run (compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    best = float("inf")
    for rep in range(args.reps):
        dvar = db.at[0, 0].set((rep + 1) % (max_value + 1))
        np.asarray(dvar[0, :4])
        t0 = time.perf_counter()
        bufs, nb = run(dvar)
        np.asarray(nb[:4])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# rep {rep}: {dt:.3f}s = {N*B/dt/2**20:.1f} MiB/s",
              file=sys.stderr)

    got = np.asarray(bufs[0])[: int(np.asarray(nb[0]))].tobytes()
    exp = oracle.encode_bytes(np.asarray(dvar[0]).tobytes(), spec)
    assert got == exp, f"block 0 mismatch: {len(got)} vs {len(exp)}"
    rate = N * B / best
    print(f"{args.flavor} block={B} chunk={args.chunk} group={group} seg={args.seg} "
          f"corpus={args.corpus}: {rate/2**20:.1f} MiB/s (oracle-checked)")


if __name__ == "__main__":
    main()
