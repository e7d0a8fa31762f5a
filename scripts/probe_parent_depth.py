"""Measure byte-level parent-chain depth for the copy-resolve pass 2.

Every decoded byte is either a literal (root/first code) or a copy of an
earlier output byte (`decode_pallas.py` descriptor semantics).  A doubling
pass 2 needs ceil(log2(max chain depth)) + 1 gather rounds; this probe
computes actual depth distributions for both bench corpora at the container
block sizes, entirely in numpy (no chip).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from lzw_tpu.ops import reference
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def parents_for_block(data: bytes, spec: LzwSpec) -> np.ndarray:
    """Byte-level parent pointers from the oracle's encode code stream."""
    codes = [c for c, _w in reference.encode_codes(data, spec)]
    alphabet = spec.alphabet_size
    first_free = spec.first_free_code
    B = len(data)
    parent = np.arange(B, dtype=np.int64)

    ent_src = {}
    ent_len = {}
    off = 0
    nxt = first_free
    prev_len = 0
    first_step = True
    for c in codes:
        if spec.variable and c == spec.clear_code:
            nxt = first_free
            first_step = True
            continue
        if spec.variable and c == spec.end_code:
            break
        if first_step or c < alphabet:
            length, src = 1, -1
        elif c == nxt:
            length, src = prev_len + 1, off - prev_len
        else:
            length, src = ent_len[c], ent_src[c]
        if src >= 0:
            parent[off:off + length] = np.arange(src, src + length)
        if not first_step and nxt < 4096:
            ent_src[nxt] = off - prev_len
            ent_len[nxt] = prev_len + 1
            nxt += 1
        prev_len = length
        off += length
        first_step = False
    assert off == B, (off, B)
    return parent


def depth_stats(parent: np.ndarray):
    depth = np.zeros(len(parent), dtype=np.int32)
    cur = parent.copy()
    rounds = 0
    while True:
        nxt = parent[cur]
        moved = nxt != cur
        if not moved.any():
            break
        cur = nxt
        depth += moved
        rounds += 1
        if rounds > 200000:
            raise RuntimeError("no convergence")
    cur = parent.copy()
    drounds = 0
    while (parent[cur] != cur).any():
        cur = cur[cur]
        drounds += 1
    return depth, rounds, drounds


def main():
    img = bytes(load_tokyo_pixels(ASSETS / "tokyo_128_colors.png"))
    txt = (ASSETS / "lorem_ipsum.txt").read_bytes()
    for name, data in (("image", img), ("text", txt)):
        for bs in (4096, 65536):
            spec = LzwSpec.gif(7)
            blob = (data * ((bs // len(data)) + 1))[:bs]
            parent = parents_for_block(bytes(blob), spec)
            depth, rounds, drounds = depth_stats(parent)
            print(f"{name} bs={bs}: max depth {depth.max()}, "
                  f"p99 {np.percentile(depth, 99):.0f}, "
                  f"mean {depth.mean():.2f}, doubling rounds {drounds}")


if __name__ == "__main__":
    main()
