"""Isolate the multi-group bug: kernel output vs XLA post-processing.

Stashes the raw (pre-compaction) code slots by wrapping
_compact_grouped_codes, then checks block 0's raw slots against the
oracle's emission schedule (code k at step pos[k])."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep
from lzw_tpu.spec import Endianness, LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def oracle_emissions(data: bytes):
    table = {bytes([i]): i for i in range(256)}
    nxt = 256
    ems = []  # (step, code)
    prefix = b""
    pc = 0
    for i, ch in enumerate(data):
        cand = prefix + bytes([ch])
        if cand in table:
            prefix = cand
        else:
            ems.append((i, pc))
            if nxt < 4096:
                table[cand] = nxt
                nxt += 1
            prefix = bytes([ch])
        pc = table[prefix]
    ems.append((len(data), pc))
    return ems


def main():
    enable_compilation_cache()
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    B = 4096
    grp = ep.GROUP_CHUNKED

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    one = np.frombuffer(
        (tokyo * (grp * B // len(tokyo) + 1))[: grp * B], np.uint8
    ).reshape(grp, B)

    stash = {}
    orig = ep._compact_grouped_codes

    def spy(codes, errs, G_, total, group, N):
        stash["codes"] = codes
        return orig(codes, errs, G_, total, group, N)

    ep._compact_grouped_codes = spy

    blocks = np.tile(one, (G, 1))
    db = jnp.asarray(blocks)
    dl = jnp.full((G * grp,), B, jnp.int32)
    np.asarray(db[0, :4])
    # un-jitted internal call so the spy sees concrete arrays
    dense, counts, _, _ = ep._run_encode_kernel_chunked(
        db, dl, B, None, False, grp, ep.CELL, ep.SEG, 2048, ep.SSEG
    )
    np.asarray(counts[:4])

    raw = np.asarray(stash["codes"])  # (G, total, sub, 128)
    lane0 = raw[0, :, 0, 0]
    ems = oracle_emissions(one[0].tobytes())
    bad = 0
    for k, (step, code) in enumerate(ems):
        got = lane0[step]
        if got != code:
            print(f"code {k}: raw slot[{step}] = {got}, oracle {code}")
            bad += 1
            if bad >= 6:
                break
    # also: any emissions at non-oracle steps?
    emit_steps = {s for s, _ in ems}
    spur = [j for j in range(len(lane0))
            if lane0[j] >= 0 and j not in emit_steps]
    print(f"raw kernel slots: {bad} wrong of {len(ems)}; "
          f"{len(spur)} spurious emissions {spur[:6]}")


if __name__ == "__main__":
    main()
