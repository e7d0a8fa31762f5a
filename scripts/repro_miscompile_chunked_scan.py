"""Standalone repro: chunked scan+pallas miscompile at G >= 3 (r3 find).

The chunked variable/fixed encoder carries its dictionary through a
lax.scan over per-chunk pallas launches.  Compiled with G >= 3 grid
groups in one program, the pipeline computes IDENTICAL WRONG output in
every group on the chip (raw kernel slots verified correct un-jitted;
interpret mode correct) — so production slices batches into separate
<= 2-group jit executions (`encode_pallas.encode_blocks_*`).

This script calls the internal `_scan_chunks` directly at G = 4
(bypassing the guard) and compares against the guarded production path
on identical data.

r5 NOTE: the retirement A/B (`scripts/ab_supergroup.py`) + native-decoder
arbiter found a RELIABLY REPRODUCING shape — G=4 at group=512, B=64 KiB,
N=2048, the image corpus tiled — and also showed the old lax.map
"containment" never contained (map inlines into the same XLA program;
guarded group=512 and N=4096/group=1024 failed the arbiter on every
row).  Production now slices batches into separate <= 2-group jit
executions OUTSIDE jit (`encode_pallas.encode_blocks_*`), which the
arbiter verifies byte-exact.  The r4 shapes (G=3/group=1024 random
data, G=4/group=512/B=16KiB) did NOT reproduce, so the trigger is
shape+content dependent.  This script pins the reproducing
configuration and exits 0 while the bug still reproduces (containment
required) and 1 when the toolchain's behavior CHANGES (direct output
becomes correct — retirement candidate).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    spec = LzwSpec.gif(7)
    spec_key = (
        spec.first_free_code,
        spec.max_code_value,
        4096 - spec.strategy.increment,
    )
    B, N, group = 65536, 2048, 512  # G = 4: the r5 reproducing shape
    chunk, cell, seg = 2048, 512, 128
    from lzw_tpu.utils.corpus import load_tokyo_pixels
    base = load_tokyo_pixels(
        pathlib.Path(__file__).resolve().parent.parent
        / "test-assets" / "tokyo_128_colors.png"
    )
    seed = jnp.asarray(np.frombuffer(
        bytes(b % 128 for b in base), np.uint8
    ))
    np.asarray(seed[:4])  # upload once; tile device-side (relay is slow)
    blocks = jnp.tile(seed, -(-(N * B) // seed.size))[: N * B].reshape(N, B)
    lens = np.full(N, B, np.int32)

    # Production (guarded) path: the public wrapper slices into separate
    # <= 2-group jit executions (the r5 containment; the old lax.map
    # super-groups turned out NOT to isolate the bug — see EVOLUTION.md).
    dense_ok, counts_ok, errs_ok, _ = ep.encode_blocks_variable_codes_tpu(
        blocks, jnp.asarray(lens), spec, B,
        group=group, cell=cell, seg=seg, chunk=chunk,
    )
    ok_np = np.asarray(dense_ok)
    assert not np.asarray(errs_ok).any()

    # Unguarded: one program with all G = 4 grid groups (the bug shape).
    sub = group // 128
    G = N // group
    slots = B + cell
    n_chunks = -(-slots // chunk)
    total = n_chunks * chunk
    R = 4096 + chunk
    x = blocks.astype(jnp.int32)
    x = x.reshape(G, sub, 128, B).transpose(0, 3, 1, 2)
    x = jnp.concatenate(
        [x, jnp.zeros((G, total - B, sub, 128), jnp.int32)], axis=1
    )
    xs = x.reshape(G, n_chunks, chunk, sub, 128).transpose(1, 0, 2, 3, 4)
    l = jnp.asarray(lens).reshape(G, 1, sub, 128)
    codes, errs = ep._scan_chunks(
        xs, l, G, sub, n_chunks, chunk, cell, seg,
        ep._clamp_sseg(None, cell), spec_key, R, total,
        False,
    )
    dense_g4, counts_g4, _, _ = ep._compact_grouped_codes(
        codes, errs, G, total, group, N
    )
    g4_np = np.asarray(dense_g4)

    nbad = int((g4_np != ok_np).sum())
    if nbad:
        print(f"G={G} direct: WRONG ({nbad} slots); sliced: ok — "
              f"bug REPRODUCED, keep the separate-execution slicing")
        return 0
    print(f"G={G} direct: ok — BEHAVIOR CHANGED (the r5 reproducing "
          f"shape now compiles correctly; consider retiring the "
          f"batch slicing after a broader arbiter sweep)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
