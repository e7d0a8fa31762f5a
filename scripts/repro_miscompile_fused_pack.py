"""Standalone repro: fused encode+pack single-jit miscompile (r3 find).

Wrapping `encode_blocks_variable_codes_tpu` + `pack_variable_device` in
ONE `jax.jit` mis-packs the wire bytes from ~the 9-bit width segment
onward on every row, while the dense code matrix from the same program
is bit-exact; an `optimization_barrier` does not help; each stage as its
own program is byte-exact.  Production composition is therefore the
two-dispatch `encode_pallas.encode_pack_variable_tpu`.

Expected while the bug lives: "fused: WRONG (...); split: ok" (exit 0).
"fused: ok" means the toolchain fixed it (scripts/canary_miscompiles.py).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep, schedule as sc
from lzw_tpu.spec import LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    spec = LzwSpec.gif(7)
    # Pin the ORIGINAL r3 bug configuration (group 2048, chunked cell 512):
    # the r5 production defaults moved to group 1024 / cell 64, which
    # changes the traced program and no longer triggers — the repro tracks
    # the documented shape, not whatever the current defaults are.
    B, N = 1 << 16, 2048
    kw = dict(group=2048, cell=512, seg=512, sseg=64, chunk=2048)
    rng = np.random.default_rng(0)
    seed = jnp.asarray(rng.integers(0, 128, 1 << 22).astype(np.uint8))
    np.asarray(seed[:4])
    blocks = jnp.tile(seed, -(-(N * B) // seed.size))[: N * B].reshape(N, B)
    lens = jnp.full((N,), B, jnp.int32)

    def fused(b, l):
        dense, counts, errs, ec = ep.encode_blocks_variable_codes_tpu(
            b, l, spec, B, **kw
        )
        bufs, nb = sc.pack_variable_device(dense, counts, spec, fix_eoi=True)
        return bufs, nb

    bufs_f, nb_f = jax.jit(fused)(blocks, lens)
    f_np, nf_np = np.asarray(bufs_f), np.asarray(nb_f)

    bufs_s, nb_s, _, _ = ep.encode_pack_variable_tpu(
        blocks, lens, spec, B, **kw
    )
    s_np, ns_np = np.asarray(bufs_s), np.asarray(nb_s)

    same_len = (nf_np == ns_np).all()
    nbad = int(
        sum((f_np[i, : ns_np[i]] != s_np[i, : ns_np[i]]).sum()
            for i in range(0, N, 97))
    )
    print(f"fused: {'ok' if same_len and nbad == 0 else f'WRONG ({nbad} bytes on sampled rows)'}; "
          f"split: ok (production reference)")
    return 0 if (not same_len or nbad > 0) else 1


if __name__ == "__main__":
    sys.exit(main())
