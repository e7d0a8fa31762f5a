"""Isolated repro: jitted _compact_grouped_codes on synthetic code slots.

Builds a (G, total, sub, 128) slot matrix with a deterministic hole
pattern, runs the jitted compaction+restore, and compares against a numpy
reference.  Usage: probe_mg_compact.py [G] [total]"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep
from lzw_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 6144
    sub, group = 16, 2048
    N = G * group

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 4096, size=(G, total, sub, 128)).astype(np.int32)
    holes = rng.random((G, total, sub, 128)) < 0.5
    vals[holes] = -1
    errs = np.zeros((G, 8, sub, 128), np.int32)

    f = jax.jit(
        lambda c, e: ep._compact_grouped_codes(c, e, G, total, group, N)
    )
    dense, counts, e0, e1 = f(jnp.asarray(vals), jnp.asarray(errs))
    dense, counts = np.asarray(dense), np.asarray(counts)

    # numpy reference
    flat = vals.reshape(G, total, group)
    bad = 0
    for g in range(G):
        for lane in (0, 1, 513, group - 1):
            col = flat[g, :, lane]
            live = col[col >= 0]
            i = g * group + lane
            ok = (counts[i] == len(live)
                  and (dense[i, : len(live)] == live).all()
                  and (dense[i, len(live):] == 0).all())
            if not ok:
                k = np.nonzero(dense[i, : len(live)] != live)[0]
                print(f"g={g} lane={lane}: count {counts[i]} vs {len(live)}"
                      f", first wrong {k[:4].tolist()}")
                bad += 1
    print(f"{'REPRO' if bad else 'no repro'}: {bad} bad columns "
          f"(G={G}, total={total})")


if __name__ == "__main__":
    main()
