"""Hardware probe: chunked-driver multi-group correctness pattern.

Runs the chunked fixed encoder at G groups with every group holding the
SAME block contents, then reports which blocks mismatch the oracle and
whether group g's payloads equal group 0's (content-identical groups must
produce identical bytes).  Usage: probe_multigroup.py [G] [chunk]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lzw_tpu.kernels import encode_pallas as ep
from lzw_tpu.ops import reference as oracle
from lzw_tpu.spec import Endianness, LzwSpec
from lzw_tpu.utils.cache import enable_compilation_cache
from lzw_tpu.utils.corpus import load_tokyo_pixels

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def main():
    enable_compilation_cache()
    spec = LzwSpec.fixed(Endianness.LITTLE)
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    B = 4096
    grp = ep.GROUP_CHUNKED
    N = G * grp

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    one = np.frombuffer(
        (tokyo * (grp * B // len(tokyo) + 1))[: grp * B], np.uint8
    ).reshape(grp, B)
    blocks = np.tile(one, (G, 1))
    db, dl = jnp.asarray(blocks), jnp.full((N,), B, jnp.int32)
    np.asarray(db[0, :4])

    pay, ln = ep.encode_blocks_fixed_tpu(db, dl, B, chunked=True, chunk=chunk)
    pay, ln = np.asarray(pay), np.asarray(ln)

    # Oracle on a few rows of group 0.
    for i in (0, 1, grp - 1):
        exp = oracle.encode_bytes(one[i].tobytes(), spec)
        ok = pay[i, : ln[i]].tobytes() == exp
        print(f"group0 block {i}: oracle {'OK' if ok else 'MISMATCH'}")

    # Cross-group identity: same content must give same bytes.
    for g in range(1, G):
        sl = slice(g * grp, (g + 1) * grp)
        same = (ln[sl] == ln[:grp]).all() and (pay[sl] == pay[:grp]).all()
        if not same:
            bad = np.nonzero(
                (ln[sl] != ln[:grp])
                | (pay[sl] != pay[:grp]).any(axis=1)
            )[0]
            print(f"group {g}: DIFFERS from group 0 at {len(bad)} blocks, "
                  f"first {bad[:8].tolist()}")
        else:
            print(f"group {g}: identical to group 0")


if __name__ == "__main__":
    main()
