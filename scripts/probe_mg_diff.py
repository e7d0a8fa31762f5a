"""Where does the multi-group chunked output diverge?  Encodes the same
group content at G=2 (known good) and G=G_BAD, unpacks block 0's 12-bit
codes, and reports the first differing code ordinal mapped back to the
input byte position (code i is emitted at the i-th dictionary miss)."""

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


def codes12(buf: bytes):
    out = []
    acc = bit = 0
    for b in buf:
        acc |= b << bit
        bit += 8
        if bit >= 12:
            out.append(acc & 0xFFF)
            acc >>= 12
            bit -= 12
    return out


def main():
    enable_compilation_cache()
    spec = LzwSpec.fixed(Endianness.LITTLE)
    GBAD = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    B = 4096
    grp = ep.GROUP_CHUNKED

    tokyo = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    one = np.frombuffer(
        (tokyo * (grp * B // len(tokyo) + 1))[: grp * B], np.uint8
    ).reshape(grp, B)

    exp = oracle.encode_bytes(one[0].tobytes(), spec)
    ecodes = codes12(exp)

    for G in (2, GBAD):
        blocks = np.tile(one, (G, 1))
        db = jnp.asarray(blocks)
        dl = jnp.full((G * grp,), B, jnp.int32)
        np.asarray(db[0, :4])
        pay, ln = ep.encode_blocks_fixed_tpu(
            db, dl, B, chunked=True, chunk=2048
        )
        got = np.asarray(pay)[0, : int(np.asarray(ln)[0])].tobytes()
        gcodes = codes12(got)
        if got == exp:
            print(f"G={G}: block 0 exact ({len(gcodes)} codes)")
            continue
        n = min(len(gcodes), len(ecodes))
        first = next(
            (i for i in range(n) if gcodes[i] != ecodes[i]), n
        )
        print(f"G={G}: {len(gcodes)} codes vs oracle {len(ecodes)}; "
              f"first diff at code {first}: got {gcodes[first:first+6]} "
              f"want {ecodes[first:first+6]}")


if __name__ == "__main__":
    main()
