"""lzw_tpu — a TPU-native LZW compression framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
Rust reference library salzweg (redwarp/lzw): GIF-style, TIFF-style and fixed
12-bit LZW with bit-exact wire compatibility, plus block-parallel scaling
across TPU chips and hosts that the single-threaded reference never had.
"""

from lzw_tpu.api import (
    FixedCodec,
    GifCodec,
    LzwCodec,
    TiffCodec,
    VariableCodec,
)
from lzw_tpu.spec import (
    CodeSizeError,
    CodeSizeStrategy,
    DecodingError,
    Endianness,
    EncodingError,
    LzwError,
    LzwSpec,
    MissingClearCodeError,
    TruncatedStreamError,
    UnexpectedCodeError,
)

__version__ = "0.1.0"

__all__ = [
    "FixedCodec",
    "GifCodec",
    "LzwCodec",
    "TiffCodec",
    "VariableCodec",
    "CodeSizeError",
    "CodeSizeStrategy",
    "DecodingError",
    "Endianness",
    "EncodingError",
    "LzwError",
    "LzwSpec",
    "MissingClearCodeError",
    "TruncatedStreamError",
    "UnexpectedCodeError",
]
