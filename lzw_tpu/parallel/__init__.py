"""Block-parallel scaling: framing container, shard_map pipeline, multihost."""

from lzw_tpu.parallel.block import BlockParallelCodec
from lzw_tpu.parallel.framing import FrameHeader, pack_frame, parse_frame

__all__ = ["BlockParallelCodec", "FrameHeader", "pack_frame", "parse_frame"]
