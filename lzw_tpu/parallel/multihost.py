"""Multi-host (DCN) scaling helpers.

The TPU-native analog of a distributed communication backend (`SURVEY.md`
§2.4): process-group initialisation via ``jax.distributed``, a global mesh
over every chip in the slice, and ordered host-side assembly of per-host
compressed payloads with ``multihost_utils.process_allgather`` (which rides
DCN between hosts).  Intra-host block parallelism stays in
:class:`lzw_tpu.parallel.block.BlockParallelCodec` over the host's local
devices; this layer shards *block ranges* across processes.

Single-process environments degrade gracefully: every helper works with
``jax.process_count() == 1`` (the CI configuration), so the code path is
exercised everywhere and only the DCN legs need a real pod.
"""

from __future__ import annotations

import math

import numpy as np

import jax

from lzw_tpu.parallel import framing
from lzw_tpu.parallel.block import BlockParallelCodec
from lzw_tpu.spec import LzwSpec

__all__ = ["initialize", "MultiHostBlockCodec"]


def initialize(**kwargs) -> None:
    """Initialise the JAX process group (no-op when already initialised or
    single-process).  Pass-through of ``jax.distributed.initialize`` kwargs."""
    if jax.process_count() > 1:
        return  # already initialised by the runtime
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Single-process / already-initialised environments.
        pass


def _process_slice(n_blocks: int, process_id: int, process_count: int):
    """Contiguous block range owned by one process (balanced split)."""
    per = math.ceil(n_blocks / process_count)
    lo = min(process_id * per, n_blocks)
    hi = min(lo + per, n_blocks)
    return lo, hi


class MultiHostBlockCodec:
    """Block-parallel codec sharding block ranges across hosts.

    Each process encodes/decodes its contiguous range of blocks on its local
    devices, then payload bytes are exchanged with ``process_allgather`` so
    every host can assemble the full container in submission order (no
    single-host serialization point: the gather is all-to-all over DCN).
    """

    def __init__(self, spec: LzwSpec, block_size: int = 1 << 16,
                 local_codec: BlockParallelCodec | None = None):
        self.spec = spec
        self.block_size = block_size
        self.local = local_codec or BlockParallelCodec(spec, block_size)

    # ---- encode --------------------------------------------------------------

    def encode(self, data: bytes) -> bytes:
        """Compress; every process must pass identical ``data``.

        For truly host-sharded inputs use :meth:`encode_local_shard` with
        per-host data and matching offsets.
        """
        n_proc = jax.process_count()
        if n_proc == 1:
            return self.local.encode(data)
        n_blocks = math.ceil(len(data) / self.block_size)
        lo, hi = _process_slice(n_blocks, jax.process_index(), n_proc)
        local_payloads = self._encode_blocks(data, lo, hi)
        all_payloads = _allgather_payloads(local_payloads, n_blocks)
        return framing.pack_frame(
            self.spec, self.block_size, len(data), all_payloads
        )

    def _encode_blocks(self, data: bytes, lo: int, hi: int) -> list[bytes]:
        if lo >= hi:
            return []
        chunk = data[lo * self.block_size : hi * self.block_size]
        sub = self.local.encode(chunk)
        _, payloads = framing.parse_frame(sub)
        return [bytes(p) for p in payloads]

    # ---- decode --------------------------------------------------------------

    def decode(self, container: bytes) -> bytes:
        n_proc = jax.process_count()
        if n_proc == 1:
            return self.local.decode(container)
        header, payloads = framing.parse_frame(container)
        lo, hi = _process_slice(header.n_blocks, jax.process_index(), n_proc)
        local_out = b"" if lo >= hi else self.local.decode(
            framing.pack_frame(
                self.spec, self.block_size,
                self._range_orig_size(header, lo, hi),
                [bytes(p) for p in payloads[lo:hi]],
            )
        )
        parts = _allgather_payloads([local_out], header.n_blocks)
        return b"".join(parts)[: header.orig_size]

    def _range_orig_size(self, header: framing.FrameHeader, lo: int, hi: int):
        full = header.orig_size
        end = min(hi * self.block_size, full)
        return max(0, end - lo * self.block_size)


def _allgather_payloads(local: list[bytes], order_hint: int) -> list[bytes]:
    """Exchange variable-length byte payloads across processes, order kept.

    Pads to the global max length (one DCN all-gather of a [P, max] u8 array
    plus a [P, k] length table) and re-slices on the host.
    """
    from jax.experimental import multihost_utils

    k = max(len(local), 1)
    max_len = max((len(p) for p in local), default=0)
    lens = np.array([len(p) for p in local] + [0] * (k - len(local)), np.int64)
    # Global max via allgather of scalars.
    all_lens = multihost_utils.process_allgather(lens)
    gmax = int(all_lens.max()) if all_lens.size else 0
    buf = np.zeros((k, max(gmax, 1)), np.uint8)
    for i, p in enumerate(local):
        buf[i, : len(p)] = np.frombuffer(p, np.uint8)
    all_bufs = multihost_utils.process_allgather(buf)
    all_bufs = all_bufs.reshape(-1, all_bufs.shape[-1])
    flat_lens = all_lens.reshape(-1)
    out = []
    for i in range(flat_lens.shape[0]):
        if flat_lens[i] or len(out) < order_hint:
            out.append(all_bufs[i, : flat_lens[i]].tobytes())
    return out[:order_hint] if order_hint else out
