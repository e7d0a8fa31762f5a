"""Block-parallel LZW over a TPU device mesh.

The reference is single-threaded by construction (`SURVEY.md` §2.4): LZW's
dictionary state chains every byte to every previous byte.  This module breaks
the chain at block boundaries — semantically identical to the reference's own
dictionary resets (`encoder.rs:330-333`) — and shards blocks data-parallel
over a `jax.sharding.Mesh` with `shard_map`, gathering compressed payloads in
submission order into the LZWT container (`lzw_tpu.parallel.framing`).

All device work is batched and statically shaped: blocks are padded to the
block size, the batch is padded to a multiple of the mesh size, and compressed
payloads live in a [N, packed_bound] matrix with a length vector — the
standard XLA answer to ragged outputs.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from lzw_tpu.ops import bitpack, decode as _decode, encode as _encode
from lzw_tpu.parallel import framing
from lzw_tpu.spec import (
    LzwSpec,
    MissingClearCodeError,
    TruncatedStreamError,
    UnexpectedCodeError,
)

__all__ = ["BlockParallelCodec", "default_mesh", "local_mesh"]

DEFAULT_BLOCK_SIZE = 1 << 16
# The fixed flavor freezes its dictionary after 4096 entries
# (`encoder.rs:645-647`), so long streams drag a stale dictionary; small
# blocks re-learn and usually compress BETTER (-24% on the image corpus at
# 4 KiB vs the reference single stream).  4 KiB is also the Pallas kernel's
# native device block.
DEFAULT_FIXED_BLOCK_SIZE = 1 << 12


from lzw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def default_mesh(axis: str = "data") -> Mesh:
    """All local devices on one data-parallel axis."""
    return Mesh(np.array(jax.devices()), (axis,))


def local_mesh(axis: str = "data") -> Mesh:
    """This process's addressable devices only (multi-process safe)."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def _read_exact(src, n: int) -> bytes:
    """Read exactly n bytes unless EOF (short reads happen on pipes/sockets)."""
    parts = []
    got = 0
    while got < n:
        chunk = src.read(n - got)
        if not chunk:
            break
        parts.append(chunk)
        got += len(chunk)
    return b"".join(parts)


class BlockParallelCodec:
    """Container-format codec sharding independent blocks over a mesh.

    Compressed-size budget: each block restarts the dictionary, so block-mode
    output is bounded by the reference's single-stream output plus one
    restart's worth of ramp-up per block plus the container framing — the
    budget called out in `SURVEY.md` §2.4.
    """

    def __init__(
        self,
        spec: LzwSpec,
        block_size: int | None = None,
        mesh: Mesh | None = None,
        axis: str = "data",
        use_pallas: bool | None = None,
        verify: bool | None = None,
    ):
        spec.validate()
        if block_size is None:
            block_size = (
                DEFAULT_BLOCK_SIZE if spec.variable else DEFAULT_FIXED_BLOCK_SIZE
            )
        if block_size <= 0:
            raise ValueError("block_size must be positive")
        self.spec = spec
        self.block_size = block_size
        self.axis = axis
        self.mesh = mesh if mesh is not None else default_mesh(axis)
        self._packed_bound = _encode.packed_bound(block_size, spec)
        # The Pallas lockstep kernels are the TPU fast path (the lax scan is
        # ~100x slower there, see scripts/probe_tpu.py); XLA:CPU runs the lax
        # path, which is what the virtual-device test mesh exercises.
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" or any(
                d.platform == "tpu" for d in jax.devices()
            )
        from lzw_tpu.kernels.encode_pallas import CELL as _CELL

        self._on_tpu = use_pallas
        # The encode kernels serve any block size that is a whole number of
        # streaming cells (single-launch at <= 4 KiB, the chunked driver
        # beyond); the device decode kernels cover offsets up to the 17-bit
        # descriptor payload (128 KiB — two-plane tables past 4 KiB, so the
        # default 64 KiB variable container decodes on the chip too).
        from lzw_tpu.kernels.decode_pallas import MAX_BLOCK as _DEC_MAX

        self.use_pallas = use_pallas and block_size % _CELL == 0
        self._pallas_decode_ok = self.use_pallas and block_size <= _DEC_MAX
        # Round-trip self-check of one sampled block per encode batch.  On
        # by default whenever the hardware kernels are in the path: with
        # shape-triggered miscompiles worked around in this pipeline
        # (EVOLUTION.md "Hardware miscompile log"), a NEW shape computing
        # garbage should raise VerificationError, not ship bad payloads.
        # Costs one host-side block decode (~1 block) per encode() call.
        self.verify = self.use_pallas if verify is None else bool(verify)

        ax = self.axis

        def encode_one(block, n_valid):
            res = _encode.encode_block(
                block, n_valid, self.spec, fix_eoi_width=True
            )
            buf, n_bytes = bitpack.pack_codes_jax(
                res["codes"], res["widths"], self.spec.endianness,
                out_bytes=self._packed_bound,
            )
            return buf, n_bytes, res["error"], res["error_code"]

        def decode_one(comp, n_valid):
            res = _decode.decode_block(
                comp, n_valid, self.spec, out_bound=self.block_size
            )
            return (res["out"], res["total_len"], res["error"],
                    res["error_code"])

        # check_vma=False: the codec scan carries start as replicated
        # constants (zeros) and become device-varying; this is pure data
        # parallelism with no cross-device communication, so the varying-
        # manual-axes check is safely skipped.
        self._encode_batch = jax.jit(
            _shard_map(
                jax.vmap(encode_one),
                mesh=self.mesh,
                in_specs=(P(ax), P(ax)),
                out_specs=(P(ax), P(ax), P(ax), P(ax)),
                check_vma=False,
            )
        )
        self._decode_batch = jax.jit(
            _shard_map(
                jax.vmap(decode_one),
                mesh=self.mesh,
                in_specs=(P(ax), P(ax)),
                out_specs=(P(ax), P(ax), P(ax), P(ax)),
                check_vma=False,
            )
        )

    # ---- public API ----------------------------------------------------------

    def encode(self, data: bytes) -> bytes:
        """Compress to the LZWT container."""
        data = bytes(data)
        n_blocks = math.ceil(len(data) / self.block_size) if data else 0
        if n_blocks == 0:
            return framing.pack_frame(self.spec, self.block_size, 0, [])

        # On a TPU host with a non-kernel block size, the threaded native
        # runtime beats the XLA scan path by orders of magnitude (the lax
        # codec exists for portability/virtual-mesh tests, not speed).
        if self._on_tpu and not self.use_pallas and self._native() is not None:
            payloads = self._native().encode_blocks(
                data, self.spec, self.block_size
            )
            return framing.pack_frame(
                self.spec, self.block_size, len(data), payloads
            )

        N = self._pad_rows(n_blocks)
        bs = self.block_size
        blocks = np.zeros((N, bs), np.uint8)
        lens = np.zeros(N, np.int32)
        arr = np.frombuffer(data, np.uint8)
        full = len(data) // bs
        blocks[:full] = arr[: full * bs].reshape(full, bs)
        lens[:full] = bs
        rem = len(data) - full * bs
        if rem:
            blocks[full, :rem] = arr[full * bs :]
            lens[full] = rem

        if self.use_pallas:
            from lzw_tpu.kernels import encode_pallas as _ep, schedule as _sched
            from lzw_tpu.spec import Endianness

            grp = _ep.group_for(self.block_size)
            if N % grp != 0:
                pad = ((N + grp - 1) // grp) * grp - N
                blocks = np.concatenate(
                    [blocks, np.zeros((pad, self.block_size), np.uint8)]
                )
                lens = np.concatenate([lens, np.zeros(pad, np.int32)])
            little = self.spec.endianness is Endianness.LITTLE
            if self.spec.variable:
                dense, counts, errs, err_codes = (
                    _ep.encode_blocks_variable_codes_tpu(
                        jnp.asarray(blocks), jnp.asarray(lens), self.spec,
                        self.block_size, compact="stage",
                    )
                )
                errs = np.asarray(errs)
                # Pack on device: only payload bytes cross the host link.
                bufs_d, nb_d = _sched.pack_variable_device(
                    dense, counts, self.spec, fix_eoi=True
                )
                bufs = np.asarray(bufs_d[:n_blocks])
                n_bytes = np.asarray(nb_d[:n_blocks])
            else:
                bufs, n_bytes = _ep.encode_blocks_fixed_tpu(
                    jnp.asarray(blocks), jnp.asarray(lens), self.block_size,
                    little=little, compact="stage",
                )
                errs = np.zeros(n_blocks, np.int32)
                err_codes = errs
        else:
            bufs, n_bytes, errs, err_codes = self._encode_batch(
                jnp.asarray(blocks), jnp.asarray(lens)
            )
        errs = np.asarray(errs)[:n_blocks]
        if errs.any():
            i = int(np.argmax(errs != 0))
            raise UnexpectedCodeError(
                int(np.asarray(err_codes)[i]), self.spec.code_size
            )
        bufs = np.asarray(bufs)
        n_bytes = np.asarray(n_bytes)
        payloads = [bufs[i, : n_bytes[i]].tobytes() for i in range(n_blocks)]
        if self.verify and payloads:
            self._verify_sample(data, payloads)
        return framing.pack_frame(self.spec, self.block_size, len(data), payloads)

    def _verify_sample(self, data: bytes, payloads: list[bytes]) -> None:
        """Decode-check the largest payload of the batch against its source.

        The largest payload exercises the widest table/width range; the
        check decodes it on the host (native runtime when available, the
        scalar oracle otherwise) and raises :class:`VerificationError` on
        any mismatch.
        """
        from lzw_tpu.spec import LzwError, VerificationError

        i = max(range(len(payloads)), key=lambda k: len(payloads[k]))
        bs = self.block_size
        expect = data[i * bs : (i + 1) * bs]
        rt = self._native()
        try:
            if rt is not None:
                got = rt.decode(payloads[i], self.spec)
            else:
                from lzw_tpu.ops import reference as _oracle

                got = _oracle.decode_bytes(payloads[i], self.spec)
        except LzwError as exc:
            raise VerificationError(i, f"decode failed: {exc}") from exc
        if got != expect:
            k = next(
                (j for j, (a, b) in enumerate(zip(got, expect)) if a != b),
                min(len(got), len(expect)),
            )
            raise VerificationError(
                i, f"{len(got)}/{len(expect)} bytes, first diff at {k}"
            )

    def decode(self, container: bytes) -> bytes:
        """Decompress an LZWT container (order-preserving gather)."""
        header, payloads = framing.parse_frame(bytes(container))
        # Wire-equivalence, not dataclass equality: any spec constructor that
        # names the same byte format decodes the container (VERDICT r1 #10).
        if not header.spec.wire_equivalent(self.spec):
            raise framing.FramingError(
                f"container spec {header.spec} != codec spec {self.spec}"
            )
        if header.n_blocks == 0:
            return b""

        if self.spec.variable and self._pallas_decode_ok:
            out = self._decode_variable_device(header, payloads)
            if out is not None:
                return out
            # Non-strict stream (foreign early-CLEAR data): the threaded
            # native runtime is the fastest route for heavily-spliced
            # streams (the host epoch parse scales with CLEAR count);
            # without it, resegment at the CLEARs and decode the strict
            # per-epoch sub-streams on the device (`decoder.rs:222-227`
            # parity via kernels/nonstrict.py — measured as the
            # tpu-nonstrict rows in benchmarks/results_r4.jsonl).
            if self._native() is not None:
                out = self._native().decode_blocks(
                    [bytes(p) for p in payloads], self.spec, self.block_size
                )
            else:
                out = self._decode_variable_nonstrict(header, payloads)
            if len(out) != header.orig_size:
                raise framing.FramingError(
                    f"decoded {len(out)} bytes, container claims "
                    f"{header.orig_size}"
                )
            return out

        # No device decode path (non-cell block size, or blocks too big for
        # the kernels' packed 12-bit src fields): threaded native runtime.
        if (self._on_tpu and not self._pallas_decode_ok
                and self._native() is not None):
            out = self._native().decode_blocks(
                [bytes(p) for p in payloads], self.spec, self.block_size
            )
            if len(out) != header.orig_size:
                raise framing.FramingError(
                    f"decoded {len(out)} bytes, container claims "
                    f"{header.orig_size}"
                )
            return out

        use_pallas_decode = (
            self._pallas_decode_ok
            and not self.spec.variable
            and self._native() is not None
        )
        N = self._pad_rows(header.n_blocks)
        comp_bound = max(self._packed_bound, max(len(p) for p in payloads))
        if use_pallas_decode:
            from lzw_tpu.kernels.decode_pallas import CELL, GROUP

            # Size the payload matrix by the ACTUAL longest payload, not the
            # worst-case packed bound: the pass-1 kernel's VMEM tables scale
            # with the code-slot count S, and the worst-case bound at a
            # 32-sublane group OOMs the chip (seen live: S=4608 tables are
            # 75 MB each).  When the actual S is still large (incompressible
            # blocks), halve the group until the S x sublane footprint fits.
            comp_bound = ((max(len(p) for p in payloads) + 2) // 3) * 3
            s_est = -(-(comp_bound // 3 * 2) // CELL) * CELL
            group = GROUP
            while group > 128 and (group // 128) * s_est > 80_000:
                group //= 2
            if N % group != 0:
                N = ((N + group - 1) // group) * group
        comp = np.zeros((N, comp_bound), np.uint8)
        clens = np.zeros(N, np.int32)
        for i, p in enumerate(payloads):
            comp[i, : len(p)] = np.frombuffer(p, np.uint8)
            clens[i] = len(p)

        if use_pallas_decode:
            from lzw_tpu.kernels.decode_pallas import decode_pass1_fixed_tpu
            from lzw_tpu.spec import Endianness

            words, _, totals, errs, err_codes, _pair = decode_pass1_fixed_tpu(
                jnp.asarray(comp), jnp.asarray(clens), self.block_size,
                little=self.spec.endianness is Endianness.LITTLE,
                group=group,
            )
            n = header.n_blocks
            errs = np.asarray(errs)[:n]
            if errs.any():
                i = int(np.argmax(errs != 0))
                raise UnexpectedCodeError(int(np.asarray(err_codes)[i]))
            outs, tlens = self._native().apply_words(
                np.asarray(words)[:n], self.block_size,
                codes=np.asarray(_pair[1])[:n],
            )
            parts = [outs[i, : tlens[i]].tobytes() for i in range(n)]
            out = b"".join(parts)
            if len(out) != header.orig_size:
                raise framing.FramingError(
                    f"decoded {len(out)} bytes, container claims "
                    f"{header.orig_size}"
                )
            return out

        outs, tlens, errs, err_codes = self._decode_batch(
            jnp.asarray(comp), jnp.asarray(clens)
        )
        errs = np.asarray(errs)[: header.n_blocks]
        if errs.any():
            i = int(np.argmax(errs != 0))
            self._raise_decode(int(errs[i]), int(np.asarray(err_codes)[i]))
        outs = np.asarray(outs)
        tlens = np.asarray(tlens)
        parts = [outs[i, : tlens[i]].tobytes() for i in range(header.n_blocks)]
        out = b"".join(parts)
        if len(out) != header.orig_size:
            raise framing.FramingError(
                f"decoded {len(out)} bytes, container claims {header.orig_size}"
            )
        return out

    def _decode_variable_nonstrict(self, header, payloads):
        """Foreign early-CLEAR blocks: host resegmentation at the CLEARs +
        strict per-epoch device decode (`kernels/nonstrict.py`)."""
        from lzw_tpu.kernels.nonstrict import (
            decode_variable_nonstrict_device,
        )

        n = header.n_blocks
        pb = max(len(p) for p in payloads)
        mat = np.zeros((n, pb), np.uint8)
        plens = np.zeros(n, np.int64)
        for i, p in enumerate(payloads):
            mat[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        parts = decode_variable_nonstrict_device(
            mat, plens, self.spec, self.block_size
        )
        return b"".join(parts)

    def _decode_variable_device(self, header, payloads):
        """Strict-schedule device decode; None when any block is non-strict.

        With the native runtime loaded, pass 2 is its threaded
        ``apply_words`` (the fastest measured route, the tpu-hybrid rows);
        without it, pass 2 is the all-device epoch-split chain walk
        (tpu-hbm-64k rows) — the container has no hard native dependency.
        """
        from lzw_tpu.kernels.decode_pallas import (
            GROUP_VAR, decode_pass1_variable_tpu,
            decode_variable_all_device,
        )

        n = header.n_blocks
        N = ((n + GROUP_VAR - 1) // GROUP_VAR) * GROUP_VAR
        pb = max(len(p) for p in payloads)
        mat = np.zeros((N, pb), np.uint8)
        plens = np.zeros(N, np.int32)
        for i, p in enumerate(payloads):
            mat[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        rt = self._native()
        if rt is not None:
            words, counts, totals, errs, err_codes, strict, _ = (
                decode_pass1_variable_tpu(
                    mat, plens, self.spec, self.block_size
                )
            )
            if not strict[:n].all():
                return None
            errs = np.asarray(errs)[:n]
            if errs.any():
                i = int(np.argmax(errs != 0))
                self._raise_decode(
                    _decode.ERR_UNEXPECTED_CODE,
                    int(np.asarray(err_codes)[i]),
                )
            outs, tlens = rt.apply_words(
                np.asarray(words)[:n], self.block_size
            )
            out = b"".join(
                outs[i, : tlens[i]].tobytes() for i in range(n)
            )
        else:
            dev, totals, errs, err_codes, strict = (
                decode_variable_all_device(
                    mat, plens, self.spec, self.block_size
                )
            )
            if not strict[:n].all():
                return None
            errs = np.asarray(errs)[:n]
            if errs.any():
                i = int(np.argmax(errs != 0))
                self._raise_decode(
                    _decode.ERR_UNEXPECTED_CODE,
                    int(np.asarray(err_codes)[i]),
                )
            outs = np.asarray(dev)
            tlens = np.asarray(totals)
            out = b"".join(
                outs[i, : tlens[i]].tobytes() for i in range(n)
            )
        if len(out) != header.orig_size:
            raise framing.FramingError(
                f"decoded {len(out)} bytes, container claims "
                f"{header.orig_size}"
            )
        return out

    # ---- streaming container API ----------------------------------------------

    def encode_stream(self, src, dst, batch_blocks: int = 256) -> int:
        """Compress ``src`` into ``dst`` as an LZWS record stream.

        Memory is O(batch): ``batch_blocks`` blocks are read, encoded on the
        device/mesh as one batch, and written as records before the next
        batch is read — the container-level analog of the reference's
        streaming Read->Write API, for inputs that don't fit in host RAM.
        Returns the number of *uncompressed* bytes consumed.
        """
        framing.write_stream_header(dst, self.spec, self.block_size)
        total = 0
        while True:
            chunk = _read_exact(src, self.block_size * batch_blocks)
            if not chunk:
                break
            total += len(chunk)
            container = self.encode(chunk)
            _, payloads = framing.parse_frame(container)
            for p in payloads:
                framing.write_stream_record(dst, bytes(p))
        framing.write_stream_end(dst, total)
        return total

    def decode_stream(self, src, dst, batch_blocks: int = 256) -> int:
        """Decompress an LZWS record stream; returns bytes written.

        Reads records in batches, decodes each batch on the device/mesh, and
        writes plaintext immediately — bounded memory for any stream length.
        Only the final block of the stream may be shorter than block_size
        (the layout :func:`framing.write_stream_header` documents).
        """
        spec, block_size = framing.read_stream_header(src)
        if not spec.wire_equivalent(self.spec):
            raise framing.FramingError(
                f"stream spec {spec} != codec spec {self.spec}"
            )
        if block_size != self.block_size:
            raise framing.FramingError(
                f"stream block size {block_size} != codec {self.block_size}"
            )
        written = 0
        blocks_done = 0
        batch: list[bytes] = []
        orig_size = None

        def flush(records: list[bytes], final: bool):
            nonlocal written, blocks_done
            if not records:
                return
            if final:
                sub_orig = orig_size - blocks_done * self.block_size
            else:
                # Every record with a successor is a full block (only the
                # stream's final block may be short).
                sub_orig = len(records) * self.block_size
            out = self.decode(framing.pack_frame(
                self.spec, self.block_size, sub_orig, records
            ))
            dst.write(out)
            written += len(out)
            blocks_done += len(records)

        while orig_size is None:
            rec = framing.read_stream_record(src)
            if isinstance(rec, int):
                orig_size = rec
                flush(batch, final=True)
            else:
                batch.append(rec)
                # Keep one record in reserve: the last record of the stream
                # may be a short tail block, and only the final flush knows
                # its true size.
                if len(batch) > batch_blocks:
                    flush(batch[:-1], final=False)
                    batch = batch[-1:]
        if written != orig_size:
            raise framing.FramingError(
                f"decoded {written} bytes, stream claims {orig_size}"
            )
        return written

    def decode_range(self, container: bytes, start_block: int,
                     end_block: int) -> bytes:
        """Decode blocks [start_block, end_block) only.

        The per-block length table makes every block independently decodable
        — the framework's checkpoint/resume and fault-isolation story
        (`SURVEY.md` §5): a failed or interrupted decode restarts at any
        block boundary, and random access costs one header parse.
        """
        header, payloads = framing.parse_frame(bytes(container))
        if not 0 <= start_block <= end_block <= header.n_blocks:
            raise IndexError(
                f"block range [{start_block}, {end_block}) outside "
                f"0..{header.n_blocks}"
            )
        if start_block == end_block:
            return b""
        sub_orig = self._range_orig_size(header, start_block, end_block)
        sub = framing.pack_frame(
            self.spec, self.block_size, sub_orig,
            [bytes(p) for p in payloads[start_block:end_block]],
        )
        return self.decode(sub)

    def _range_orig_size(self, header: framing.FrameHeader, lo: int,
                         hi: int) -> int:
        end = min(hi * self.block_size, header.orig_size)
        return max(0, end - lo * self.block_size)

    # ---- helpers -------------------------------------------------------------

    @staticmethod
    def _native():
        """The native runtime, or None when the toolchain is unavailable."""
        try:
            from lzw_tpu.native.runtime import get_runtime

            return get_runtime()
        except Exception:
            return None

    def _pad_rows(self, n: int) -> int:
        """Pad the batch to a multiple of the mesh size (power-of-two steps)."""
        ndev = self.mesh.devices.size
        N = ndev
        while N < n:
            N *= 2
        return N

    @staticmethod
    def _raise_decode(err: int, err_code: int):
        if err == _decode.ERR_UNEXPECTED_CODE:
            raise UnexpectedCodeError(err_code)
        if err == _decode.ERR_MISSING_CLEAR:
            raise MissingClearCodeError()
        if err == _decode.ERR_TRUNCATED:
            raise TruncatedStreamError()
        raise AssertionError(f"unknown decode error kind {err}")
