"""ctypes bindings and build driver for the native host runtime.

Builds ``lzw_native.cpp`` with the system toolchain on first use (cached in
``native/build/``), then exposes a typed Python API mirroring the device
codecs.  No pybind11: the library is a plain C ABI loaded via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

from lzw_tpu.spec import (
    CodeSizeError,
    Endianness,
    LzwSpec,
    MissingClearCodeError,
    TruncatedStreamError,
    UnexpectedCodeError,
)

__all__ = ["NativeRuntime", "get_runtime", "native_available"]

_SRC = pathlib.Path(__file__).resolve().parent / "lzw_native.cpp"
_BUILD_DIR = pathlib.Path(__file__).resolve().parent / "build"
_LIB = _BUILD_DIR / "liblzw_native.so"

_OK = 0
_ERR_BUF = -1
_ERR_CODE_SIZE = -2
_ERR_UNEXPECTED_ENC = -3
_ERR_UNEXPECTED_DEC = -4
_ERR_MISSING_CLEAR = -5
_ERR_TRUNCATED = -6

_lock = threading.Lock()
_runtime: "NativeRuntime | None" = None
_build_error: Exception | None = None


def _build() -> pathlib.Path:
    """Compile the shared library if missing or stale."""
    _BUILD_DIR.mkdir(exist_ok=True)
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


class NativeRuntime:
    """Host-side codec over the native library."""

    def __init__(self, lib_path: pathlib.Path | None = None):
        path = lib_path or _build()
        lib = ctypes.CDLL(str(path))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        szp = ctypes.POINTER(ctypes.c_size_t)
        ip = ctypes.POINTER(ctypes.c_int)

        lib.lzw_encode.restype = ctypes.c_int
        lib.lzw_encode.argtypes = [
            u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, szp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ip,
        ]
        lib.lzw_decode.restype = ctypes.c_int
        lib.lzw_decode.argtypes = [
            u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, szp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ip,
        ]
        lib.lzw_encode_blocks.restype = ctypes.c_int
        lib.lzw_encode_blocks.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_size_t, u8p, ctypes.c_size_t,
            u32p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ip,
        ]
        lib.lzw_decode_blocks.restype = ctypes.c_int
        lib.lzw_decode_blocks.argtypes = [
            u8p, u32p, u32p, ctypes.c_size_t, u8p, ctypes.c_size_t, u32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ip,
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lzw_apply_words_blocks.restype = ctypes.c_int
        lib.lzw_apply_words_blocks.argtypes = [
            i32p, ctypes.c_size_t, ctypes.c_size_t, u8p, ctypes.c_size_t,
            u32p, ctypes.c_int,
        ]
        self._lib = lib

    # ---- helpers -------------------------------------------------------------

    @staticmethod
    def _spec_args(spec: LzwSpec):
        return (
            spec.code_size,
            0 if spec.endianness is Endianness.LITTLE else 1,
            spec.strategy.increment,
            1 if spec.variable else 0,
        )

    @staticmethod
    def _raise(rc: int, err_code: int, spec: LzwSpec, encoding: bool):
        if rc == _ERR_CODE_SIZE:
            raise CodeSizeError(spec.code_size)
        if rc == _ERR_UNEXPECTED_ENC:
            raise UnexpectedCodeError(err_code, spec.code_size)
        if rc == _ERR_UNEXPECTED_DEC:
            raise UnexpectedCodeError(err_code)
        if rc == _ERR_MISSING_CLEAR:
            raise MissingClearCodeError()
        if rc == _ERR_TRUNCATED:
            raise TruncatedStreamError()
        if rc == _ERR_BUF:
            raise AssertionError("native output buffer undersized (bug)")
        raise AssertionError(f"unknown native rc {rc}")

    @staticmethod
    def _as_u8p(arr: np.ndarray):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    # ---- single-stream API ---------------------------------------------------

    def encode(self, data: bytes, spec: LzwSpec, fix_eoi: bool = False) -> bytes:
        spec.validate()
        src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
        cap = 2 * len(data) + (len(data) // 2048 + 8) * 2 + 16
        out = np.zeros(cap, np.uint8)
        out_len = ctypes.c_size_t(0)
        err = ctypes.c_int(0)
        rc = self._lib.lzw_encode(
            self._as_u8p(src), len(data), self._as_u8p(out), cap,
            ctypes.byref(out_len), *self._spec_args(spec),
            1 if fix_eoi else 0, ctypes.byref(err),
        )
        if rc != _OK:
            self._raise(rc, err.value, spec, encoding=True)
        return out[: out_len.value].tobytes()

    def decode(self, data: bytes, spec: LzwSpec) -> bytes:
        spec.validate()
        src = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
        cap = max(64, 16 * len(data))
        while True:
            out = np.zeros(cap, np.uint8)
            out_len = ctypes.c_size_t(0)
            err = ctypes.c_int(0)
            rc = self._lib.lzw_decode(
                self._as_u8p(src), len(data), self._as_u8p(out), cap,
                ctypes.byref(out_len), *self._spec_args(spec),
                ctypes.byref(err),
            )
            if rc == _ERR_BUF:
                cap *= 4
                continue
            if rc != _OK:
                self._raise(rc, err.value, spec, encoding=False)
            return out[: out_len.value].tobytes()

    # ---- block API -----------------------------------------------------------

    def encode_blocks(
        self, data: bytes, spec: LzwSpec, block_size: int,
        n_threads: int | None = None,
    ) -> list[bytes]:
        """Threaded block-parallel encode; payloads in submission order."""
        spec.validate()
        n_blocks = (len(data) + block_size - 1) // block_size
        if n_blocks == 0:
            return []
        from lzw_tpu.ops.encode import packed_bound

        stride = packed_bound(block_size, spec)
        src = np.frombuffer(data, np.uint8)
        out = np.zeros(n_blocks * stride, np.uint8)
        lengths = np.zeros(n_blocks, np.uint32)
        err = ctypes.c_int(0)
        threads = n_threads or min(os.cpu_count() or 1, 32)
        rc = self._lib.lzw_encode_blocks(
            self._as_u8p(src), len(data), block_size, self._as_u8p(out),
            stride, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n_blocks, *self._spec_args(spec), threads, ctypes.byref(err),
        )
        if rc != _OK:
            self._raise(rc, err.value, spec, encoding=True)
        return [
            out[b * stride : b * stride + lengths[b]].tobytes()
            for b in range(n_blocks)
        ]

    def decode_blocks(
        self, payloads: list[bytes], spec: LzwSpec, block_size: int,
        n_threads: int | None = None,
    ) -> bytes:
        """Threaded block-parallel decode of container payloads."""
        spec.validate()
        n_blocks = len(payloads)
        if n_blocks == 0:
            return b""
        comp = np.frombuffer(b"".join(payloads), np.uint8)
        if comp.size == 0:
            comp = np.zeros(1, np.uint8)
        lens = np.array([len(p) for p in payloads], np.uint32)
        offs = np.zeros(n_blocks, np.uint32)
        np.cumsum(lens[:-1], out=offs[1:])
        out = np.zeros(n_blocks * block_size, np.uint8)
        out_lens = np.zeros(n_blocks, np.uint32)
        err = ctypes.c_int(0)
        threads = n_threads or min(os.cpu_count() or 1, 32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        rc = self._lib.lzw_decode_blocks(
            self._as_u8p(comp), offs.ctypes.data_as(u32p),
            lens.ctypes.data_as(u32p), n_blocks, self._as_u8p(out),
            block_size, out_lens.ctypes.data_as(u32p),
            *self._spec_args(spec), threads, ctypes.byref(err),
        )
        if rc != _OK:
            self._raise(rc, err.value, spec, encoding=False)
        return b"".join(
            out[b * block_size : b * block_size + out_lens[b]].tobytes()
            for b in range(n_blocks)
        )


    def apply_words(
        self, words: np.ndarray, block_size: int, n_threads: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Resolve TPU pass-1 copy lists: words i32[N, S] -> bytes, lengths.

        Returns (out u8[N, block_size], lengths u32[N]).
        """
        words = np.ascontiguousarray(words, np.int32)
        n_blocks, stride = words.shape
        out = np.zeros(n_blocks * block_size, np.uint8)
        lengths = np.zeros(n_blocks, np.uint32)
        threads = n_threads or min(os.cpu_count() or 1, 32)
        rc = self._lib.lzw_apply_words_blocks(
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), stride,
            n_blocks, self._as_u8p(out), block_size,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), threads,
        )
        if rc != _OK:
            raise UnexpectedCodeError(-1)  # corrupt copy list
        return out.reshape(n_blocks, block_size), lengths


def native_available() -> bool:
    try:
        return get_runtime() is not None
    except Exception:
        return False


def get_runtime() -> NativeRuntime:
    """Build-once, process-wide native runtime."""
    global _runtime, _build_error
    with _lock:
        if _runtime is not None:
            return _runtime
        if _build_error is not None:
            raise _build_error
        try:
            _runtime = NativeRuntime()
        except Exception as e:  # toolchain missing etc.
            _build_error = e
            raise
        return _runtime
