"""Native C++ codec bindings (ctypes).

Builds lz4r.cpp on first import (cached by source hash) and exposes the block
codec + xxh32. This is the host-side engine: conformance oracle for the JAX
device kernels, the low-latency sync path (reference analog: sync/writer.go),
and the frame-layer hasher.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

from .. import errors as zerr

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lz4r.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")

_lib = None
_lock = threading.Lock()


def _build_lib() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"liblz4r-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fvisibility=hidden", "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"native codec build failed: {e.stderr.decode(errors='replace')}"
        ) from e
    os.replace(tmp, so_path)
    return so_path


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build_lib())
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lz4r_compress_bound.restype = ctypes.c_int
        lib.lz4r_compress_bound.argtypes = [ctypes.c_int]
        lib.lz4r_compress.restype = ctypes.c_int
        lib.lz4r_compress.argtypes = [
            u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
        ]
        lib.lz4r_decompress.restype = ctypes.c_int
        lib.lz4r_decompress.argtypes = [
            u8p, ctypes.c_int, u8p, ctypes.c_int, u8p, ctypes.c_int,
        ]
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lz4r_compress_batch.argtypes = [
            u8p, i64p, i32p, ctypes.c_int, u8p, i64p, ctypes.c_int32, i32p,
            ctypes.c_int,
        ]
        lib.lz4r_decompress_batch.argtypes = [
            u8p, i64p, i32p, ctypes.c_int, u8p, i64p, ctypes.c_int32, i32p,
        ]
        ppu8 = ctypes.POINTER(ctypes.c_char_p)
        lib.lz4r_decompress_batch_ptrs.argtypes = [
            ppu8, i32p, ctypes.c_int, u8p, i64p, ctypes.c_int32, i32p,
        ]
        lib.lz4r_compress_batch_ptrs.argtypes = [
            ppu8, i32p, ctypes.c_int, u8p, i64p, ctypes.c_int32, i32p,
            ctypes.c_int,
        ]
        lib.lz4r_dict_create.restype = ctypes.c_void_p
        lib.lz4r_dict_create.argtypes = [u8p, ctypes.c_int]
        lib.lz4r_dict_compress.restype = ctypes.c_int
        lib.lz4r_dict_compress.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.lz4r_dict_free.argtypes = [ctypes.c_void_p]
        lib.lz4r_xxh32.restype = ctypes.c_uint32
        lib.lz4r_xxh32.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
        lib.lz4r_xxh32_create.restype = ctypes.c_void_p
        lib.lz4r_xxh32_create.argtypes = [ctypes.c_uint32]
        lib.lz4r_xxh32_reset.argtypes = [ctypes.c_void_p]
        lib.lz4r_xxh32_update.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
        lib.lz4r_xxh32_digest.restype = ctypes.c_uint32
        lib.lz4r_xxh32_digest.argtypes = [ctypes.c_void_p]
        lib.lz4r_xxh32_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:  # pragma: no cover
        return False


def _as_u8p(buf) -> ctypes.POINTER(ctypes.c_uint8):
    """Zero-copy pointer view of a bytes-like buffer (the C side never
    mutates inputs). Callers must keep `buf` alive across the call — all
    uses here are synchronous."""
    if buf is None or len(buf) == 0:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    if isinstance(buf, np.ndarray):
        return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    view = np.frombuffer(buf, dtype=np.uint8)  # no copy, read-only ok
    return view.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress_bound(src_size: int) -> int:
    return _load().lz4r_compress_bound(src_size)


def compress(src: bytes, level: int = 1, dict_: bytes | None = None) -> bytes:
    """Compress one LZ4 block. Raises ErrCompress when incompressible (the
    caller stores the block raw — reference: blk/blk.go:75-92)."""
    lib = _load()
    cap = lib.lz4r_compress_bound(len(src))
    dst = np.empty(cap, dtype=np.uint8)
    n = lib.lz4r_compress(
        _as_u8p(src), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        int(level), _as_u8p(dict_), len(dict_) if dict_ else 0,
    )
    if n <= 0:
        raise zerr.ErrCompress
    return dst[:n].tobytes()


def compress_into(src: bytes, dst_cap: int, level: int = 1,
                  dict_: bytes | None = None) -> bytes | None:
    """Compress with an explicit output cap; None when it doesn't fit
    (incompressible fallback path)."""
    lib = _load()
    dst = np.empty(max(dst_cap, 1), dtype=np.uint8)
    n = lib.lz4r_compress(
        _as_u8p(src), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_cap,
        int(level), _as_u8p(dict_), len(dict_) if dict_ else 0,
    )
    if n <= 0:
        return None
    return dst[:n].tobytes()


def decompress(src: bytes, dst_cap: int, dict_: bytes | None = None) -> bytes:
    """Decompress one LZ4 block into at most dst_cap bytes."""
    lib = _load()
    dst = np.empty(max(dst_cap, 1), dtype=np.uint8)
    n = lib.lz4r_decompress(
        _as_u8p(src), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_cap,
        _as_u8p(dict_), len(dict_) if dict_ else 0,
    )
    if n < 0:
        raise zerr.ErrDecompress
    return dst[:n].tobytes()


def xxh32(data, seed: int = 0) -> int:
    lib = _load()
    if isinstance(data, np.ndarray):
        return int(lib.lz4r_xxh32(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            data.nbytes, seed))
    return int(lib.lz4r_xxh32(_as_u8p(data), len(data), seed))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def compress_batch(blocks: list[bytes], cap_each: int,
                   level: int = 1) -> list[bytes | None]:
    """Compress many blocks in ONE C call (GIL released for the whole
    batch; zero-copy source pointers). Returns per-block compressed bytes,
    or None where the result did not fit / did not shrink (store raw)."""
    lib = _load()
    n = len(blocks)
    # zero-copy pointer array; the views list keeps every buffer alive
    views = [np.frombuffer(b, dtype=np.uint8) for b in blocks]
    srcs = (ctypes.c_char_p * n)(*[v.ctypes.data for v in views])
    sizes = np.array([len(b) for b in blocks], np.int32)
    dst = np.empty(n * cap_each, np.uint8)
    dst_offs = np.arange(n, dtype=np.int64) * cap_each
    out_sizes = np.zeros(n, np.int32)
    lib.lz4r_compress_batch_ptrs(
        srcs, _i32p(sizes), n,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _i64p(dst_offs),
        np.int32(cap_each), _i32p(out_sizes), int(level))
    out: list[bytes | None] = []
    for i, b in enumerate(blocks):
        sz = int(out_sizes[i])
        if sz <= 0 or sz >= len(b):
            out.append(None)
        else:
            base = i * cap_each
            out.append(dst[base : base + sz].tobytes())
    return out


def decompress_batch(blocks: list[bytes], cap_each: int) -> list:
    """Decompress many blocks in ONE C call (GIL released throughout;
    zero-copy source pointers). Returns memoryviews into one backing
    buffer — no per-block output copies."""
    lib = _load()
    n = len(blocks)
    # zero-copy pointer array; the views list keeps every buffer alive
    views = [np.frombuffer(b, dtype=np.uint8) for b in blocks]
    srcs = (ctypes.c_char_p * n)(*[v.ctypes.data for v in views])
    sizes = np.array([len(b) for b in blocks], np.int32)
    dst = np.empty(n * cap_each, np.uint8)
    dst_offs = np.arange(n, dtype=np.int64) * cap_each
    out_sizes = np.zeros(n, np.int32)
    lib.lz4r_decompress_batch_ptrs(
        srcs, _i32p(sizes), n,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _i64p(dst_offs),
        np.int32(cap_each), _i32p(out_sizes))
    view = memoryview(dst.data)
    out = []
    for i in range(n):
        sz = int(out_sizes[i])
        if sz < 0:
            raise zerr.ErrDecompress
        base = i * cap_each
        out.append(view[base : base + sz])
    return out


class DictContext:
    """Reusable compression dictionary (reference analog: the attached-dict
    compressor contexts, compress/indie.go:235-263). Build once, compress
    many small records against the same 64 KiB window without re-loading
    it each call."""

    def __init__(self, dictionary: bytes) -> None:
        self._lib = _load()
        self._dict = bytes(dictionary[-65536:])
        self._ctx = self._lib.lz4r_dict_create(
            _as_u8p(self._dict), len(self._dict))

    @property
    def dictionary(self) -> bytes:
        return self._dict

    def compress(self, src: bytes, level: int = 1) -> bytes:
        cap = self._lib.lz4r_compress_bound(len(src))
        dst = np.empty(cap, dtype=np.uint8)
        n = self._lib.lz4r_dict_compress(
            self._ctx, _as_u8p(src), len(src),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            int(level))
        if n <= 0:
            raise zerr.ErrCompress
        return dst[:n].tobytes()

    def decompress(self, src: bytes, dst_cap: int) -> bytes:
        return decompress(src, dst_cap, dict_=self._dict)

    def __del__(self):  # pragma: no cover
        try:
            self._lib.lz4r_dict_free(self._ctx)
        except Exception:
            pass


class Xxh32Stream:
    """Streaming xxh32 over the native lib (content-checksum hot path)."""

    def __init__(self, seed: int = 0) -> None:
        self._lib = _load()
        self._st = self._lib.lz4r_xxh32_create(seed)

    def update(self, data) -> None:
        if isinstance(data, np.ndarray):
            self._lib.lz4r_xxh32_update(
                self._st,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                data.nbytes)
        elif len(data):
            self._lib.lz4r_xxh32_update(self._st, _as_u8p(data), len(data))

    def digest(self) -> int:
        return int(self._lib.lz4r_xxh32_digest(self._st))

    def reset(self) -> None:
        self._lib.lz4r_xxh32_reset(self._st)

    def __del__(self):  # pragma: no cover
        try:
            self._lib.lz4r_xxh32_free(self._st)
        except Exception:
            pass
