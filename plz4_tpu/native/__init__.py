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

_EXT_SRC = os.path.join(_HERE, "_extmod.c")
_ext = None           # C-extension module (None until loaded / if failed)
_ext_tried = False
_ext_error = None     # why the extension is unavailable (diagnosable perf
                      # fallback: ctypes per-record calls are ~2-3x slower)


def _cache_key(*paths: str, extra: str = "") -> str:
    """Digest of sources PLUS the compile configuration. -march=native
    output is host-specific: a _build/ dir shared across machines (copied
    venv, NFS home, baked image) must not load another host's .so and die
    with SIGILL, so the platform/CPU token is part of the key."""
    import platform

    h = hashlib.sha256()
    for p in paths:
        with open(p, "rb") as f:
            h.update(f.read())
    h.update(extra.encode())
    h.update(platform.machine().encode())
    try:  # CPU capability token (x86: flags line pins the ISA extensions)
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith((b"flags", b"Features")):
                    h.update(line)
                    break
    except OSError:
        pass
    return h.hexdigest()[:16]


def _load_ext():
    """Build + import the CPython C-extension binding (plz4_ext). Falls
    back to ctypes on any failure — the extension is a pure fast path,
    not a capability; the reason is kept in _ext_error (and printed when
    PLZ4_DEBUG is set) so the perf fallback is diagnosable."""
    global _ext, _ext_tried, _ext_error
    if _ext_tried:
        return _ext
    with _lock:
        if _ext_tried:
            return _ext
        try:
            import importlib.util
            import sysconfig

            inc = sysconfig.get_paths()["include"]
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", f"-I{inc}", "-o", "", _EXT_SRC, _SRC,
            ]
            digest = _cache_key(_SRC, _EXT_SRC, extra=" ".join(cmd))
            suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
            so_path = os.path.join(_BUILD_DIR, f"plz4_ext-{digest}{suffix}")
            if not os.path.exists(so_path):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                tmp = so_path + f".tmp{os.getpid()}"
                cmd[cmd.index("")] = tmp
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so_path)
            spec = importlib.util.spec_from_file_location("plz4_ext", so_path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _ext = mod
        except Exception as e:  # pragma: no cover - env-dependent
            _ext = None
            _ext_error = repr(e)
            if os.environ.get("PLZ4_DEBUG"):
                import sys

                print(f"plz4_tpu: C-extension unavailable, using ctypes "
                      f"fallback: {_ext_error}", file=sys.stderr)
        _ext_tried = True
    return _ext


def _build_lib() -> str:
    digest = _cache_key(
        _SRC, extra="g++ -O3 -march=native -std=c++17 -shared -fPIC "
                    "-fvisibility=hidden")
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
        lib.lz4r_stream_create.restype = ctypes.c_void_p
        lib.lz4r_stream_create.argtypes = [ctypes.c_int]
        lib.lz4r_stream_load_dict.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int]
        lib.lz4r_stream_compress.restype = ctypes.c_int
        lib.lz4r_stream_compress.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, u8p, ctypes.c_int]
        lib.lz4r_stream_free.argtypes = [ctypes.c_void_p]
        lib.lz4r_dstream_create.restype = ctypes.c_void_p
        lib.lz4r_dstream_create.argtypes = []
        lib.lz4r_dstream_load_dict.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int]
        lib.lz4r_dstream_decompress.restype = ctypes.c_int
        lib.lz4r_dstream_decompress.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.lz4r_dstream_append.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int]
        lib.lz4r_dstream_free.argtypes = [ctypes.c_void_p]
        lib.lz4r_xxh32.restype = ctypes.c_uint32
        lib.lz4r_xxh32.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
        lib.lz4r_xxh32_create.restype = ctypes.c_void_p
        lib.lz4r_xxh32_create.argtypes = [ctypes.c_uint32]
        lib.lz4r_xxh32_reset.argtypes = [ctypes.c_void_p]
        lib.lz4r_xxh32_update.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
        lib.lz4r_xxh32_digest.restype = ctypes.c_uint32
        lib.lz4r_xxh32_digest.argtypes = [ctypes.c_void_p]
        lib.lz4r_xxh32_free.argtypes = [ctypes.c_void_p]
        # device large-block control plane (stitch / split)
        lib.lz4r_stitch_chunks.restype = ctypes.c_int64
        lib.lz4r_stitch_chunks.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, u8p, i64p, i32p,
            ctypes.c_int, u8p, ctypes.c_int64]
        lib.lz4r_chunk_split.restype = ctypes.c_int
        lib.lz4r_chunk_split.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, i64p, ctypes.c_int]
        _mk_fast(lib)
        _lib = lib
    return _lib


class _FastFns:
    """Second set of prototypes for the per-record hot calls, bound to the
    same symbols but taking c_char_p arguments: `bytes` sources pass
    straight through (ctypes hands over the internal buffer pointer — no
    per-call cast objects), which is ~2x on ~1 KiB records where the four
    ctypes.cast/_as_u8p allocations cost as much as the codec. CFUNCTYPE
    foreign functions release the GIL during the call like CDLL ones."""

    compress = None
    decompress = None
    dict_compress = None


_fast = _FastFns()


def _mk_fast(lib) -> None:
    cp = ctypes.c_char_p
    ci = ctypes.c_int

    def bind(name, *argtys):
        proto = ctypes.CFUNCTYPE(ci, *argtys)
        return proto(ctypes.cast(getattr(lib, name), ctypes.c_void_p).value)

    _fast.compress = bind("lz4r_compress", cp, ci, cp, ci, ci, cp, ci)
    _fast.decompress = bind("lz4r_decompress", cp, ci, cp, ci, cp, ci)
    _fast.dict_compress = bind("lz4r_dict_compress", ctypes.c_void_p, cp,
                               ci, cp, ci, ci)


def available() -> bool:
    try:
        _load()
        return True
    except Exception:  # pragma: no cover
        return False


_U8P = ctypes.POINTER(ctypes.c_uint8)


def _as_u8p(buf) -> ctypes.POINTER(ctypes.c_uint8):
    """Zero-copy pointer view of a bytes-like buffer (the C side never
    mutates inputs). Callers must keep `buf` alive across the call — all
    uses here are synchronous."""
    if buf is None or len(buf) == 0:
        return ctypes.cast(None, _U8P)
    if isinstance(buf, bytes):
        return ctypes.cast(buf, _U8P)  # no numpy detour on the hot path
    if isinstance(buf, np.ndarray):
        return buf.ctypes.data_as(_U8P)
    view = np.frombuffer(buf, dtype=np.uint8)  # no copy, read-only ok
    return view.ctypes.data_as(_U8P)


class _TLBuf(threading.local):
    """Per-thread reusable output buffer for the small-block hot paths
    (DictContext records, per-block decompress): avoids a numpy allocation
    + copy per call, which costs more than the codec for ~1 KiB records."""

    def get(self, cap: int):
        buf = getattr(self, "buf", None)
        if buf is None or len(buf) < cap:
            self.buf = buf = ctypes.create_string_buffer(
                max(cap, 1 << 16))
        return buf


_tl_out = _TLBuf()


class _ArrayPool:
    """Free-list of large numpy scratch buffers, power-of-two size classes
    (reference analog: the blk.BorrowBlk/ReturnBlk size-class pools,
    blk/pool.go:275-301). Beyond allocator churn, this matters enormously
    here: first-touch page faults on fresh multi-MB allocations cost
    hundreds of milliseconds under this VM's demand paging, so reusing
    already-faulted pages is a 10-100x lever on the one-shot fast paths."""

    def __init__(self, max_per_class: int = 3) -> None:
        self._lock = threading.Lock()
        self._free: dict[int, list] = {}
        self._max = max_per_class
        self.borrowed = 0  # leak-check hook for tests

    def take(self, n: int) -> np.ndarray:
        cls = 1 << max(16, (max(n, 1) - 1).bit_length())
        with self._lock:
            lst = self._free.get(cls)
            self.borrowed += 1
            if lst:
                return lst.pop()
        return np.empty(cls, dtype=np.uint8)

    def give(self, arr: np.ndarray) -> None:
        cls = arr.nbytes
        with self._lock:
            self.borrowed -= 1
            if cls & (cls - 1) == 0:  # only class-sized buffers re-enter
                lst = self._free.setdefault(cls, [])
                if len(lst) < self._max:
                    lst.append(arr)


buffer_pool = _ArrayPool()


def compress_bound(src_size: int) -> int:
    return _load().lz4r_compress_bound(src_size)


def compress(src: bytes, level: int = 1, dict_: bytes | None = None) -> bytes:
    """Compress one LZ4 block into a bound-sized buffer; may return output
    LARGER than src (bound always has slack). ErrCompress signals codec
    failure only — the store-raw-if-expanded decision belongs to callers
    with a real cap (compress_into / the batch calls / the frame writer,
    reference: blk/blk.go:75-92)."""
    ext = _ext if _ext_tried else _load_ext()
    if ext is not None:
        r = ext.block_compress(src, int(level), dict_)
        if r is None:
            raise zerr.ErrCompress
        return r
    lib = _load()
    cap = lib.lz4r_compress_bound(len(src))
    dst = _tl_out.get(cap)
    if type(src) is bytes and (dict_ is None or type(dict_) is bytes):
        n = _fast.compress(src, len(src), dst, cap, int(level), dict_,
                           len(dict_) if dict_ else 0)
    else:
        n = lib.lz4r_compress(
            _as_u8p(src), len(src),
            ctypes.cast(dst, _U8P), cap,
            int(level), _as_u8p(dict_), len(dict_) if dict_ else 0,
        )
    if n <= 0:
        raise zerr.ErrCompress
    return ctypes.string_at(dst, n)


def compress_into(src: bytes, dst_cap: int, level: int = 1,
                  dict_: bytes | None = None) -> bytes | None:
    """Compress with an explicit output cap; None when it doesn't fit
    (incompressible fallback path)."""
    lib = _load()
    dst = _tl_out.get(dst_cap)
    n = lib.lz4r_compress(
        _as_u8p(src), len(src),
        ctypes.cast(dst, _U8P), dst_cap,
        int(level), _as_u8p(dict_), len(dict_) if dict_ else 0,
    )
    if n <= 0:
        return None
    return ctypes.string_at(dst, n)


def decompress(src: bytes, dst_cap: int, dict_: bytes | None = None) -> bytes:
    """Decompress one LZ4 block into at most dst_cap bytes."""
    ext = _ext if _ext_tried else _load_ext()
    if ext is not None:
        r = ext.block_decompress(src, dst_cap, dict_)
        if r is None:
            raise zerr.ErrDecompress
        return r
    lib = _load()
    dst = _tl_out.get(dst_cap)
    if type(src) is bytes and (dict_ is None or type(dict_) is bytes):
        n = _fast.decompress(src, len(src), dst, dst_cap, dict_,
                             len(dict_) if dict_ else 0)
    else:
        n = lib.lz4r_decompress(
            _as_u8p(src), len(src),
            ctypes.cast(dst, _U8P), dst_cap,
            _as_u8p(dict_), len(dict_) if dict_ else 0,
        )
    if n < 0:
        raise zerr.ErrDecompress
    return ctypes.string_at(dst, n)


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
    dst = buffer_pool.take(n * cap_each)
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
    buffer_pool.give(dst)
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


def compress_batch_into(blocks: list, dst_arr: np.ndarray,
                        dst_offsets: np.ndarray, cap_each: int,
                        level: int = 1) -> np.ndarray:
    """Compress many blocks in ONE C call directly into caller-chosen
    offsets of one output buffer (the one-shot fast path assembles frame
    wire bytes around the results in place). Returns per-block compressed
    sizes; <= 0 or >= the block length means store raw."""
    lib = _load()
    n = len(blocks)
    views = [np.frombuffer(b, dtype=np.uint8) for b in blocks]
    srcs = (ctypes.c_char_p * n)(*[v.ctypes.data for v in views])
    sizes = np.array([len(b) for b in blocks], np.int32)
    out_sizes = np.zeros(n, np.int32)
    lib.lz4r_compress_batch_ptrs(
        srcs, _i32p(sizes), n,
        dst_arr.ctypes.data_as(_U8P), _i64p(np.ascontiguousarray(
            dst_offsets, dtype=np.int64)),
        np.int32(cap_each), _i32p(out_sizes), int(level))
    return out_sizes


def decompress_batch_into(blocks: list, dst_arr: np.ndarray,
                          dst_offsets: np.ndarray, cap_each: int
                          ) -> np.ndarray:
    """Decompress many blocks in ONE C call directly into caller-chosen
    offsets of one output buffer (zero per-block output allocation — the
    one-shot fast path decodes a whole stream into its final resting
    places). Returns the per-block decoded sizes."""
    lib = _load()
    n = len(blocks)
    views = [np.frombuffer(b, dtype=np.uint8) for b in blocks]
    srcs = (ctypes.c_char_p * n)(*[v.ctypes.data for v in views])
    sizes = np.array([len(b) for b in blocks], np.int32)
    out_sizes = np.zeros(n, np.int32)
    lib.lz4r_decompress_batch_ptrs(
        srcs, _i32p(sizes), n,
        dst_arr.ctypes.data_as(_U8P), _i64p(np.ascontiguousarray(
            dst_offsets, dtype=np.int64)),
        np.int32(cap_each), _i32p(out_sizes))
    if np.any(out_sizes < 0):
        raise zerr.ErrDecompress
    return out_sizes


class DictContext:
    """Reusable compression dictionary (reference analog: the attached-dict
    compressor contexts, compress/indie.go:235-263). Build once, compress
    many small records against the same 64 KiB window without re-loading
    it each call.

    NOT thread-safe for concurrent compress() calls: the C context
    mutates shared scratch/state (lz4r.cpp Lz4rDictCtx) and the GIL is
    released around the call — use one context per thread (same contract
    as the reference's per-goroutine contexts and StreamCompressor).
    decompress() is stateless and safe to share."""

    def __init__(self, dictionary: bytes) -> None:
        self._lib = _load()
        self._dict = bytes(dictionary[-65536:])
        self._ext = _ext if _ext_tried else _load_ext()
        if self._ext is not None:
            # capsule owns the ctx; freed by its destructor
            self._cap = self._ext.dict_create(self._dict)
            self._ctx = None
        else:
            self._cap = None
            self._ctx = self._lib.lz4r_dict_create(
                _as_u8p(self._dict), len(self._dict))

    @property
    def dictionary(self) -> bytes:
        return self._dict

    def compress(self, src: bytes, level: int = 1) -> bytes:
        if self._ext is not None:
            r = self._ext.dict_compress(self._cap, src, int(level))
            if r is None:
                raise zerr.ErrCompress
            return r
        cap = self._lib.lz4r_compress_bound(len(src))
        dst = _tl_out.get(cap)
        if type(src) is bytes:
            n = _fast.dict_compress(self._ctx, src, len(src), dst, cap,
                                    int(level))
        else:
            n = self._lib.lz4r_dict_compress(
                self._ctx, _as_u8p(src), len(src),
                ctypes.cast(dst, _U8P), cap, int(level))
        if n <= 0:
            raise zerr.ErrCompress
        return ctypes.string_at(dst, n)

    def decompress(self, src: bytes, dst_cap: int) -> bytes:
        return decompress(src, dst_cap, dict_=self._dict)

    def __del__(self):  # pragma: no cover
        try:
            if self._ctx is not None:
                self._lib.lz4r_dict_free(self._ctx)
        except Exception:
            pass


class StreamCompressor:
    """Stateful chained-block compressor (reference analog: the streaming
    contexts LZ4_loadDict + LZ4_compress_fast_continue / HC,
    clz4/clz4.go:211-286). Match state carries ACROSS blocks, so a linked
    chain pays no per-block window loading at all. Serial use only (one
    stream per chain)."""

    def __init__(self, level: int = 1, dict_: bytes | None = None) -> None:
        self._lib = _load()
        self._ctx = self._lib.lz4r_stream_create(int(level))
        if dict_:
            self._lib.lz4r_stream_load_dict(
                self._ctx, _as_u8p(dict_), len(dict_))

    def compress(self, src: bytes, dst_cap: int | None = None
                 ) -> bytes | None:
        """Compress the next chained block; None when it doesn't fit in
        dst_cap (store raw — state stays consistent either way)."""
        cap = dst_cap if dst_cap is not None else \
            self._lib.lz4r_compress_bound(len(src))
        dst = _tl_out.get(max(cap, 1))
        n = self._lib.lz4r_stream_compress(
            self._ctx, _as_u8p(src), len(src),
            ctypes.cast(dst, _U8P), cap)
        if n <= 0:
            return None
        return ctypes.string_at(dst, n)

    def __del__(self):  # pragma: no cover
        try:
            self._lib.lz4r_stream_free(self._ctx)
        except Exception:
            pass


class StreamDecompressor:
    """Stateful chained-block decompressor: decoded history stays in one
    contiguous C-side buffer (no per-block window re-materialization —
    reference analog: the rolling DictT, compress/dict.go:171-184)."""

    def __init__(self, dict_: bytes | None = None) -> None:
        self._lib = _load()
        self._ctx = self._lib.lz4r_dstream_create()
        if dict_:
            self._lib.lz4r_dstream_load_dict(
                self._ctx, _as_u8p(dict_), len(dict_))

    def decompress(self, src: bytes, out_cap: int) -> bytes:
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.lz4r_dstream_decompress(
            self._ctx, _as_u8p(src), len(src), out_cap,
            ctypes.byref(out_ptr))
        if n < 0:
            raise zerr.ErrDecompress
        return ctypes.string_at(out_ptr, n)

    def append_raw(self, data: bytes) -> None:
        """Extend the history with an uncompressed block's bytes."""
        if len(data):
            self._lib.lz4r_dstream_append(self._ctx, _as_u8p(data), len(data))

    def __del__(self):  # pragma: no cover
        try:
            self._lib.lz4r_dstream_free(self._ctx)
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


# ---------------------------------------------------------------------------
# Device large-block control plane (see lz4r.cpp "Device large-block
# support"): the TPU kernels are SMEM-resident and chunk-sized, so blocks
# larger than 64 KiB are encoded as independent window-prefixed chunks and
# stitched into one standard LZ4 block stream, and decoded by splitting the
# stream at sequence boundaries into carry-annotated chunk records
# (reference block-size classes go to 4 MiB: descriptor/index.go:92-125).
# ---------------------------------------------------------------------------

def stitch_chunks(src, chunk: int, streams: list[bytes]) -> bytes | None:
    """Merge per-chunk LZ4 streams (chunk i encoded with chunk i-1 as its
    window) into one LZ4 block stream for `src`. Returns None if the
    stitched stream is malformed or exceeds the compress bound (callers
    store the block raw)."""
    lib = _load()
    n = len(src)
    joined = b"".join(streams)
    offs = np.zeros(len(streams), dtype=np.int64)
    slens = np.zeros(len(streams), dtype=np.int32)
    pos = 0
    for i, s in enumerate(streams):
        offs[i] = pos
        slens[i] = len(s)
        pos += len(s)
    cap = n + n // 255 + 64
    dst = buffer_pool.take(cap)
    try:
        got = lib.lz4r_stitch_chunks(
            _as_u8p(src), n, chunk, _as_u8p(joined),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            slens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(streams), _as_u8p(dst), cap)
        if got < 0:
            return None
        return dst[:got].tobytes()
    finally:
        buffer_pool.give(dst)


def chunk_split(comp, chunk: int, max_out: int) -> np.ndarray | None:
    """Split a compressed LZ4 block into decode records of <= `chunk`
    output bytes each. Returns an (n_rec, 8) int64 array
    [in_off, in_len, pre_lit, pre_skip, pre_moff, pre_mlen, out_len, 0]
    or None when the stream is malformed / decodes past max_out."""
    lib = _load()
    max_recs = max_out // chunk + 2
    recs = np.zeros((max_recs, 8), dtype=np.int64)
    got = lib.lz4r_chunk_split(
        _as_u8p(comp), len(comp), chunk,
        recs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_recs)
    if got < 0:
        return None
    recs = recs[:got]
    if int(recs[:, 6].sum()) > max_out:
        return None
    return recs
