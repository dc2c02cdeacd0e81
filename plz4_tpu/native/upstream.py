"""Bindings to the reference's vendored upstream lz4 v1.10.0 (oracle).

Compiles /root/reference/internal/pkg/clz4/{lz4.c,lz4hc.c} out-of-tree into
a cached .so (the read-only mount is never touched) and exposes the exact
call surface the reference uses via CGO (clz4/clz4.go:27-94):
LZ4_compress_fast / LZ4_compress_HC / LZ4_decompress_safe[_usingDict] /
LZ4_compressBound, plus the streaming-continue contexts
(clz4/clz4.go:211-286) for linked-mode conformance.

This provides the INDEPENDENT implementation that anchors the
BASELINE.md contract ("decode bit-exact; compressed size <= plz4 at every
level") — cross-checks among the repo's own codecs cannot catch a shared
spec misreading. Used by the conformance tests and the CLI bakeoff's
upstream competitor rows; both degrade gracefully (skip / hide the rows)
when the reference mount or a C compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_REF_DIR = "/root/reference/internal/pkg/clz4"
_SOURCES = ("lz4.c", "lz4hc.c")
# Pinned sha256 of the vendored upstream lz4 v1.10.0 sources. The oracle
# compiles and EXECUTES code from the read-only reference mount; a swapped
# or patched mount must not silently become the conformance baseline (nor
# run arbitrary code in the test process), so mismatches mark the oracle
# unavailable instead of compiling.
_PINNED_SHA256 = {
    "lz4.c": "9396f7de527bc8435de9c7569fb7998e56545a84b4f3c2d808c0235c01774539",
    "lz4hc.c": "9480c794acccad7e8402741796849cca3530932a53fdee0bb8717ce8e9d854c8",
}
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_build", "upstream")

_lib = None
_lock = threading.Lock()
_unavailable_reason = None
_load_failed = False


class UpstreamUnavailable(RuntimeError):
    """Raised when the oracle is called without the reference mount or a
    working C compiler; gate call sites on available() to degrade."""


def available() -> bool:
    try:
        return _load() is not None
    except Exception:
        return False


def unavailable_reason() -> str:
    available()
    return _unavailable_reason or ""


def _build() -> str | None:
    global _unavailable_reason
    srcs = [os.path.join(_REF_DIR, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        _unavailable_reason = f"reference sources missing under {_REF_DIR}"
        return None
    h = hashlib.sha256()
    for name, s in zip(_SOURCES, srcs):
        with open(s, "rb") as f:
            content = f.read()
        digest = hashlib.sha256(content).hexdigest()
        if digest != _PINNED_SHA256[name]:
            _unavailable_reason = (
                f"reference {name} sha256 mismatch (got {digest[:16]}..., "
                f"expected lz4 v1.10.0) — refusing to build the oracle")
            return None
        h.update(content)
    so_path = os.path.join(_BUILD_DIR, f"liblz4up-{h.hexdigest()[:16]}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _unavailable_reason = f"upstream oracle build failed: {e}"
        return None
    os.replace(tmp, so_path)
    return so_path


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            # negative cache: a failed build would otherwise re-hash both
            # C sources and re-spawn gcc on every available() call
            return None
        path = _build()
        if path is None:
            _load_failed = True
            return None
        lib = ctypes.CDLL(path)
        ci, cp = ctypes.c_int, ctypes.c_char_p
        vp = ctypes.c_void_p
        lib.LZ4_compressBound.argtypes = [ci]
        lib.LZ4_compressBound.restype = ci
        lib.LZ4_compress_fast.argtypes = [cp, vp, ci, ci, ci]
        lib.LZ4_compress_fast.restype = ci
        lib.LZ4_compress_HC.argtypes = [cp, vp, ci, ci, ci]
        lib.LZ4_compress_HC.restype = ci
        lib.LZ4_decompress_safe.argtypes = [cp, vp, ci, ci]
        lib.LZ4_decompress_safe.restype = ci
        lib.LZ4_decompress_safe_usingDict.argtypes = [cp, vp, ci, ci, cp, ci]
        lib.LZ4_decompress_safe_usingDict.restype = ci
        # streaming contexts (linked-mode conformance)
        lib.LZ4_createStream.restype = vp
        lib.LZ4_freeStream.argtypes = [vp]
        lib.LZ4_loadDict.argtypes = [vp, cp, ci]
        lib.LZ4_loadDict.restype = ci
        lib.LZ4_compress_fast_continue.argtypes = [vp, cp, vp, ci, ci, ci]
        lib.LZ4_compress_fast_continue.restype = ci
        lib.LZ4_createStreamHC.restype = vp
        lib.LZ4_freeStreamHC.argtypes = [vp]
        lib.LZ4_resetStreamHC_fast.argtypes = [vp, ci]
        lib.LZ4_loadDictHC.argtypes = [vp, cp, ci]
        lib.LZ4_loadDictHC.restype = ci
        lib.LZ4_compress_HC_continue.argtypes = [vp, cp, vp, ci, ci]
        lib.LZ4_compress_HC_continue.restype = ci
        _lib = lib
        return _lib


def _require():
    lib = _load()
    if lib is None:
        raise UpstreamUnavailable(_unavailable_reason or
                                  "upstream oracle unavailable")
    return lib


def compress_bound(n: int) -> int:
    return _require().LZ4_compressBound(n)


def compress_fast(data: bytes, acceleration: int = 1) -> bytes:
    lib = _require()
    cap = lib.LZ4_compressBound(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_fast(data, dst, len(data), cap, acceleration)
    if n <= 0:
        raise RuntimeError("upstream LZ4_compress_fast failed")
    return dst.raw[:n]


def compress_hc(data: bytes, level: int) -> bytes:
    lib = _require()
    cap = lib.LZ4_compressBound(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_HC(data, dst, len(data), cap, level)
    if n <= 0:
        raise RuntimeError("upstream LZ4_compress_HC failed")
    return dst.raw[:n]


def compress(data: bytes, level: int) -> bytes:
    """Level dispatch matching the reference factory (compress/compress.go:
    25-48): level 1 -> LZ4_compress_fast(accel=1); 2-12 -> LZ4_compress_HC."""
    if level <= 1:
        return compress_fast(data)
    return compress_hc(data, level)


def decompress(comp: bytes, out_cap: int, dict_: bytes | None = None) -> bytes:
    lib = _require()
    dst = ctypes.create_string_buffer(max(out_cap, 1))
    if dict_:
        n = lib.LZ4_decompress_safe_usingDict(
            comp, dst, len(comp), out_cap, dict_, len(dict_))
    else:
        n = lib.LZ4_decompress_safe(comp, dst, len(comp), out_cap)
    if n < 0:
        raise ValueError(f"upstream decompress failed: {n}")
    return dst.raw[:n]


def compress_linked(blocks: list[bytes], level: int = 1,
                    dict_: bytes | None = None) -> list[bytes]:
    """Chained compression with the upstream streaming API — each block's
    window extends into the previous blocks (and optional initial dict),
    exactly how the reference produces a linked LZ4 frame: LZ4_loadDict of
    the trailing 64 KiB window before every *_continue call
    (clz4/clz4.go:211-286, compress/linked.go:309-331)."""
    lib = _require()
    out = []
    window = bytearray(dict_ or b"")
    hc = level > 1
    st = lib.LZ4_createStreamHC() if hc else lib.LZ4_createStream()
    try:
        for b in blocks:
            w = bytes(window[-65536:])  # pinned for the duration of the call
            cap = lib.LZ4_compressBound(len(b))
            dst = ctypes.create_string_buffer(cap)
            if hc:
                lib.LZ4_resetStreamHC_fast(st, level)
                if w:
                    lib.LZ4_loadDictHC(st, w, len(w))
                n = lib.LZ4_compress_HC_continue(st, b, dst, len(b), cap)
            else:
                if w:
                    lib.LZ4_loadDict(st, w, len(w))
                n = lib.LZ4_compress_fast_continue(st, b, dst, len(b), cap, 1)
            if n <= 0:
                raise RuntimeError("upstream *_continue failed")
            out.append(dst.raw[:n])
            window += b
    finally:
        (lib.LZ4_freeStreamHC if hc else lib.LZ4_freeStream)(st)
    return out
