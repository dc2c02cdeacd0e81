"""xxHash-32 (zero default seed) — pure Python/numpy implementation.

This is the portable fallback and conformance oracle; the hot path uses the
native C++ implementation in :mod:`plz4_tpu.native` and a JAX device kernel
in :mod:`plz4_tpu.ops.xxh32_jax`. Mirrors the reference's zero-seed streaming
hasher (reference: internal/pkg/xxh32/xxh32zero.go:22-235).
"""

from __future__ import annotations

import numpy as np

PRIME1 = 2654435761
PRIME2 = 2246822519
PRIME3 = 3266489917
PRIME4 = 668265263
PRIME5 = 374761393

_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    x &= _M32
    return ((x << r) | (x >> (32 - r))) & _M32


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * PRIME2) & _M32, 13) * PRIME1) & _M32


def _avalanche(h: int) -> int:
    h &= _M32
    h ^= h >> 15
    h = (h * PRIME2) & _M32
    h ^= h >> 13
    h = (h * PRIME3) & _M32
    h ^= h >> 16
    return h


def _np_stripes(accs: np.ndarray, stripes: np.ndarray) -> np.ndarray:
    """Fold (n, 4) uint32 stripe lanes into the 4 accumulators.

    The fold is serial across stripes (each accumulator feeds the next
    round) but the four lanes run vectorized. numpy is only the fallback;
    the native codec hashes at memory speed.
    """
    p1 = np.uint32(PRIME1)
    p2 = np.uint32(PRIME2)
    with np.errstate(over="ignore"):
        for row in stripes:
            accs = (accs + row * p2).astype(np.uint32)
            accs = ((accs << np.uint32(13)) | (accs >> np.uint32(19))).astype(
                np.uint32
            )
            accs = (accs * p1).astype(np.uint32)
    return accs


class Xxh32:
    """Streaming zero-seed xxHash-32 (reference: xxh32.XXHZero)."""

    def __init__(self, seed: int = 0) -> None:
        self._seed = seed & _M32
        self.reset()

    def reset(self) -> None:
        s = self._seed
        self._accs = np.array(
            [
                (s + PRIME1 + PRIME2) & _M32,
                (s + PRIME2) & _M32,
                s & _M32,
                (s - PRIME1) & _M32,
            ],
            dtype=np.uint32,
        )
        self._buf = bytearray()
        self._total = 0

    def update(self, data: bytes | bytearray | memoryview | np.ndarray) -> None:
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        self._total += len(data)
        self._buf += bytes(data)
        usable = len(self._buf) - (len(self._buf) % 16)
        if usable:
            stripes = np.frombuffer(bytes(self._buf[:usable]), dtype="<u4")
            stripes = stripes.reshape(-1, 4)
            self._accs = _np_stripes(self._accs, stripes)
            del self._buf[:usable]

    def digest(self) -> int:
        if self._total >= 16:
            a = [int(x) for x in self._accs]
            h = (
                _rotl(a[0], 1) + _rotl(a[1], 7) + _rotl(a[2], 12) + _rotl(a[3], 18)
            ) & _M32
        else:
            h = (self._seed + PRIME5) & _M32
        h = (h + self._total) & _M32

        buf = bytes(self._buf)
        i = 0
        while i + 4 <= len(buf):
            lane = int.from_bytes(buf[i : i + 4], "little")
            h = (_rotl((h + lane * PRIME3) & _M32, 17) * PRIME4) & _M32
            i += 4
        while i < len(buf):
            h = (_rotl((h + buf[i] * PRIME5) & _M32, 11) * PRIME1) & _M32
            i += 1
        return _avalanche(h)


def xxh32(data: bytes | bytearray | memoryview | np.ndarray, seed: int = 0) -> int:
    """One-shot xxHash-32 (reference: xxh32.ChecksumZero for seed 0)."""
    h = Xxh32(seed)
    h.update(data)
    return h.digest()
