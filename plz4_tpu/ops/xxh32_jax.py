"""xxHash-32 on device, batched over blocks.

The xxh32 stripe fold is inherently serial (non-associative), but across a
batch of B blocks the four lane accumulators x B blocks vectorize on the
VPU: a lax.scan walks stripe indices once while every block updates in
parallel. This powers device-side block-checksum generation/verification so
checksummed frames never need a host round-trip for hashing (the content
checksum — one serial stream over the whole frame — stays on the host
hasher thread, reference: async/hash.go).

Reference analog: internal/pkg/xxh32 (Go + ARM asm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

P1 = np.uint32(2654435761)
P2 = np.uint32(2246822519)
P3 = np.uint32(3266489917)
P4 = np.uint32(668265263)
P5 = np.uint32(374761393)


def _rotl(x, r: int):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _words(data: jnp.ndarray) -> jnp.ndarray:
    """(B, N) uint8 -> (B, N//4) uint32 little-endian words."""
    B, N = data.shape
    d = data.astype(U32).reshape(B, N // 4, 4)
    return (d[..., 0] | (d[..., 1] << np.uint32(8))
            | (d[..., 2] << np.uint32(16)) | (d[..., 3] << np.uint32(24)))


@jax.jit
def xxh32_batch(data: jnp.ndarray, lens: jnp.ndarray,
                seed: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Zero-copy batched xxh32: data (B, N) uint8 (N % 16 == 0, rows
    zero-padded past their length), lens (B,) int32. Returns (B,) uint32.
    """
    B, N = data.shape
    assert N % 16 == 0, "pad rows to a multiple of 16"
    seed = jnp.asarray(seed, dtype=U32)
    lens32 = lens.astype(jnp.int32)
    w = _words(data)  # (B, W)
    n_stripes = lens32 // 16  # full 16-byte stripes per block

    acc0 = jnp.broadcast_to(
        jnp.stack([seed + P1 + P2, seed + P2, seed + np.uint32(0),
                   seed - P1]), (B, 4)).astype(U32)

    def stripe(carry, s):
        acc = carry
        lane = jax.lax.dynamic_slice_in_dim(w, s * 4, 4, axis=1)  # (B, 4)
        upd = _rotl(acc + lane * P2, 13) * P1
        mask = (s < n_stripes)[:, None]
        return jnp.where(mask, upd, acc), None

    acc, _ = jax.lax.scan(stripe, acc0, jnp.arange(N // 16))

    big = (_rotl(acc[:, 0], 1) + _rotl(acc[:, 1], 7)
           + _rotl(acc[:, 2], 12) + _rotl(acc[:, 3], 18))
    h = jnp.where(lens32 >= 16, big, seed + P5)
    h = h + lens32.astype(U32)

    # tail: up to 15 bytes after the last full stripe
    tail_start = n_stripes * 16
    rem = lens32 - tail_start
    # up to 3 word steps
    widx = jnp.arange(B)
    for k in range(3):
        off = tail_start // 4 + k
        lane = w[widx, jnp.clip(off, 0, N // 4 - 1)]
        use = rem >= (k + 1) * 4
        h = jnp.where(use, _rotl(h + lane * P3, 17) * P4, h)
    # up to 3 byte steps
    done_words = rem // 4
    for k in range(3):
        bi = tail_start + done_words * 4 + k
        byte = data[widx, jnp.clip(bi, 0, N - 1)].astype(U32)
        use = (done_words * 4 + k) < rem
        h = jnp.where(use, _rotl(h + byte * P5, 11) * P1, h)

    h = h ^ (h >> np.uint32(15))
    h = h * P2
    h = h ^ (h >> np.uint32(13))
    h = h * P3
    h = h ^ (h >> np.uint32(16))
    return h


def xxh32_blocks_host(blocks: list[bytes], seed: int = 0) -> list[int]:
    """Convenience host wrapper for tests."""
    if not blocks:
        return []
    N = max(16, ((max(len(b) for b in blocks) + 15) // 16) * 16)
    arr = np.zeros((len(blocks), N), dtype=np.uint8)
    lens = np.zeros((len(blocks),), dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    out = xxh32_batch(jnp.asarray(arr), jnp.asarray(lens),
                      np.uint32(seed))
    return [int(x) for x in np.asarray(out)]
