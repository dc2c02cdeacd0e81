"""Shared helpers for the XLA array codecs (encode_jax / decode_jax).

One definition keeps the clipped-gather semantics — which both the
speculative-parse decoder and the argsort match-finder depend on —
from silently diverging between the two modules.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(2, n))))


def take(arr, idx):
    """Gather with clipped indices (out-of-range reads are masked later)."""
    return jnp.take(arr, jnp.clip(idx, 0, arr.shape[0] - 1))
