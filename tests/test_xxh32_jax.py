"""Device xxh32 batch kernel vs the native implementation."""

import numpy as np

from plz4_tpu import native
from plz4_tpu.ops.xxh32_jax import xxh32_blocks_host

from conftest import make_compressible, make_incompressible


def test_batch_matches_native():
    blocks = [
        b"",
        b"a",
        b"abc",
        b"0123456789abcde",          # 15: tail only
        b"0123456789abcdef",         # 16: exactly one stripe
        b"0123456789abcdefg",        # 17
        make_compressible(1000, seed=1),
        make_incompressible(4096, seed=2),
        make_compressible(65536, seed=3),
        make_incompressible(65521, seed=4),  # odd tail
    ]
    got = xxh32_blocks_host(blocks)
    want = [native.xxh32(b) for b in blocks]
    assert got == want


def test_batch_seeded():
    blocks = [b"hello world", make_compressible(500, seed=9)]
    got = xxh32_blocks_host(blocks, seed=12345)
    want = [native.xxh32(b, seed=12345) for b in blocks]
    assert got == want


def test_every_tail_length():
    blocks = [make_incompressible(64 + t, seed=t) for t in range(16)]
    got = xxh32_blocks_host(blocks)
    want = [native.xxh32(b) for b in blocks]
    assert got == want
