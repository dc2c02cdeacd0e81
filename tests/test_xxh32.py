"""xxHash-32 correctness: known vectors + python/native agreement.

Reference test analog: internal/pkg/xxh32 tests; the header checksum byte and
block/content checksums all depend on this being exact.
"""

import pytest

from plz4_tpu import native
from plz4_tpu.xxh32 import Xxh32, xxh32

# Known-answer vectors for XXH32 seed 0 (public algorithm test vectors).
VECTORS = [
    (b"", 0x02CC5D05),
    (b"a", 0x550D7456),
    (b"abc", 0x32D153FF),
    (b"message digest", 0x7C948494),
    (b"abcdefghijklmnopqrstuvwxyz", 0x63A14D5F),
    (b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789", 0x9C285E64),
    (b"1234567890123456789012345678901234567890" * 10, None),  # cross-check only
]


@pytest.mark.parametrize("data,want", VECTORS)
def test_python_vectors(data, want):
    got = xxh32(data)
    if want is not None:
        assert got == want, f"{data!r}: got {got:#x} want {want:#x}"


@pytest.mark.parametrize("data,want", VECTORS)
def test_native_matches_python(data, want):
    assert native.xxh32(data) == xxh32(data)


def test_streaming_chunked(text_1mb):
    one_shot = native.xxh32(text_1mb)
    h = Xxh32()
    st = native.Xxh32Stream()
    for i in range(0, len(text_1mb), 37):
        chunk = text_1mb[i : i + 37]
        h.update(chunk)
        st.update(chunk)
    assert h.digest() == one_shot
    assert st.digest() == one_shot


def test_seeded():
    assert native.xxh32(b"hello world", seed=42) == xxh32(b"hello world", seed=42)


def test_large_native_vs_python(text_1mb):
    assert native.xxh32(text_1mb) == xxh32(text_1mb)
