"""C-extension binding (plz4_ext): loads in this env and agrees byte-for-
byte with the ctypes binding on every surface it accelerates."""

import pytest

from plz4_tpu import native

from conftest import make_compressible, make_incompressible

ext = native._load_ext()

pytestmark = pytest.mark.skipif(ext is None, reason="ext build unavailable")

DATA = [
    b"",
    b"x",
    make_compressible(5000, seed=70),
    make_incompressible(4096, seed=71),
    b"\x00" * 3000,
]


@pytest.mark.parametrize("level", [1, 6, 9, 12])
@pytest.mark.parametrize("i", range(len(DATA)))
def test_ext_matches_ctypes_roundtrip(level, i):
    data = DATA[i]
    r = ext.block_compress(data, level, None)
    if r is None:  # incompressible: ctypes path must agree
        with pytest.raises(Exception):
            _ctypes_compress(data, level)
        return
    assert r == _ctypes_compress(data, level)
    out = ext.block_decompress(r, len(data), None)
    assert out == data


def _ctypes_compress(data, level, dict_=None):
    """Force the ctypes/_fast path regardless of the ext being loaded."""
    import ctypes

    from plz4_tpu import errors as zerr

    lib = native._load()
    cap = lib.lz4r_compress_bound(len(data))
    dst = native._tl_out.get(cap)
    n = native._fast.compress(data, len(data), dst, cap, int(level), dict_,
                              len(dict_) if dict_ else 0)
    if n <= 0:
        raise zerr.ErrCompress
    return ctypes.string_at(dst, n)


def test_ext_dict_ctx_matches():
    dict_ = make_compressible(65536, seed=72)
    recs = [make_compressible(1024, seed=73 + i) for i in range(8)]
    cap = ext.dict_create(dict_)
    ctx = native.DictContext(dict_)
    for r in recs:
        e1 = ext.dict_compress(cap, r, 1)
        assert ext.block_decompress(e1, len(r), dict_) == r
        # the context object (routed through ext itself when available)
        e2 = ctx.compress(r, level=1)
        assert native.decompress(e2, len(r), dict_=dict_) == r


def test_ext_corrupt_returns_none():
    data = make_compressible(4000, seed=74)
    comp = bytearray(ext.block_compress(data, 1, None))
    comp[2] ^= 0xFF
    r = ext.block_decompress(bytes(comp), len(data), None)
    assert r is None or r != data


def test_ext_memoryview_inputs():
    data = make_compressible(4000, seed=75)
    comp = ext.block_compress(memoryview(data), 1, None)
    assert ext.block_decompress(memoryview(comp), len(data), None) == data


def test_ext_truncated_returns_none():
    data = make_compressible(4000, seed=76)
    comp = ext.block_compress(data, 1, None)
    assert ext.block_decompress(comp[: len(comp) // 3], len(data),
                                None) != data
