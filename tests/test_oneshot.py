"""One-shot fast paths (engine/oneshot.py) must be byte-equivalent to the
streaming engines and fall back cleanly whenever a streaming feature is
engaged."""

import io

import pytest

import plz4_tpu as plz4
from plz4_tpu import errors as zerr
from plz4_tpu.engine import oneshot
from plz4_tpu.frame import descriptor as desc
from plz4_tpu.opts import Options

from conftest import make_compressible, make_incompressible

PAYLOAD = make_compressible(500_000, seed=81)


def streaming_compress(data, **kw):
    out = io.BytesIO()
    w = plz4.Writer(out, **kw)
    w.write(data)
    w.close()
    return out.getvalue()


def streaming_decompress(data, **kw):
    r = plz4.Reader(io.BytesIO(data), **kw)
    try:
        return r.read()
    finally:
        r.close()


@pytest.mark.parametrize("kw", [
    {},
    {"block_checksum": True},
    {"content_checksum": False},
    {"block_size_idx": desc.BLOCK_IDX_64KB, "level": 6},
    {"content_size": len(PAYLOAD)},
], ids=["default", "bx", "no-cx", "bs64-l6", "cs"])
def test_fast_compress_equals_streaming(kw):
    fast = oneshot.compress_bytes(PAYLOAD, Options(parallel=2, **kw))
    assert fast is not None
    slow = streaming_compress(PAYLOAD, parallel=0, **kw)
    assert fast == slow  # byte-identical frames
    assert streaming_decompress(fast) == PAYLOAD


def test_fast_decompress_equals_streaming():
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB,
                         block_checksum=True)
    fast = oneshot.decompress_bytes(comp, Options(parallel=2))
    assert fast is not None
    assert fast == PAYLOAD


def test_fast_paths_fall_back():
    o_linked = Options(block_linked=True)
    assert oneshot.compress_bytes(PAYLOAD, o_linked) is None
    o_dict = Options(dictionary=b"x" * 100)
    assert oneshot.compress_bytes(PAYLOAD, o_dict) is None
    assert oneshot.decompress_bytes(
        plz4.compress(b"abc"), Options(read_offset=7)) is None
    comp_linked = plz4.compress(PAYLOAD, block_linked=True,
                                block_size_idx=desc.BLOCK_IDX_64KB)
    assert oneshot.decompress_bytes(comp_linked, Options()) is None


def test_fast_decompress_concatenated_and_skippable():
    stream = io.BytesIO()
    plz4.write_skip_frame_header(stream, 3, 4)
    stream.write(b"meta")
    stream.write(plz4.compress(b"first "))
    stream.write(plz4.compress(b"second"))
    out = oneshot.decompress_bytes(stream.getvalue(), Options(parallel=2))
    assert out == b"first second"


def test_fast_decompress_detects_corruption():
    comp = bytearray(plz4.compress(PAYLOAD, block_checksum=True,
                                   content_checksum=False,
                                   block_size_idx=desc.BLOCK_IDX_64KB))
    comp[100] ^= 0xFF
    with pytest.raises(zerr.Lz4Error):
        oneshot.decompress_bytes(bytes(comp), Options(parallel=2))


def test_fast_decompress_content_checksum():
    comp = bytearray(plz4.compress(PAYLOAD))
    comp[-1] ^= 0xFF  # trailing content hash byte
    with pytest.raises(zerr.Lz4Error):
        oneshot.decompress_bytes(bytes(comp), Options(parallel=2))


def test_fast_decompress_truncation():
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB)
    for cut in (6, 20, len(comp) // 2, len(comp) - 2):
        with pytest.raises(zerr.Lz4Error):
            oneshot.decompress_bytes(comp[:cut], Options(parallel=2))


def test_fast_roundtrip_incompressible():
    data = make_incompressible(300_000)
    fast = oneshot.compress_bytes(
        data, Options(parallel=2, block_size_idx=desc.BLOCK_IDX_64KB))
    assert oneshot.decompress_bytes(fast, Options(parallel=2)) == data
