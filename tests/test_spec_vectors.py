"""Hand-crafted LZ4 block/frame golden vectors, built byte-by-byte from the
public spec (docs/lz4_Frame_Format.md + LZ4 block format). Both decoders
(native C++ and device JAX) must accept any *valid* stream, regardless of
which encoder produced it — this substitutes for lz4c-produced fixtures
(the reference repo's committed .lz4 samples are not present in the mount).
"""

import pytest

from plz4_tpu import decompress, errors as zerr, native
from plz4_tpu.ops import decode_jax


def both_decode(block: bytes, expect: bytes, cap: int | None = None):
    cap = cap if cap is not None else max(len(expect), 1)
    out_native = native.decompress(block, cap)
    assert out_native == expect, "native decoder mismatch"
    out_device = decode_jax.decode_block_host(block, out_cap=cap)
    assert out_device == expect, "device decoder mismatch"


def test_literals_only():
    # token: lit=5, ml nibble 0 (last sequence: literals only)
    both_decode(bytes([0x50]) + b"hello", b"hello")


def test_rle_offset1():
    # 'a' literal, then match offset=1 len=8, then 5 trailing literals
    blk = bytes([0x14]) + b"a" + bytes([0x01, 0x00]) + bytes([0x50]) + b"bcdef"
    both_decode(blk, b"a" + b"a" * 8 + b"bcdef")


def test_overlap_offset2():
    # "ab" literals, match offset=2 len=10 -> "ababababab", + 5 literals
    blk = (bytes([0x20 | 0x06]) + b"ab" + bytes([0x02, 0x00])
           + bytes([0x50]) + b"uvwxy")
    both_decode(blk, b"ab" + (b"ab" * 5) + b"uvwxy")


def test_literal_extension_255_boundary():
    # exactly 15 literals requires an extension byte of 0
    lits15 = bytes(range(15))
    blk = bytes([0xF0, 0x00]) + lits15
    both_decode(blk, lits15)
    # 270 literals: 0xF0, ext 255, ext 0
    lits270 = bytes((i * 7) & 0xFF for i in range(270))
    blk = bytes([0xF0, 0xFF, 0x00]) + lits270
    both_decode(blk, lits270)
    # 269 literals: 0xF0, ext 254
    lits269 = lits270[:269]
    blk = bytes([0xF0, 0xFE]) + lits269
    both_decode(blk, lits269)


def test_match_extension_255_boundary():
    # lit 'x', match offset1: ml nibble 15 -> len = 4+15+ext
    # ext 0 -> 19; ext 255,0 -> 274
    for ext, mlen in ((bytes([0x00]), 19), (bytes([0xFF, 0x00]), 274),
                     (bytes([0xFE]), 273)):
        blk = (bytes([0x1F]) + b"x" + bytes([0x01, 0x00]) + ext
               + bytes([0x50]) + b"abcde")
        both_decode(blk, b"x" * (1 + mlen) + b"abcde")


def test_max_offset():
    # 65535 'z's, then a match reaching all the way back
    lits = b"z" + bytes(255 for _ in range(0)) + bytes([0] * 0)
    prefix = b"q" + b"y" * 65534  # 65535 bytes of literals
    # literal run of 65535: 15 + 255*255 + 255 = 65535? 15+255k+r
    n = 65535
    ext = []
    rem = n - 15
    while rem >= 255:
        ext.append(255)
        rem -= 255
    ext.append(rem)
    blk = (bytes([0xF4]) + bytes(ext) + prefix
           + bytes([0xFF, 0xFF])  # offset 65535 -> copies 'q' region
           + bytes([0x50]) + b"fghij")
    expect = prefix + prefix[:8] + b"fghij"
    both_decode(blk, expect)


def test_empty_block_token():
    both_decode(bytes([0x00]), b"")


def test_zero_offset_rejected():
    blk = bytes([0x14]) + b"a" + bytes([0x00, 0x00]) + bytes([0x50]) + b"abcde"
    with pytest.raises(zerr.Lz4Error):
        native.decompress(blk, 64)
    with pytest.raises(zerr.Lz4Error):
        decode_jax.decode_block_host(blk, out_cap=64)


def test_offset_beyond_output_rejected():
    blk = bytes([0x14]) + b"a" + bytes([0x05, 0x00]) + bytes([0x50]) + b"abcde"
    with pytest.raises(zerr.Lz4Error):
        native.decompress(blk, 64)
    with pytest.raises(zerr.Lz4Error):
        decode_jax.decode_block_host(blk, out_cap=64)


def test_truncated_literals_rejected():
    blk = bytes([0x80]) + b"abc"  # declares 8 literals, provides 3
    with pytest.raises(zerr.Lz4Error):
        native.decompress(blk, 64)
    with pytest.raises(zerr.Lz4Error):
        decode_jax.decode_block_host(blk, out_cap=64)


# --- hand-built frames -----------------------------------------------------


def test_minimal_frame_by_hand():
    """Frame: magic, FLG(v1, indep), BD(4MB), HC, one block, EndMark."""
    from plz4_tpu.xxh32 import xxh32

    flg = 0b0110_0000  # version 1, block independent, no checksums
    bd = 0b0111_0000   # 4 MB
    hc = (xxh32(bytes([flg, bd])) >> 8) & 0xFF
    block = bytes([0x50]) + b"hello"
    frame = (
        (0x184D2204).to_bytes(4, "little")
        + bytes([flg, bd, hc])
        + len(block).to_bytes(4, "little")
        + block
        + b"\x00\x00\x00\x00"
    )
    assert decompress(frame) == b"hello"


def test_uncompressed_block_frame_by_hand():
    from plz4_tpu.xxh32 import xxh32

    flg = 0b0110_0000
    bd = 0b0100_0000  # 64 KB
    hc = (xxh32(bytes([flg, bd])) >> 8) & 0xFF
    payload = b"raw-bytes-stored-verbatim"
    frame = (
        (0x184D2204).to_bytes(4, "little")
        + bytes([flg, bd, hc])
        + (0x80000000 | len(payload)).to_bytes(4, "little")
        + payload
        + b"\x00\x00\x00\x00"
    )
    assert decompress(frame) == payload


def test_frame_with_content_checksum_by_hand():
    from plz4_tpu.xxh32 import xxh32

    flg = 0b0110_0100  # + content checksum
    bd = 0b0100_0000
    hc = (xxh32(bytes([flg, bd])) >> 8) & 0xFF
    payload = b"checksummed"
    block = bytes([(len(payload) << 4) | 0]) + payload
    frame = (
        (0x184D2204).to_bytes(4, "little")
        + bytes([flg, bd, hc])
        + len(block).to_bytes(4, "little")
        + block
        + b"\x00\x00\x00\x00"
        + xxh32(payload).to_bytes(4, "little")
    )
    assert decompress(frame) == payload
