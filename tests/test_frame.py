"""Frame wire format unit tests: header read/write, skippable frames,
descriptor bits, trailer, block framing.

Reference test analog: internal/pkg/header/{read,write,skip}_test.go and
internal/test/rd_test.go:26-130 (descriptor-bit corruption cases).
"""

import io

import pytest

from plz4_tpu import errors as zerr
from plz4_tpu.frame import (
    BLOCK_IDX_64KB,
    BLOCK_IDX_4MB,
    FrameHeader,
    read_header,
    write_header,
    write_skip_header,
    write_trailer,
)
from plz4_tpu.frame import descriptor as desc
from plz4_tpu.frame.block_io import FrameBlockReader, frame_block


def roundtrip(**kw) -> FrameHeader:
    raw = write_header(**kw)
    hdr = read_header(io.BytesIO(raw))
    assert hdr is not None
    assert hdr.size == len(raw)
    assert hdr.raw == raw
    return hdr


def test_header_minimal():
    hdr = roundtrip(block_size_idx=BLOCK_IDX_4MB, content_checksum=False)
    assert hdr.block_size_idx == BLOCK_IDX_4MB
    assert hdr.block_independent
    assert not hdr.block_checksum
    assert not hdr.content_checksum
    assert hdr.content_size is None
    assert hdr.dict_id is None
    assert hdr.size == 7


def test_header_all_fields():
    hdr = roundtrip(
        block_size_idx=BLOCK_IDX_64KB,
        block_linked=True,
        block_checksum=True,
        content_checksum=True,
        content_size=123456789,
        dict_id=0xDEADBEEF,
    )
    assert hdr.block_size_idx == BLOCK_IDX_64KB
    assert not hdr.block_independent
    assert hdr.block_checksum
    assert hdr.content_checksum
    assert hdr.content_size == 123456789
    assert hdr.dict_id == 0xDEADBEEF
    assert hdr.size == 19


def test_header_content_size_only():
    hdr = roundtrip(block_size_idx=BLOCK_IDX_4MB, content_size=0)
    assert hdr.content_size == 0
    assert hdr.size == 15


def test_empty_stream_clean_eof():
    assert read_header(io.BytesIO(b"")) is None


def test_truncated_magic():
    with pytest.raises(zerr.Lz4Error):
        read_header(io.BytesIO(b"\x04\x22"))


def test_bad_magic_is_corrupted():
    try:
        read_header(io.BytesIO(b"\x00\x00\x00\x00rest"))
        assert False
    except zerr.Lz4Error as e:
        assert zerr.is_corrupted(e)


def test_header_checksum_corruption():
    raw = bytearray(write_header(block_size_idx=BLOCK_IDX_4MB))
    raw[-1] ^= 0xFF
    with pytest.raises(zerr.Lz4Error) as ei:
        read_header(io.BytesIO(bytes(raw)))
    assert zerr.is_corrupted(ei.value)


def test_reserved_flg_bit_rejected():
    raw = bytearray(write_header(block_size_idx=BLOCK_IDX_4MB))
    raw[4] |= 0b10  # FLG reserved bit
    # fix checksum so only the reserved bit is at fault
    from plz4_tpu.xxh32 import xxh32

    raw[-1] = (xxh32(bytes(raw[4:-1])) >> 8) & 0xFF
    with pytest.raises(zerr.Lz4Error) as ei:
        read_header(io.BytesIO(bytes(raw)))
    assert ei.value is zerr.ErrReserveBitSet


def test_bad_version_rejected():
    raw = bytearray(write_header(block_size_idx=BLOCK_IDX_4MB))
    raw[4] = (raw[4] & 0b00111111) | 0b10000000  # version 2
    from plz4_tpu.xxh32 import xxh32

    raw[-1] = (xxh32(bytes(raw[4:-1])) >> 8) & 0xFF
    with pytest.raises(zerr.Lz4Error) as ei:
        read_header(io.BytesIO(bytes(raw)))
    assert ei.value is zerr.ErrVersion


def test_bd_reserved_bits_rejected():
    raw = bytearray(write_header(block_size_idx=BLOCK_IDX_4MB))
    raw[5] |= 0b1  # BD low reserved bit
    from plz4_tpu.xxh32 import xxh32

    raw[-1] = (xxh32(bytes(raw[4:-1])) >> 8) & 0xFF
    with pytest.raises(zerr.Lz4Error) as ei:
        read_header(io.BytesIO(bytes(raw)))
    assert ei.value is zerr.ErrReserveBitSet


def test_invalid_block_index_rejected():
    raw = bytearray(write_header(block_size_idx=BLOCK_IDX_4MB))
    raw[5] = 0b0011_0000  # idx 3: N/A
    from plz4_tpu.xxh32 import xxh32

    raw[-1] = (xxh32(bytes(raw[4:-1])) >> 8) & 0xFF
    with pytest.raises(zerr.Lz4Error) as ei:
        read_header(io.BytesIO(bytes(raw)))
    assert ei.value is zerr.ErrBlockDescriptor


def test_truncation_sweep_all_offsets():
    """Clip the stream at every header offset: never corrupted-class unless
    the damage is structural (reference: TestShortRead, rd_test.go:521-706)."""
    raw = write_header(
        block_size_idx=BLOCK_IDX_64KB, content_size=77, dict_id=5,
    )
    for cut in range(1, len(raw)):
        with pytest.raises(zerr.Lz4Error) as ei:
            read_header(io.BytesIO(raw[:cut]))
        assert not zerr.is_corrupted(ei.value), f"cut={cut}"


# --- skippable frames ------------------------------------------------------


def test_skip_frame_then_real_frame():
    payload = b"user-metadata"
    stream = (
        write_skip_header(0x7, len(payload))
        + payload
        + write_header(block_size_idx=BLOCK_IDX_4MB)
    )
    seen = []

    def cb(rd, nibble, size):
        seen.append((nibble, size, rd.read(size)))

    hdr = read_header(io.BytesIO(stream), skip_callback=cb)
    assert hdr is not None
    assert seen == [(0x7, len(payload), payload)]


def test_skip_frame_default_discard():
    stream = write_skip_header(0, 5) + b"12345" + write_header(
        block_size_idx=BLOCK_IDX_4MB
    )
    assert read_header(io.BytesIO(stream)) is not None


def test_skip_frame_callback_partial_consume_ok():
    stream = write_skip_header(1, 10) + b"0123456789" + write_header(
        block_size_idx=BLOCK_IDX_4MB
    )

    def cb(rd, nibble, size):
        rd.read(3)  # under-consume; remainder must be discarded

    assert read_header(io.BytesIO(stream), skip_callback=cb) is not None


def test_skip_frame_callback_error_poisons():
    stream = write_skip_header(1, 4) + b"abcd" + write_header(
        block_size_idx=BLOCK_IDX_4MB
    )

    def cb(rd, nibble, size):
        raise ValueError("boom")

    with pytest.raises(zerr.Lz4Error) as ei:
        read_header(io.BytesIO(stream), skip_callback=cb)
    assert zerr.is_corrupted(ei.value)


def test_skip_nibble_validation():
    with pytest.raises(zerr.Lz4Error):
        write_skip_header(16, 0)
    with pytest.raises(zerr.Lz4Error):
        write_skip_header(-1, 0)


def test_back_to_back_skip_frames():
    stream = (
        write_skip_header(0xF, 1) + b"x"
        + write_skip_header(0x0, 0)
        + write_header(block_size_idx=BLOCK_IDX_64KB)
    )
    hdr = read_header(io.BytesIO(stream))
    assert hdr is not None and hdr.block_size_idx == BLOCK_IDX_64KB


def test_skip_frame_truncated_payload():
    stream = write_skip_header(2, 100) + b"short"
    with pytest.raises(zerr.Lz4Error):
        read_header(io.BytesIO(stream))


# --- descriptor helpers ----------------------------------------------------


def test_block_size_mapping():
    assert desc.block_idx_to_size(4) == 64 * 1024
    assert desc.block_idx_to_size(7) == 4 * 1024 * 1024
    assert desc.block_size_to_idx(1) == 4
    assert desc.block_size_to_idx(64 * 1024) == 4
    assert desc.block_size_to_idx(64 * 1024 + 1) == 5
    assert desc.block_size_to_idx(10 << 20) == 7  # clamps


def test_size_word():
    raw = desc.make_size_word(100, True)
    sz, unc = desc.parse_size_word(int.from_bytes(raw, "little"))
    assert (sz, unc) == (100, True)
    sz, unc = desc.parse_size_word(0)
    assert (sz, unc) == (0, False)  # EndMark


# --- trailer + block framing ----------------------------------------------


def test_trailer():
    assert write_trailer() == b"\x00\x00\x00\x00"
    assert write_trailer(0x01020304) == b"\x00\x00\x00\x00\x04\x03\x02\x01"


def _mk_hdr(**kw) -> FrameHeader:
    raw = write_header(**kw)
    return read_header(io.BytesIO(raw))


def test_block_reader_roundtrip():
    hdr = _mk_hdr(block_size_idx=BLOCK_IDX_64KB, block_checksum=True,
                  content_checksum=True)
    body = frame_block(b"stored-bytes", False, True) + write_trailer(0x55AA55AA)
    rd = FrameBlockReader(io.BytesIO(body), hdr)
    blk = rd.next_block()
    assert blk.data == b"stored-bytes" and not blk.uncompressed
    assert rd.next_block() is None
    assert rd.content_checksum == 0x55AA55AA


def test_block_reader_bad_block_crc():
    hdr = _mk_hdr(block_size_idx=BLOCK_IDX_64KB, block_checksum=True,
                  content_checksum=False)
    body = bytearray(frame_block(b"payload", True, True))
    body[-1] ^= 1
    rd = FrameBlockReader(io.BytesIO(bytes(body)), hdr)
    with pytest.raises(zerr.Lz4Error) as ei:
        rd.next_block()
    assert zerr.is_corrupted(ei.value)


def test_block_reader_size_overflow():
    hdr = _mk_hdr(block_size_idx=BLOCK_IDX_64KB, content_checksum=False)
    word = desc.make_size_word(64 * 1024 + 1, False)
    rd = FrameBlockReader(io.BytesIO(word + b"\x00" * 100), hdr)
    with pytest.raises(zerr.Lz4Error) as ei:
        rd.next_block()
    assert ei.value is zerr.ErrBlockSizeOverflow


def test_block_reader_truncated_not_corrupted():
    hdr = _mk_hdr(block_size_idx=BLOCK_IDX_64KB, content_checksum=False)
    body = frame_block(b"0123456789", False, False)
    for cut in range(len(body)):
        rd = FrameBlockReader(io.BytesIO(body[:cut]), hdr)
        with pytest.raises(zerr.Lz4Error) as ei:
            rd.next_block()
        assert not zerr.is_corrupted(ei.value)
