"""Frame-descriptor bitfields (FLG / BD bytes) and block size words.

LZ4 Frame Format v1.6.x. Reference: internal/pkg/descriptor/{flags,block,
data,index}.go; spec docs/lz4_Frame_Format.md:134-197,252-276.

FLG byte layout (bit 7 = MSB):
    7-6  version (must be 01)
    5    block independence
    4    block checksum present
    3    content size present
    2    content checksum present
    1    reserved (0)
    0    dictionary ID present

BD byte layout:
    7    reserved (0)
    6-4  block maximum size index (4..7)
    3-0  reserved (0)

Block size word (4-byte little endian before each data block):
    bit 31      uncompressed flag
    bits 30-0   stored byte size; 0 with no flag = EndMark
"""

from __future__ import annotations

from .. import errors as zerr

FLG_VERSION_SHIFT = 6
FLG_BLOCK_INDEP = 1 << 5
FLG_BLOCK_CHECKSUM = 1 << 4
FLG_CONTENT_SIZE = 1 << 3
FLG_CONTENT_CHECKSUM = 1 << 2
FLG_RESERVED = 1 << 1
FLG_DICT_ID = 1 << 0

BD_RESERVED_MASK = 0b1000_1111

BLOCK_IDX_64KB = 4
BLOCK_IDX_256KB = 5
BLOCK_IDX_1MB = 6
BLOCK_IDX_4MB = 7

BLOCK_SIZES = {
    BLOCK_IDX_64KB: 64 * 1024,
    BLOCK_IDX_256KB: 256 * 1024,
    BLOCK_IDX_1MB: 1024 * 1024,
    BLOCK_IDX_4MB: 4 * 1024 * 1024,
}

DATA_UNCOMPRESSED_BIT = 0x8000_0000
DATA_SIZE_MASK = 0x7FFF_FFFF


def block_idx_to_size(idx: int) -> int:
    try:
        return BLOCK_SIZES[idx]
    except KeyError:
        raise zerr.ErrBlockSize from None


def block_size_to_idx(size: int) -> int:
    """Smallest standard block index whose size is >= ``size``; clamps like
    the reference (plz4_opts.go:160-164 clamps rather than errors)."""
    for idx in (BLOCK_IDX_64KB, BLOCK_IDX_256KB, BLOCK_IDX_1MB, BLOCK_IDX_4MB):
        if size <= BLOCK_SIZES[idx]:
            return idx
    return BLOCK_IDX_4MB


def make_flg(
    *,
    block_independent: bool,
    block_checksum: bool,
    content_size: bool,
    content_checksum: bool,
    dict_id: bool,
    version: int = 1,
) -> int:
    flg = (version & 0b11) << FLG_VERSION_SHIFT
    if block_independent:
        flg |= FLG_BLOCK_INDEP
    if block_checksum:
        flg |= FLG_BLOCK_CHECKSUM
    if content_size:
        flg |= FLG_CONTENT_SIZE
    if content_checksum:
        flg |= FLG_CONTENT_CHECKSUM
    if dict_id:
        flg |= FLG_DICT_ID
    return flg


def parse_flg(flg: int) -> dict:
    return {
        "version": (flg >> FLG_VERSION_SHIFT) & 0b11,
        "block_independent": bool(flg & FLG_BLOCK_INDEP),
        "block_checksum": bool(flg & FLG_BLOCK_CHECKSUM),
        "content_size": bool(flg & FLG_CONTENT_SIZE),
        "content_checksum": bool(flg & FLG_CONTENT_CHECKSUM),
        "reserved": bool(flg & FLG_RESERVED),
        "dict_id": bool(flg & FLG_DICT_ID),
    }


def make_bd(block_size_idx: int) -> int:
    if block_size_idx not in BLOCK_SIZES:
        raise zerr.ErrBlockSize
    return (block_size_idx & 0b111) << 4


def parse_bd(bd: int) -> int:
    """Returns the block size index; raises on reserved bits / bad index."""
    if bd & BD_RESERVED_MASK:
        raise zerr.ErrReserveBitSet
    idx = (bd >> 4) & 0b111
    if idx not in BLOCK_SIZES:
        raise zerr.ErrBlockDescriptor
    return idx


def make_size_word(stored_size: int, uncompressed: bool) -> bytes:
    word = stored_size & DATA_SIZE_MASK
    if uncompressed:
        word |= DATA_UNCOMPRESSED_BIT
    return word.to_bytes(4, "little")


def parse_size_word(word: int) -> tuple[int, bool]:
    """Returns (stored_size, uncompressed). size==0 & !uncompressed = EndMark."""
    return word & DATA_SIZE_MASK, bool(word & DATA_UNCOMPRESSED_BIT)
