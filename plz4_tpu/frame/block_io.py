"""Data-block framing: size words, per-block checksums, EndMark handling.

Reference: internal/pkg/blk/frame.go (read side) and blk/blk.go:69-109
(write side: size word + incompressible fallback + optional block xxh32).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .. import errors as zerr
from ..xxh32 import xxh32
from . import descriptor as desc
from .header import FrameHeader, _read_exact


@dataclass
class FrameBlock:
    """One de-framed data block (stored form)."""

    data: bytes  # stored payload: compressed bytes, or raw if uncompressed
    uncompressed: bool
    src_size: int  # bytes consumed from the stream for this block
    checksum: Optional[int] = None  # populated only in deferred mode


class FrameBlockReader:
    """Reads framed data blocks until the EndMark.

    After ``next_block`` returns None, ``content_checksum`` holds the frame's
    trailing content hash if the header declared one.
    """

    def __init__(self, rd, header: FrameHeader, hash_fn=xxh32,
                 defer_checksum: bool = False) -> None:
        self._rd = rd
        self._hdr = header
        self._max = header.block_size
        self._hash_fn = hash_fn
        # deferred mode: hand the expected block hash to the caller instead
        # of verifying here — the device engine batch-verifies on chip
        # (ops/xxh32_jax), skipping per-block host hashing
        self._defer = defer_checksum
        self.content_checksum: Optional[int] = None
        self._done = False

    def next_block(self) -> Optional[FrameBlock]:
        if self._done:
            return None
        word_raw = _read_exact(self._rd, 4, zerr.ErrUnexpectedEOF)
        word = int.from_bytes(word_raw, "little")
        stored, uncompressed = desc.parse_size_word(word)
        if stored == 0 and not uncompressed:
            # EndMark (reference: blk/frame.go:179-186)
            self._done = True
            if self._hdr.content_checksum:
                raw = _read_exact(self._rd, 4, zerr.ErrUnexpectedEOF)
                self.content_checksum = int.from_bytes(raw, "little")
            return None
        if stored > self._max:
            raise zerr.ErrBlockSizeOverflow
        data = _read_exact(self._rd, stored, zerr.ErrUnexpectedEOF)
        consumed = 4 + stored
        checksum = None
        if self._hdr.block_checksum:
            raw = _read_exact(self._rd, 4, zerr.ErrUnexpectedEOF)
            consumed += 4
            want = int.from_bytes(raw, "little")
            if self._defer:
                checksum = want
            elif self._hash_fn(data) != want:
                raise zerr.ErrBlockHash
        return FrameBlock(data=data, uncompressed=uncompressed,
                          src_size=consumed, checksum=checksum)


def frame_block(data: bytes, uncompressed: bool, block_checksum: bool,
                hash_fn=xxh32, checksum: Optional[int] = None) -> bytes:
    """Wire form of one stored block: size word + payload + optional xxh32.

    Reference: blk.CompressToBlk framing tail (blk/blk.go:94-106).
    hash_fn lets the engine substitute the native xxh32 hot path;
    `checksum` supplies a precomputed hash (device-side batch hashing).
    """
    out = desc.make_size_word(len(data), uncompressed) + data
    if block_checksum:
        if checksum is None:
            checksum = hash_fn(data)
        out += checksum.to_bytes(4, "little")
    return out
