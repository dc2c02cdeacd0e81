"""Frame header read/write + skippable frames.

Reference: internal/pkg/header/{read,write,skip}.go; spec
docs/lz4_Frame_Format.md:70-250,308-341.
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import Callable, Optional

from .. import errors as zerr
from ..xxh32 import xxh32
from . import descriptor as desc

FRAME_MAGIC = 0x184D2204
SKIP_MAGIC_BASE = 0x184D2A50  # low nibble is user-defined (0x50..0x5F)
SKIP_MAGIC_MASK = 0xFFFFFFF0

MIN_HEADER_SIZE = 7
MAX_HEADER_SIZE = 19

# skip_callback(reader, nibble, size): must consume exactly `size` bytes from
# `reader` (a bounded view); any unconsumed remainder is discarded.
SkipCallback = Callable[[io.RawIOBase, int, int], None]


@dataclass
class FrameHeader:
    """Parsed frame descriptor (reference: header.HeaderT)."""

    size: int  # total header bytes consumed, incl. magic
    block_size_idx: int
    block_independent: bool
    block_checksum: bool
    content_checksum: bool
    content_size: Optional[int]
    dict_id: Optional[int]
    raw: bytes = b""

    @property
    def block_size(self) -> int:
        return desc.block_idx_to_size(self.block_size_idx)


def _read_exact(rd, n: int, short_err: Exception) -> bytes:
    """Read exactly n bytes or raise. A zero-byte first read surfaces as the
    given short error; callers handle clean-EOF cases themselves."""
    chunks = []
    got = 0
    while got < n:
        b = rd.read(n - got)
        if not b:
            raise short_err
        chunks.append(b)
        got += len(b)
    return b"".join(chunks)


class _BoundedReader:
    """Read-only view capped at `limit` bytes; prevents skip callbacks from
    over-reading past their skippable frame."""

    def __init__(self, rd, limit: int) -> None:
        self._rd = rd
        self.remaining = limit

    def read(self, n: int = -1) -> bytes:
        if self.remaining <= 0:
            return b""
        if n is None or n < 0 or n > self.remaining:
            n = self.remaining
        b = self._rd.read(n)
        self.remaining -= len(b)
        return b


def _discard(rd, n: int) -> None:
    CHUNK = 1 << 20
    while n > 0:
        b = rd.read(min(n, CHUNK))
        if not b:
            raise zerr.ErrUnexpectedEOF
        n -= len(b)


def write_header(
    *,
    block_size_idx: int,
    block_linked: bool = False,
    block_checksum: bool = False,
    content_checksum: bool = True,
    content_size: Optional[int] = None,
    dict_id: Optional[int] = None,
) -> bytes:
    """Serialize a frame header (reference: header.WriteHeader,
    header/write.go:23-73)."""
    flg = desc.make_flg(
        block_independent=not block_linked,
        block_checksum=block_checksum,
        content_size=content_size is not None,
        content_checksum=content_checksum,
        dict_id=dict_id is not None,
    )
    bd = desc.make_bd(block_size_idx)
    body = bytearray([flg, bd])
    if content_size is not None:
        body += int(content_size).to_bytes(8, "little")
    if dict_id is not None:
        body += int(dict_id).to_bytes(4, "little")
    hc = (xxh32(bytes(body)) >> 8) & 0xFF
    return FRAME_MAGIC.to_bytes(4, "little") + bytes(body) + bytes([hc])


def write_skip_header(nibble: int, size: int) -> bytes:
    """8-byte skippable-frame header (reference: header.WriteSkip,
    header/skip.go:17-33). Caller writes `size` payload bytes after it."""
    if not 0 <= nibble <= 0xF:
        raise zerr.ErrNibble
    if not 0 <= size <= 0xFFFFFFFF:
        raise zerr.ErrSkip
    return (SKIP_MAGIC_BASE | nibble).to_bytes(4, "little") + int(size).to_bytes(
        4, "little"
    )


def _consume_skip_frame(rd, magic: int, skip_callback: Optional[SkipCallback]) -> int:
    """Consume one skippable frame body; returns bytes consumed after magic.

    Reference: header.maybeSkipFrame (header/skip.go:38-76) — the callback
    must consume exactly `size` bytes; remainder is discarded.
    """
    nibble = magic & 0xF
    raw = _read_exact(rd, 4, zerr.ErrUnexpectedEOF)
    size = int.from_bytes(raw, "little")
    if skip_callback is not None:
        bounded = _BoundedReader(rd, size)
        try:
            skip_callback(bounded, nibble, size)
        except Exception as e:  # callback failure poisons the stream
            raise zerr.wrap_corrupted(zerr.ErrSkip) from e
        if bounded.remaining:
            _discard(rd, bounded.remaining)
    else:
        _discard(rd, size)
    return 4 + size


def read_header(
    rd,
    skip_callback: Optional[SkipCallback] = None,
) -> Optional[FrameHeader]:
    """Parse the next frame header from `rd`.

    Returns None on clean EOF at a frame boundary (reference returns io.EOF,
    header/read.go:36-42). Skippable frames are consumed transparently in a
    loop (reference surfaces zerr.EndMark and loops in rdr.Reader,
    rdr/rdr.go:248-252). Raises corruption-class errors on damage and
    ErrUnexpectedEOF on truncation.
    """
    while True:
        first = rd.read(4)
        if not first:
            return None  # clean EOF: no more frames
        if len(first) < 4:
            first += _read_exact(rd, 4 - len(first), zerr.ErrUnexpectedEOF)
        magic = int.from_bytes(first, "little")
        if magic == FRAME_MAGIC:
            break
        if (magic & SKIP_MAGIC_MASK) == SKIP_MAGIC_BASE:
            _consume_skip_frame(rd, magic, skip_callback)
            continue
        raise zerr.ErrMagic

    flg_bd = _read_exact(rd, 2, zerr.ErrUnexpectedEOF)
    flg, bd = flg_bd[0], flg_bd[1]
    info = desc.parse_flg(flg)
    if info["version"] != 1:
        raise zerr.ErrVersion
    if info["reserved"]:
        raise zerr.ErrReserveBitSet
    block_size_idx = desc.parse_bd(bd)

    body = bytearray(flg_bd)
    content_size = None
    if info["content_size"]:
        raw = _read_exact(rd, 8, zerr.ErrUnexpectedEOF)
        content_size = int.from_bytes(raw, "little")
        body += raw
    dict_id = None
    if info["dict_id"]:
        raw = _read_exact(rd, 4, zerr.ErrUnexpectedEOF)
        dict_id = int.from_bytes(raw, "little")
        body += raw

    hc = _read_exact(rd, 1, zerr.ErrUnexpectedEOF)[0]
    want = (xxh32(bytes(body)) >> 8) & 0xFF
    if hc != want:
        raise zerr.ErrHeaderHash

    raw_hdr = first + bytes(body) + bytes([hc])
    return FrameHeader(
        size=len(raw_hdr),
        block_size_idx=block_size_idx,
        block_independent=info["block_independent"],
        block_checksum=info["block_checksum"],
        content_checksum=info["content_checksum"],
        content_size=content_size,
        dict_id=dict_id,
        raw=raw_hdr,
    )
