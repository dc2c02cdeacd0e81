"""Frame trailer: 4-byte EndMark + optional content checksum.

Reference: internal/pkg/trailer/trailer.go:10-19.
"""

from __future__ import annotations

from typing import Optional

END_MARK = b"\x00\x00\x00\x00"


def write_trailer(content_hash: Optional[int] = None) -> bytes:
    """EndMark, optionally followed by the 4-byte LE content xxh32."""
    if content_hash is None:
        return END_MARK
    return END_MARK + (content_hash & 0xFFFFFFFF).to_bytes(4, "little")
