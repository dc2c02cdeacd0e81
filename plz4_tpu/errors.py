"""Error taxonomy for the TPU-native LZ4 frame codec.

Mirrors the reference's constant error set and its corrupted-vs-short-read
distinction (reference: internal/pkg/zerr/zerr.go:115-145, plz4_err.go:11-45).
Errors are singletons of :class:`Lz4Error`; corruption is a *wrapping* marker
so callers can distinguish "the stream is damaged" from "the stream ended
early" (``io.ErrUnexpectedEOF`` analog) — see :func:`is_corrupted`.
"""

from __future__ import annotations


class Lz4Error(Exception):
    """Base class for all codec errors; singleton-style constant errors."""

    def __init__(self, msg: str):
        super().__init__(msg)
        self.msg = msg

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"Lz4Error({self.msg!r})"


class CorruptedError(Lz4Error):
    """A frame-corruption error (reference: zerr.WrapCorrupted)."""


def _mk(msg: str, corrupted: bool = False) -> Lz4Error:
    cls = CorruptedError if corrupted else Lz4Error
    return cls(msg)


# --- constant error set (reference: zerr/zerr.go) -------------------------

ErrClosed = _mk("use after close")
ErrReadOnly = _mk("the object is read-only")
ErrWriteOnly = _mk("the object is write-only")

# Header / frame structure errors — all corruption class.
ErrMagic = _mk("bad magic value", corrupted=True)
ErrVersion = _mk("unsupported frame version", corrupted=True)
ErrHeaderHash = _mk("header checksum mismatch", corrupted=True)
ErrBlockDescriptor = _mk("invalid block descriptor", corrupted=True)
ErrReserveBitSet = _mk("reserved bit set in descriptor", corrupted=True)
ErrBlockSizeOverflow = _mk("block size exceeds frame maximum", corrupted=True)
ErrBlockHash = _mk("block checksum mismatch", corrupted=True)
ErrContentHash = _mk("content checksum mismatch", corrupted=True)
ErrContentSize = _mk("content size mismatch", corrupted=True)
ErrDecompress = _mk("block decompression failed", corrupted=True)
ErrCompress = _mk("block compression failed (incompressible)")
ErrHeaderRead = _mk("short read in frame header", corrupted=True)
ErrSkip = _mk("skippable frame handling failed", corrupted=True)
ErrNibble = _mk("skippable frame nibble out of range [0,15]")

# I/O contract errors.
ErrUnexpectedEOF = _mk("unexpected end of stream")  # short read, NOT corrupted
ErrReadOffset = _mk("read offset is invalid")
ErrReadOffsetLinked = _mk("read offset unsupported on linked-block frames")
ErrReadOffsetSeek = _mk("seek to read offset failed")

# Option / usage errors.
ErrLevel = _mk("invalid compression level")
ErrBlockSize = _mk("invalid block size index")
ErrParallel = _mk("invalid parallelism")
ErrPending = _mk("invalid pending budget")
ErrDictSize = _mk("dictionary larger than 64 KiB window is truncated")
ErrUnsupported = _mk("operation unsupported in this configuration")
ErrDstSize = _mk("destination buffer too small")
ErrSrcSize = _mk("source buffer invalid")


class EndMark(Exception):
    """Control-flow sentinel: the frame's EndMark was reached.

    The reference drives its reader state machine off a ``zerr.EndMark``
    sentinel error (rdr/rdr.go:60-69); we use a dedicated exception type that
    never escapes the public API.
    """


def wrap_corrupted(err: Exception) -> Lz4Error:
    """Mark *err* as stream corruption (reference: zerr.WrapCorrupted)."""
    if isinstance(err, CorruptedError):
        return err
    out = CorruptedError(str(err))
    out.__cause__ = err
    return out


def is_corrupted(err: BaseException) -> bool:
    """True when *err* indicates LZ4 stream corruption rather than a short
    read or usage error (reference: plz4.Lz4Corrupted, plz4_err.go:43-45)."""
    while err is not None:
        if isinstance(err, CorruptedError):
            return True
        err = err.__cause__  # type: ignore[assignment]
    return False
