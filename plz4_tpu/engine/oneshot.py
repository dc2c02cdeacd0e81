"""One-shot fast paths for bytes-in/bytes-out (de)compression.

The streaming Reader pays per-block Python bookkeeping on the consumer
thread, which caps throughput regardless of worker parallelism. When the
whole compressed input is already in memory and no streaming feature is
engaged (progress/skip callbacks, read offset, dictionaries), decompression
can instead:

  1. parse every frame's block table in one tight pass (cheap),
  2. fan the block list out to the pool in a few large chunks — each chunk
     is ONE GIL-releasing C batch call that also verifies block checksums,
  3. verify content checksums with one-shot native xxh32 over the
     assembled output (C speed, instead of a streaming serial hasher).

Falls back to the streaming engine (returns None) whenever any condition
is not met, so semantics never change.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .. import errors as zerr
from .. import native
from ..frame import descriptor as desc
from ..frame import header as hdr
from ..opts import Options

_MAGIC = hdr.FRAME_MAGIC
_SKIP_BASE = hdr.SKIP_MAGIC_BASE
_SKIP_MASK = hdr.SKIP_MAGIC_MASK


class _Frame:
    __slots__ = ("header", "blocks", "content_checksum")

    def __init__(self, header):
        self.header = header
        self.blocks = []  # (offset, size, uncompressed, blk_checksum|None)
        self.content_checksum = None


def _parse_stream(data: bytes):
    """Parse all frames' block tables. Returns list[_Frame] or None when a
    frame needs the streaming path (linked blocks)."""
    frames = []
    view = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise zerr.ErrUnexpectedEOF
        magic = int.from_bytes(view[pos : pos + 4], "little")
        if (magic & _SKIP_MASK) == _SKIP_BASE:
            if n - pos < 8:
                raise zerr.ErrUnexpectedEOF
            sz = int.from_bytes(view[pos + 4 : pos + 8], "little")
            pos += 8 + sz
            if pos > n:
                raise zerr.ErrUnexpectedEOF
            continue
        if magic != _MAGIC:
            raise zerr.ErrMagic
        # reuse the validated header parser on a slice
        import io

        rd = io.BytesIO(data[pos : pos + hdr.MAX_HEADER_SIZE])
        h = hdr.read_header(rd)
        if h is None or not h.block_independent:
            return None
        pos += h.size
        fr = _Frame(h)
        bx = h.block_checksum
        maxb = h.block_size
        while True:
            if n - pos < 4:
                raise zerr.ErrUnexpectedEOF
            word = int.from_bytes(view[pos : pos + 4], "little")
            pos += 4
            stored, unc = desc.parse_size_word(word)
            if stored == 0 and not unc:
                if h.content_checksum:
                    if n - pos < 4:
                        raise zerr.ErrUnexpectedEOF
                    fr.content_checksum = int.from_bytes(
                        view[pos : pos + 4], "little")
                    pos += 4
                break
            if stored > maxb:
                raise zerr.ErrBlockSizeOverflow
            if n - pos < stored:
                raise zerr.ErrUnexpectedEOF
            blk_sum = None
            end = pos + stored
            if bx:
                if n - end < 4:
                    raise zerr.ErrUnexpectedEOF
                blk_sum = int.from_bytes(view[end : end + 4], "little")
            fr.blocks.append((pos, stored, unc, blk_sum))
            pos = end + (4 if bx else 0)
        frames.append(fr)
    return frames


def _decode_chunk_into(data, blocks, cap, out_buf, out_offs):
    """Worker: verify block checksums + decompress a chunk of blocks
    DIRECTLY into their final offsets of the shared output buffer (one
    GIL-releasing C batch call, zero per-block output allocations).
    Returns the per-block decoded sizes."""
    lib = native._load()
    for off, sz, unc, want in blocks:
        if want is not None:
            got = lib.lz4r_xxh32(
                native._as_u8p(data[off : off + sz]), sz, 0)
            if int(got) != want:
                raise zerr.ErrBlockHash
    comp = [data[off : off + sz] for (off, sz, unc, _) in blocks if not unc]
    comp_offs = [o for o, (_, _, unc, _) in zip(out_offs, blocks) if not unc]
    if comp:
        comp_sizes = native.decompress_batch_into(
            comp, out_buf, np.asarray(comp_offs, dtype=np.int64), cap)
    it = iter(comp_sizes) if comp else iter(())
    sizes = []
    for dst_off, (off, sz, unc, _) in zip(out_offs, blocks):
        if unc:
            out_buf[dst_off : dst_off + sz] = np.frombuffer(
                data, dtype=np.uint8, count=sz, offset=off)
            sizes.append(sz)
        else:
            sizes.append(int(next(it)))
    return sizes


def _encode_chunk_wire(view, spans, level, cap, bx):
    """Worker: compress a chunk of block spans AND assemble the chunk's
    frame wire bytes (size words, raw-fallback flag, optional block
    checksums) in one pass. The batch call writes each block's compressed
    data 4 bytes past its slot start so the size word drops straight in
    front — framing runs inside the worker (parallel, one output copy)
    instead of serially per block on the caller thread."""
    import struct

    n = len(spans)
    tail = 4 if bx else 0
    slot = 4 + cap + tail
    views = [view[a:b] for a, b in spans]
    dst = native.buffer_pool.take(n * slot)
    try:
        out_sizes = native.compress_batch_into(
            views, dst, np.arange(n, dtype=np.int64) * slot + 4, cap,
            level=level)
        dmv = memoryview(dst)
        sz_list = out_sizes.tolist()
        total = 0
        stored = []
        for i in range(n):
            sz = sz_list[i]
            a, b = spans[i]
            blen = b - a
            base = i * slot
            if sz <= 0 or sz >= blen:  # incompressible: store raw
                dmv[base + 4 : base + 4 + blen] = views[i]
                word = blen | 0x80000000
                sz = blen
            else:
                word = sz
            struct.pack_into("<I", dmv, base, word)
            if bx:
                csum = native.xxh32(dst[base + 4 : base + 4 + sz])
                struct.pack_into("<I", dmv, base + 4 + sz, csum)
            ln = 4 + sz + tail
            stored.append(ln)
            total += ln
        wire = bytearray(total)
        pos = 0
        for i in range(n):
            ln = stored[i]
            base = i * slot
            wire[pos : pos + ln] = dmv[base : base + ln]
            pos += ln
    finally:
        # dst is private to this worker, so returning it on error paths is
        # safe (unlike decompress_bytes' shared buffer — see its comment)
        native.buffer_pool.give(dst)
    return wire  # bytes-like; the caller's b"".join accepts it


def _submitter(o: Options):
    """(submit, cleanup) pair: the caller's shared worker pool when set
    (WithWorkerPool analog — keeps the process-wide thread cap intact),
    else a private executor torn down after the call."""
    if o.worker_pool is not None:
        return o.worker_pool.submit, (lambda: None)
    pool = ThreadPoolExecutor(max_workers=o.resolved_parallel())
    return pool.submit, (
        lambda: pool.shutdown(wait=True, cancel_futures=True))


def compress_bytes(data: bytes, o: Options):
    """Fast one-shot compress; returns bytes or None to fall back.

    Parses nothing — just blocks the input, fans chunks to the pool (each
    chunk one GIL-releasing C batch call that also assembles the chunk's
    frame wire bytes in the worker), and
    computes the content checksum with one one-shot native xxh32 pass."""
    if (o.progress is not None or o.block_linked or o.dictionary is not None
            or o.backend == "device" or o.resolved_parallel() == 0
            or len(data) == 0):
        return None
    from ..frame import header as hdr_mod, trailer

    bs = o.block_size
    view = memoryview(data)
    spans = [(i, min(i + bs, len(data))) for i in range(0, len(data), bs)]
    workers = o.resolved_parallel()
    n_chunks = min(len(spans), workers * 2)
    per = (len(spans) + n_chunks - 1) // n_chunks

    submit, cleanup = _submitter(o)
    try:
        futs = [
            submit(_encode_chunk_wire, view, spans[i : i + per], o.level,
                   bs, o.block_checksum)
            for i in range(0, len(spans), per)
        ]
        content_hash = (native.xxh32(np.frombuffer(data, dtype=np.uint8))
                        if o.content_checksum else None)
        pieces = [hdr_mod.write_header(
            block_size_idx=o.block_size_idx,
            block_linked=False,
            block_checksum=o.block_checksum,
            content_checksum=o.content_checksum,
            content_size=o.content_size,
            dict_id=o.dict_id,
        )]
        pieces.extend(fut.result() for fut in futs)
        if o.content_size is not None and o.content_size != len(data):
            raise zerr.ErrContentSize
        pieces.append(trailer.write_trailer(content_hash))
        return b"".join(pieces)
    finally:
        cleanup()


def decompress_bytes(data: bytes, o: Options):
    """Fast one-shot decompress; returns bytes or None to fall back."""
    if (o.progress is not None or o.skip_callback is not None
            or o.read_offset is not None or o.dictionary is not None
            or o.dict_callback is not None or o.backend == "device"
            or o.resolved_parallel() == 0):
        return None
    frames = _parse_stream(data)
    if frames is None:
        return None
    view = memoryview(data)
    workers = o.resolved_parallel()
    submit, cleanup = _submitter(o)
    out_buf = None
    ok = False
    try:
        # layout: every frame's blocks decode into slot offsets (stride =
        # block size) of ONE shared buffer; when all non-final blocks fill
        # their slots (the overwhelmingly common case) the result is
        # already contiguous and assembly is a single slice
        total_cap = sum(
            fr.header.block_size * len(fr.blocks) for fr in frames)
        out_buf = native.buffer_pool.take(total_cap)
        results = []
        base = 0
        for fr in frames:
            blocks = fr.blocks
            bs = fr.header.block_size
            if not blocks:
                results.append((fr, base, [], []))
                continue
            n_chunks = min(len(blocks), workers * 2)
            per = (len(blocks) + n_chunks - 1) // n_chunks
            futs = []
            chunk_offs = []
            for i in range(0, len(blocks), per):
                offs = [base + (i + j) * bs
                        for j in range(len(blocks[i : i + per]))]
                futs.append(submit(_decode_chunk_into, view,
                                   blocks[i : i + per], bs, out_buf, offs))
                chunk_offs.append(offs)
            results.append((fr, base, futs, chunk_offs))
            base += bs * len(blocks)

        pieces = []
        for fr, base, futs, chunk_offs in results:
            sizes = []
            for fut in futs:
                sizes.extend(fut.result())
            bs = fr.header.block_size
            out_sz = sum(sizes)
            h = fr.header
            if (o.content_size_check and h.content_size is not None
                    and out_sz != h.content_size):
                raise zerr.ErrContentSize
            if all(s == bs for s in sizes[:-1]):
                frame_view = out_buf[base : base + out_sz]
            else:
                # rare: flush-boundary partial blocks mid-frame — compact
                parts = []
                off = base
                for s in sizes:
                    parts.append(out_buf[off : off + s])
                    off += bs
                frame_view = np.concatenate(parts) if parts else \
                    out_buf[base:base]
            if h.content_checksum and fr.content_checksum is not None:
                if native.xxh32(frame_view) != fr.content_checksum:
                    raise zerr.ErrContentHash
            pieces.append(frame_view)
        if len(pieces) == 1:
            result = pieces[0].tobytes()
        else:
            result = b"".join(p.tobytes() for p in pieces)
        ok = True
        return result
    finally:
        cleanup()
        if ok:
            # all futures resolved and the result copied out: the scratch
            # buffer can be reused (on errors it is dropped instead — a
            # shared-pool worker might still be writing into it)
            native.buffer_pool.give(out_buf)
