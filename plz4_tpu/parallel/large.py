"""Device large-block paths (256 KiB / 1 MiB / 4 MiB frame blocks).

The SMEM kernels are chunk-sized, but the frame format's block classes go
to 4 MiB with a 4 MiB default (reference: descriptor/index.go:92-125,
plz4_opts.go:238-255). A large block is handled as K chunks of 64 KiB:

  * encode — every chunk encodes INDEPENDENTLY (in parallel on device)
    through the window-prefix kernel with the previous chunk as window;
    because the chunk span equals the LZ4 window, [prev|cur] fully covers
    every position's true 64 KiB reach, so per-chunk streams contain
    exactly the matches a monolithic encoder could use (only the per-chunk
    MFLIMIT tails and per-chunk finder state differ — measured +-0.2% vs
    monolithic). The native stitcher (lz4r_stitch_chunks) then merges the
    per-chunk streams into ONE standard LZ4 block, carrying trailing
    literal runs across boundaries.

  * decode — the native splitter (lz4r_chunk_split) walks the sequence
    structure (control plane only: it skips literal bytes) and cuts the
    stream into <= 64 KiB-output records with carry metadata; the device
    decodes each block's records sequentially in one dispatch (a lax.scan
    carrying the 64 KiB window through the carry-mode dict kernel,
    ops/decode_pallas.decode_chunks_batch_pallas). Bulk byte movement
    stays on device; the host does O(sequences) pointer walking.

Blocks shard across the mesh on the BLOCK axis (chunk windows are built
by an axis-1 shift, so no cross-shard gathers). Non-TPU backends (the
portable path) decode large blocks through the native host codec — the
carry-record formulation targets the scalar core; the XLA array decoder
stays the <= 64 KiB portable fallback.

Block checksums for large blocks are computed by the native xxh32 at
assemble time (the stitched bytes exist host-side only); <= 64 KiB device
frames keep the zero-host-hash on-device scheme (parallel/batch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import errors as zerr
from .. import native
from . import mesh as mesh_mod

CHUNK = 65536
# decode-record input slice cap: 64 KiB of literals + their length
# extension (+258) + ONE crossing sequence's length extension (a 4 MiB
# match/literal run costs <= 4 MiB/255 ~= 16450 ext bytes, charged to the
# record where its token lives) + headers/slack
CHUNK_IN = 83968
@functools.partial(jax.jit, static_argnames=("level",))
def _encode_large_batch(rows, lens, dict0, dlen0, level: int):
    """rows (B, K, CHUNK) uint8, lens (B, K) i32, dict0 (B, CHUNK) uint8
    right-aligned per-block window for chunk 0 (linked/dict mode), dlen0
    (B,) i32. Windows for chunk k>0 are the previous chunk (axis-1 shift —
    mesh-sharding on the block axis stays gather-free)."""
    from . import batch as batch_mod

    B, K, C = rows.shape
    wins = jnp.concatenate([dict0[:, None, :], rows[:, :-1, :]], axis=1)
    prev_full = jnp.concatenate(
        [dlen0[:, None], jnp.full((B, K - 1), C, jnp.int32)], axis=1)
    wlens = jnp.where(lens > 0, prev_full, 0)
    # stride-2 window preload: the per-chunk 64 Ki-position seed loop is
    # the dominant fixed cost of chunked encode; every-other-position
    # seeding measured +21% speed for <= 0.23% size (the window here is
    # the block's own previous chunk, not a user dictionary)
    out, totals, ok = batch_mod.dispatch_encode_dict(
        rows.reshape(B * K, C), lens.reshape(B * K),
        wins.reshape(B * K, C), wlens.reshape(B * K), level, wstride=2)
    return (out.reshape(B, K, -1), totals.reshape(B, K),
            ok.reshape(B, K))


def encode_large_begin(blocks, block_size: int, level: int = 1,
                       dicts=None, with_checksums: bool = False):
    """Large-block analog of batch.encode_blocks_begin: blocks may mix
    sizes (a frame's tail block can be <= 64 KiB — those route through the
    normal chunk-sized batch); returns a Pending with the same result
    layout."""
    from . import batch as batch_mod

    small_idx = [i for i, b in enumerate(blocks) if len(b) <= CHUNK]
    large_idx = [i for i, b in enumerate(blocks) if len(b) > CHUNK]
    small_pending = None
    if small_idx:
        small_pending = batch_mod.encode_blocks_begin(
            [blocks[i] for i in small_idx], CHUNK, level=level,
            dicts=[dicts[i] for i in small_idx] if dicts else None,
            with_checksums=with_checksums)
    if not large_idx:
        return small_pending

    mesh = mesh_mod.active_mesh()
    # pow2 batch + BD-class chunk count: one compiled shape per frame
    # config (tail batches/blocks reuse it; empty chunk rows are ~free)
    B = mesh_mod.pad_batch_for_mesh(batch_mod._pow2(len(large_idx)), mesh)
    K = max(block_size,
            max(len(blocks[i]) for i in large_idx)) // CHUNK
    arr, arr_raw = batch_mod._stage((B, K, CHUNK))
    lens, lens_raw = batch_mod._stage((B, K), np.int32)
    d0, d0_raw = batch_mod._stage((B, CHUNK))
    dl0, dl0_raw = batch_mod._stage((B,), np.int32)
    staging = [arr_raw, lens_raw, d0_raw, dl0_raw]
    for j, i in enumerate(large_idx):
        blk = np.frombuffer(blocks[i], dtype=np.uint8)
        kb = (len(blk) + CHUNK - 1) // CHUNK
        arr[j, :kb].reshape(-1)[: len(blk)] = blk
        for k in range(kb):
            lens[j, k] = min(CHUNK, len(blk) - k * CHUNK)
        d = dicts[i] if dicts else None
        if d:
            d = d[-CHUNK:]
            d0[j, CHUNK - len(d):] = np.frombuffer(d, dtype=np.uint8)
            dl0[j] = len(d)
    a, l, da, dl = batch_mod._shard_args(mesh, arr, lens, d0, dl0)
    out, totals, okf = _encode_large_batch(a, l, da, dl, level)

    def assemble():
        smalls = small_pending.result() if small_pending else []
        outs = batch_mod._fetch(out)
        tot = batch_mod._fetch(totals)
        results: list = [None] * len(blocks)
        for si, r in zip(small_idx, smalls):
            results[si] = r
        for j, i in enumerate(large_idx):
            blk = blocks[i]
            kb = (len(blk) + CHUNK - 1) // CHUNK
            streams = []
            for k in range(kb):
                t = int(tot[j, k])
                if t >= outs.shape[2]:  # kernel overflow sentinel
                    streams = None
                    break
                streams.append(outs[j, k, :t].tobytes())
            stored, raw = blk, True
            if streams is not None:
                st = native.stitch_chunks(blk, CHUNK, streams)
                if st is not None and len(st) < len(blk):
                    stored, raw = st, False
            if with_checksums:
                results[i] = (stored, raw, native.xxh32(stored))
            else:
                results[i] = (stored, raw)
        return results

    return batch_mod.Pending(assemble, staging)


@functools.partial(jax.jit, static_argnames=())
def _decode_large_batch(rows, metas, win0s):
    from ..ops import decode_pallas

    return decode_pallas.decode_chunks_batch_pallas(rows, metas, win0s)


def decode_large_begin(stored, block_size: int, dict_=None, checksums=None):
    """Large-block analog of batch.decode_blocks_begin for frames whose BD
    class exceeds 64 KiB. Per compressed block, the native splitter
    yields its record layout; single-record blocks take the normal
    chunk-sized batch (fast kernels), multi-record blocks the sequential
    scan. Raw blocks pass through. Corruption (split failure, record
    mismatch, checksum) surfaces at result() time in consume order."""
    from . import batch as batch_mod

    results: list = [None] * len(stored)
    small_idx: list[int] = []      # single carry-free record, normal path
    large: list[tuple[int, np.ndarray]] = []   # (block idx, records)
    failed: list[int] = []         # malformed at split time
    host_idx: list[int] = []       # safety valve: record exceeds CHUNK_IN
    for i, (data, unc) in enumerate(stored):
        if unc:
            results[i] = data
            continue
        recs = native.chunk_split(data, CHUNK, max_out=block_size)
        if recs is None:
            failed.append(i)
        elif len(recs) == 1 and len(data) <= CHUNK:
            small_idx.append(i)
        elif int(recs[:, 1].max()) > CHUNK_IN - 8:  # pragma: no cover
            host_idx.append(i)
        else:
            large.append((i, recs))

    small_pending = None
    if small_idx:
        small_pending = batch_mod.decode_blocks_begin(
            [(stored[i][0], False) for i in small_idx], CHUNK,
            dict_=dict_,
            checksums=[checksums[i] for i in small_idx]
            if checksums else None)

    staging: list = []
    out = ns = oks = None
    if large:
        if not batch_mod._use_pallas():
            # portable path: the carry-record formulation targets the
            # scalar-core kernel; elsewhere the native codec is the
            # second backend (SURVEY §2.4)
            host_idx.extend(i for i, _ in large)
            large = []
        else:
            mesh = mesh_mod.active_mesh()
            # pow2 batch + BD-class record count: one compiled scan shape
            # per frame config (padding records are no-op decodes)
            B = mesh_mod.pad_batch_for_mesh(
                batch_mod._pow2(len(large)), mesh)
            K = max(max(len(recs) for _, recs in large),
                    block_size // CHUNK + 1)
            rows, rows_raw = batch_mod._stage((B, K, CHUNK_IN))
            metas, metas_raw = batch_mod._stage((B, K, 7), np.int32)
            win0s, win0s_raw = batch_mod._stage((B, CHUNK))
            staging = [rows_raw, metas_raw, win0s_raw]
            dlen0 = min(len(dict_), CHUNK) if dict_ else 0
            for j, (i, recs) in enumerate(large):
                ca = np.frombuffer(stored[i][0], dtype=np.uint8)
                for k, r in enumerate(recs):
                    in_off, in_len = int(r[0]), int(r[1])
                    rows[j, k, :in_len] = ca[in_off:in_off + in_len]
                    metas[j, k] = [in_len, CHUNK if k else dlen0,
                                   r[2], r[3], r[4], r[5], r[6]]
                if dict_:
                    dd = dict_[-CHUNK:]
                    win0s[j, CHUNK - len(dd):] = np.frombuffer(
                        dd, dtype=np.uint8)
            a, m, w = batch_mod._shard_args(mesh, rows, metas, win0s)
            out, ns, oks = _decode_large_batch(a, m, w)

    def assemble():
        # consume order: verify/raise for each block in frame order
        def check_sum(i):
            if checksums is not None and checksums[i] is not None:
                if native.xxh32(stored[i][0]) != checksums[i]:
                    raise zerr.ErrBlockHash

        if checksums is not None:
            for i, (data, unc) in enumerate(stored):
                if unc and checksums[i] is not None:
                    if native.xxh32(data) != checksums[i]:
                        raise zerr.ErrBlockHash
        if failed:
            for i in failed:
                check_sum(i)  # checksum failure reports first if both
            raise zerr.ErrDecompress
        for i in host_idx:
            check_sum(i)
            results[i] = native.decompress(stored[i][0], block_size,
                                           dict_=dict_)
        smalls = small_pending.result() if small_pending else []
        for si, r in zip(small_idx, smalls):
            results[si] = r
        if large:
            outs_h = batch_mod._fetch(out)
            ns_h = batch_mod._fetch(ns)
            oks_h = batch_mod._fetch(oks)
            for j, (i, recs) in enumerate(large):
                check_sum(i)
                parts = []
                for k, r in enumerate(recs):
                    want = int(r[6])
                    if not int(oks_h[j, k]) or int(ns_h[j, k]) != want:
                        raise zerr.ErrDecompress
                    parts.append(outs_h[j, k, :want].tobytes())
                results[i] = b"".join(parts)
        return results

    return batch_mod.Pending(assemble, staging)
