"""Host<->device block batching for the JAX codec.

Pads ragged blocks into fixed-shape (B, N) batches (bucketed to powers of
two to bound recompilation), dispatches the vectorized encode/decode
kernels — sharded over the active mesh when one is set — and compacts the
ragged results back out (the reference's CompressBound-buffer + size-word
scheme, blk/blk.go:69-106, reborn as static-shape SPMD batches).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import errors as zerr
from ..ops import decode_jax, encode_jax
from . import mesh as mesh_mod

EMPTY_BLOCK = b"\x00"  # 1-byte literals-only token: decodes to b""


def _use_pallas() -> bool:
    """Pallas SMEM kernels are the fast path on real TPUs; the XLA array
    formulation is the portable fallback (CPU/GPU/interpret, and the
    dictionary paths the kernels don't cover yet)."""
    if os.environ.get("PLZ4_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# deep-tier (device levels >= 10) chain-walk budgets: the device analog
# of the reference's per-level attempt ladder (clz4/lz4hc.c k_clTable);
# measured on chip at 14.7/12.4/11.8 MB/s per chip for ratio
# 2.474/2.489/2.492 on the bench corpus (docs/perf_notes.md round-4)
# level 9 joins the deep family at a 2-link budget (round-5 A/B: 2.439
# at 21.8 MB/s vs depth-4's 2.422 at 34.0 — a finer ladder rung between
# the depth-4 tier and deep t8)
_DEEP_TRIES = {9: 2, 10: 8, 11: 16, 12: 32}


def dispatch_encode_dict(a, l, da, dl, level: int, wstride: int = 1):
    """Kernel selection for the window-prefix (linked/dict/chunked) encode
    batch: pallas tier ladder on TPU, XLA array path elsewhere. Shared by
    the dict branch below and the large-block chunk path (large.py).
    wstride > 1 strides the window preload (large-block chunks only:
    +21% encode for <= 0.23% size at stride 2, perf_notes round-5)."""
    if _use_pallas():
        from ..ops import encode_pallas

        if level <= 2:
            return encode_pallas.encode_batch_pallas_dict(
                a, l, da, dl, wstride=wstride)
        if level <= 8:
            # HC-class chain kernel: depth-2 at levels 3-7, depth-4 at
            # level 8 (the third device quality tier, VERDICT r3 #5)
            return encode_pallas.encode_batch_pallas_mid_dict(
                a, l, da, dl, depth4=level >= 8, wstride=wstride)
        # hash-chain finder + lazy matching (fourth tier); the 64 KiB-
        # window dict path runs the u16-delta-chain variant (full chain
        # depth, window truncated to 32 KiB) inside the wrapper
        return encode_pallas.encode_batch_pallas_deep_dict(
            a, l, da, dl, tries=_DEEP_TRIES.get(level, 32))
    return encode_jax.encode_batch_dict(a, l, da, dl, level=level)


def _pow2(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(max(1, n))))


@functools.partial(jax.jit, static_argnames=("out_cap", "dict_cap"))
def _decode_batch_dict(comp, clens, dlens, dict_buf, out_cap, dict_cap):
    # dict_buf/dlens broadcast via closure: decode_block takes out_cap as
    # its third POSITIONAL parameter, so a partial binding out_cap by
    # keyword plus a positional dict_buf collides (TypeError)
    def one(c, l):
        return decode_jax.decode_block(c, l, out_cap, dict_=dict_buf,
                                       dlen=dlens, dict_cap=dict_cap)

    return jax.vmap(one)(comp, clens)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _decode_batch_dict_pallas(comp, clens, dict_buf, dlen, out_cap):
    from ..ops import decode_pallas

    def one(args):
        c, l = args
        return decode_pallas.decode_block_pallas_dict(
            c, l, dict_buf, dlen, out_cap=out_cap)

    return jax.lax.map(one, (comp, clens))


@jax.jit
def _hash_padded(out, totals):
    """xxh32 of the leading totals[i] bytes of each row, padding the row
    width to the hash kernel's 16-byte stripe multiple on device."""
    from ..ops import xxh32_jax

    W = out.shape[1]
    if W % 16:
        out = jnp.pad(out, ((0, 0), (0, 16 - W % 16)))
    return xxh32_jax.xxh32_batch(out, jnp.minimum(totals, W))


def _multiprocess_mesh(mesh) -> bool:
    """True when the mesh spans devices this process cannot address
    (multi-controller JAX: every process runs this same code SPMD)."""
    try:
        me = jax.process_index()
        return any(d.process_index != me for d in mesh.devices.flat)
    except Exception:  # pragma: no cover
        return False


def _shard_args(mesh, *arrays):
    """Callers pass HOST numpy arrays: the multi-process branch slices
    addressable shards straight from host memory (uploading the full
    batch first would round-trip every byte through a device for
    nothing), and the single-process branch does the one H2D put."""
    if mesh is None:
        return arrays
    sh = mesh_mod.batch_sharding(mesh)
    if not _multiprocess_mesh(mesh):
        return tuple(jax.device_put(a, sh) for a in arrays)
    # multi-process: every controller holds the full host batch (the frame
    # layer is replicated work); each contributes its addressable shards
    # (reference analog: distributing the inChan fan-out across hosts,
    # SURVEY.md §5.8)
    return tuple(
        jax.make_array_from_callback(a.shape, sh, lambda idx, a=a: a[idx])
        for a in arrays)


def _fetch(arr) -> np.ndarray:
    """Device->host for possibly non-fully-addressable global arrays: the
    multi-process path all-gathers so every controller can reassemble the
    frame (host-0 reassembly analog, SURVEY.md §5.8 — gathering to every
    host keeps the SPMD controllers in lockstep)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def _stage(shape, dtype=np.uint8):
    """Zeroed staging array backed by the native buffer pool: fresh multi-MB
    numpy allocations demand-fault at >500 ms/32 MiB on this VM class;
    pooled pages are already faulted (memset is ~100x cheaper). Returns
    (view, backing); give the backing to native.buffer_pool when the
    transfer is complete (Pending.result)."""
    from .. import native as _native

    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
    raw = _native.buffer_pool.take(nbytes)
    view = raw[:nbytes].view(dtype).reshape(shape)
    view.fill(0)
    return view, raw


class Pending:
    """A dispatched device batch. JAX dispatch is asynchronous, so the
    device computes (and transfers stream) while the caller stages or
    consumes other batches; result() blocks on the fetch and assembles
    host bytes. The engine double-buffers these (reference analog: the
    async reader/writer overlap of staging and compute, SURVEY §2.2 —
    the round-2 device engine ran stage->dispatch->fetch serially)."""

    def __init__(self, assemble, staging, children=()):
        self._assemble = assemble
        self._staging = staging
        self._children = tuple(children)
        self._result = None
        self._done = False

    def result(self):
        if not self._done:
            try:
                self._result = self._assemble()
            finally:
                self._release()
        return self._result

    def discard(self):
        """Abort path: return staging buffers without assembling (no
        device fetch). Used by engine shutdown so in-flight batches do
        not orphan pool buffers. Child pendings (the large-block paths
        split batches into sub-pendings) are discarded recursively."""
        for c in self._children:
            c.discard()
        if not self._done:
            self._release()

    def _release(self):
        from .. import native as _native

        for b in self._staging:
            _native.buffer_pool.give(b)
        self._staging = ()
        self._done = True
        self._assemble = None


def encode_blocks(blocks: list[bytes], block_size: int, level: int = 1,
                  dicts: list[bytes | None] | None = None,
                  with_checksums: bool = False):
    """Synchronous convenience wrapper over encode_blocks_begin."""
    return encode_blocks_begin(
        blocks, block_size, level=level, dicts=dicts,
        with_checksums=with_checksums).result()


def encode_blocks_begin(blocks: list[bytes], block_size: int, level: int = 1,
                        dicts: list[bytes | None] | None = None,
                        with_checksums: bool = False) -> Pending:
    """Dispatch a device encode batch and return a Pending (see Pending:
    the engine overlaps the next batch's staging with this one's compute).

    dicts, when given, supplies a per-block window (linked mode / user
    dictionary) — blocks still encode in parallel because windows were
    snapshotted before dispatch (reference: async/writer.go:412-437).
    Returns [(stored_bytes, uncompressed_flag)] in order, applying the
    incompressible-fallback contract per block; with_checksums=True appends
    a device-computed xxh32 of the stored bytes to each tuple (zero host
    hashing — ops/xxh32_jax batches over the block axis).
    """
    if not blocks:
        return Pending(list, ())
    # validate BEFORE taking pool buffers: a raise here must not leak them
    for blk in blocks:
        if len(blk) > block_size:
            raise zerr.ErrSrcSize
    if block_size > 65536:
        from . import large

        if any(len(b) > large.CHUNK for b in blocks):
            # 256 KiB-4 MiB blocks: encode as window-prefixed 64 KiB
            # chunks in parallel, stitch into standard LZ4 blocks
            return large.encode_large_begin(
                blocks, block_size, level=level, dicts=dicts,
                with_checksums=with_checksums)
        block_size = large.CHUNK  # all blocks fit one chunk row
    mesh = mesh_mod.active_mesh()
    B = mesh_mod.pad_batch_for_mesh(_pow2(len(blocks)), mesh)
    N = block_size
    arr, arr_raw = _stage((B, N))
    lens, lens_raw = _stage((B,), np.int32)
    staging = [arr_raw, lens_raw]
    for i, blk in enumerate(blocks):
        arr[i, : len(blk)] = np.frombuffer(blk, dtype=np.uint8)
        lens[i] = len(blk)

    use_dicts = dicts is not None and any(d for d in dicts)
    if use_dicts:
        D = 65536
        darr, darr_raw = _stage((B, D))
        dlens, dlens_raw = _stage((B,), np.int32)
        staging += [darr_raw, dlens_raw]
        for i, d in enumerate(dicts):
            if d:
                d = d[-D:]
                darr[i, D - len(d):] = np.frombuffer(d, dtype=np.uint8)
                dlens[i] = len(d)
        a, l, da, dl = _shard_args(mesh, arr, lens, darr, dlens)
        out, totals, compressible = dispatch_encode_dict(a, l, da, dl, level)
    else:
        a, l = _shard_args(mesh, arr, lens)
        if _use_pallas():
            from ..ops import encode_pallas

            if level <= 2:
                out, totals, compressible = \
                    encode_pallas.encode_batch_pallas(a, l)
            elif level <= 8:
                # HC-class chain kernel: depth-2 at levels 3-7, depth-4
                # at level 8 (see encode_pallas mid mode)
                out, totals, compressible = \
                    encode_pallas.encode_batch_pallas_mid(
                        a, l, depth4=level >= 8)
            else:
                # deep tier (levels >= 9): hash-chain finder + lazy
                # matching, walk budget widening with the level (the
                # device analog of the reference's per-level attempt
                # ladder, clz4/lz4hc.c k_clTable)
                out, totals, compressible = \
                    encode_pallas.encode_batch_pallas_deep(
                        a, l, tries=_DEEP_TRIES.get(level, 32))
        else:
            out, totals, compressible = encode_jax.encode_batch(
                a, l, level=level)
    dev_comp_hash = dev_raw_hash = None
    if with_checksums:
        from ..ops import xxh32_jax

        # hash both the compressed candidates and the raw blocks on device;
        # host assembly picks per block by the incompressible outcome.
        # The pad/clamp runs INSIDE jit: eager ops on non-fully-addressable
        # sharded arrays are rejected under multi-controller JAX.
        dev_comp_hash = _hash_padded(out, totals)
        dev_raw_hash = xxh32_jax.xxh32_batch(a, l)

    def assemble():
        comp_hash = raw_hash = None
        if with_checksums:
            comp_hash = _fetch(dev_comp_hash)
            raw_hash = _fetch(dev_raw_hash)
        outs = _fetch(out)
        tot = _fetch(totals)
        comp = _fetch(compressible)
        results = []
        for i, blk in enumerate(blocks):
            if len(blk) == 0:
                stored, raw = b"", True
            elif bool(comp[i]) and int(tot[i]) < len(blk):
                stored, raw = outs[i, : int(tot[i])].tobytes(), False
            else:
                stored, raw = blk, True
            if with_checksums:
                if len(blk) == 0:
                    csum = 0x02cc5d05  # xxh32(b"")
                else:
                    csum = int(raw_hash[i]) if raw else int(comp_hash[i])
                results.append((stored, raw, csum))
            else:
                results.append((stored, raw))
        return results

    return Pending(assemble, staging)


def decode_blocks(stored: list[tuple[bytes, bool]], block_size: int,
                  dict_: bytes | None = None,
                  checksums: list | None = None) -> list[bytes]:
    """Synchronous convenience wrapper over decode_blocks_begin."""
    return decode_blocks_begin(
        stored, block_size, dict_=dict_, checksums=checksums).result()


def decode_blocks_begin(stored: list[tuple[bytes, bool]], block_size: int,
                        dict_: bytes | None = None,
                        checksums: list | None = None) -> Pending:
    """Dispatch a device decode batch of (stored_bytes, uncompressed_flag)
    blocks; Pending.result() yields the decoded bytes in order.

    Uncompressed blocks pass through (reference: async/reader.go:149-163
    routes them around the workers). `checksums`, when given, carries the
    frame\'s expected per-block xxh32 values: compressed blocks verify on
    device in one batched hash (ops/xxh32_jax), raw pass-through blocks on
    the host at result() time — consume order, so a corrupt block in a
    read-ahead batch cannot fail ahead of earlier batches' valid data.
    """
    if not stored:
        return Pending(list, ())
    if block_size > 65536:
        from . import large

        # large-BD frames: split each block at sequence boundaries; the
        # sequential record scan decodes multi-chunk blocks on device
        return large.decode_large_begin(stored, block_size, dict_=dict_,
                                        checksums=checksums)
    comp_idx = [i for i, (_, unc) in enumerate(stored) if not unc]
    results: list[bytes | None] = [
        data if unc else None for (data, unc) in stored]

    def verify_raw():
        if checksums is None:
            return
        from .. import native as _native

        for i, (data, unc) in enumerate(stored):
            if unc and checksums[i] is not None:
                if _native.xxh32(data) != checksums[i]:
                    raise zerr.ErrBlockHash

    if not comp_idx:
        return Pending(lambda: (verify_raw(), results)[1], ())
    # validate BEFORE taking pool buffers: a raise here must not leak them
    for i in comp_idx:
        if len(stored[i][0]) > block_size:
            raise zerr.ErrBlockSizeOverflow

    mesh = mesh_mod.active_mesh()
    B = mesh_mod.pad_batch_for_mesh(_pow2(len(comp_idx)), mesh)
    C = block_size + 16
    arr, arr_raw = _stage((B, C))
    clens, clens_raw = _stage((B,), np.int32)
    staging = [arr_raw, clens_raw]
    clens.fill(1)
    arr[:, 0] = EMPTY_BLOCK[0]
    for j, i in enumerate(comp_idx):
        data = stored[i][0]
        arr[j, : len(data)] = np.frombuffer(data, dtype=np.uint8)
        clens[j] = len(data)

    if dict_:
        D = _pow2(max(16, len(dict_)))
        dbuf = np.zeros((D,), dtype=np.uint8)
        dbuf[D - len(dict_):] = np.frombuffer(dict_, dtype=np.uint8)
        a, l = _shard_args(mesh, arr, clens)
        if _use_pallas():
            from ..ops import decode_pallas

            out, n_out, ok = _decode_batch_dict_pallas(
                a, l, jnp.asarray(dbuf), jnp.int32(len(dict_)),
                out_cap=block_size)
        else:
            out, n_out, ok = _decode_batch_dict(
                a, l, jnp.int32(len(dict_)), jnp.asarray(dbuf),
                out_cap=block_size, dict_cap=D)
    else:
        a, l = _shard_args(mesh, arr, clens)
        if _use_pallas():
            from ..ops import decode_pallas

            out, n_out, ok = decode_pallas.decode_batch_pallas(
                a, l, out_cap=block_size)
        else:
            out, n_out, ok = decode_jax.decode_batch(a, l, out_cap=block_size)

    dev_hash = None
    if checksums is not None and any(
            checksums[i] is not None for i in comp_idx):
        from ..ops import xxh32_jax

        dev_hash = xxh32_jax.xxh32_batch(a, l)

    def assemble():
        verify_raw()
        if dev_hash is not None:
            got = _fetch(dev_hash)
            for j, i in enumerate(comp_idx):
                want = checksums[i]
                if want is not None and int(got[j]) != want:
                    raise zerr.ErrBlockHash
        outs = _fetch(out)
        n = _fetch(n_out)
        okv = _fetch(ok)
        for j, i in enumerate(comp_idx):
            if not bool(okv[j]):
                raise zerr.ErrDecompress
            results[i] = outs[j, : int(n[j])].tobytes()
        return results

    return Pending(assemble, staging)
