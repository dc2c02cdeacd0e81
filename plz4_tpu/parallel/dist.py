"""Multi-host / multi-chip orchestration.

Reference analog: the in-process Go channel fan-out (SURVEY.md §2.6, §5.8)
— here blocks shard data-parallel across every chip of a pod slice:

  * `init_distributed()` brings up the jax.distributed runtime (one call
    per host process; no-op when single-host).
  * `pod_mesh()` builds the 1-D "blocks" mesh over all global devices.
  * `compress_sharded` / `decompress_sharded` run the frame codec with the
    block batch axis sharded over that mesh. Compression is
    embarrassingly parallel across blocks, so the compiled program has no
    collectives in the hot path; XLA handles cross-host data movement for
    the sharded batches, and the frame-order reassembly happens on the
    calling host (the reference writeLoop reorder analog,
    async/writer.go:284-381).

Serial passes (content xxh32, linked-block decode) stay host-side, exactly
like the reference's dedicated hasher goroutine and its forced NParallel=1
linked decode (async/hash.go, rdr/rdr.go:338-341).
"""

from __future__ import annotations

import io
from typing import Optional

import jax

from .. import opts as opts_mod
from . import mesh as mesh_mod


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime. Call once per host before any
    device computation. Single-host callers may skip this entirely."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh() -> "jax.sharding.Mesh":
    """1-D blocks mesh over every device in the (possibly multi-host)
    runtime."""
    return mesh_mod.make_block_mesh(jax.devices())


def compress_sharded(data: bytes, mesh=None, **kw) -> bytes:
    """One-shot frame compression with blocks sharded over `mesh`
    (default: all devices)."""
    from ..engine.writer import FrameWriter

    mesh = mesh if mesh is not None else pod_mesh()
    out = io.BytesIO()
    kw.setdefault("backend", "device")
    with mesh_mod.use_mesh(mesh):
        w = FrameWriter(out, opts_mod.Options(**kw))
        try:
            w.write(data)
        finally:
            w.close()
    return out.getvalue()


def decompress_sharded(data: bytes, mesh=None, **kw) -> bytes:
    """One-shot frame decompression with blocks sharded over `mesh`."""
    from ..engine.reader import FrameReader

    mesh = mesh if mesh is not None else pod_mesh()
    kw.setdefault("backend", "device")
    with mesh_mod.use_mesh(mesh):
        r = FrameReader(io.BytesIO(data), opts_mod.Options(**kw))
        try:
            return r.read()
        finally:
            r.close()
