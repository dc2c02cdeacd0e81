"""Device-mesh management for sharded block codec execution.

Blocks are the data-parallel unit (the reference's NParallel worker fan-out,
async/writer.go:232-282, maps to a batch axis sharded over chips). The batch
axis is sharded with a NamedSharding over the "blocks" mesh axis; XLA then
executes the vmapped codec SPMD across chips with no cross-chip collectives
in the hot path (blocks are independent), and results gather to host 0 for
frame-order reassembly (the writeLoop analog, async/writer.go:284-381).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"

_state = threading.local()


def make_block_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices with a single 'blocks' axis."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def set_mesh(mesh: Optional[Mesh]) -> None:
    _state.mesh = mesh


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    prev = active_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (block-batch) axis across the mesh."""
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_for_mesh(b: int, mesh: Optional[Mesh]) -> int:
    """Batch size must divide evenly across mesh devices."""
    if mesh is None:
        return b
    n = mesh.size
    return ((b + n - 1) // n) * n
