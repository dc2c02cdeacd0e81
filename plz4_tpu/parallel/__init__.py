"""Device parallelism: block batching, mesh sharding, collectives.

Reference analog: the Go channel/goroutine fan-out (SURVEY.md §2.6) —
re-expressed as batched SPMD execution over a jax.sharding.Mesh, with
blocks data-parallel across chips.
"""

from .mesh import active_mesh, set_mesh, use_mesh  # noqa: F401
