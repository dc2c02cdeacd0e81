"""Distributed/sharded codec paths on the virtual 8-device CPU mesh."""

import jax
import pytest

from plz4_tpu.parallel import dist, mesh as mesh_mod

from conftest import make_compressible, make_incompressible


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return dist.pod_mesh()


def test_pod_mesh_shape(mesh):
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == (mesh_mod.BLOCK_AXIS,)


def test_sharded_roundtrip(mesh):
    data = make_compressible(500_000, seed=70)
    comp = dist.compress_sharded(data, mesh, block_size_idx=4)
    assert dist.decompress_sharded(comp, mesh) == data


def test_sharded_matches_host(mesh):
    """Sharded device output must be a valid frame the host path decodes,
    and vice versa."""
    import plz4_tpu as plz4

    data = make_compressible(300_000, seed=71)
    comp_dev = dist.compress_sharded(data, mesh, block_size_idx=4,
                                     content_checksum=False)
    assert plz4.decompress(comp_dev) == data
    comp_host = plz4.compress(data, block_size_idx=4,
                              content_checksum=False)
    assert dist.decompress_sharded(comp_host, mesh) == data


def test_sharded_incompressible(mesh):
    data = make_incompressible(300_000)
    comp = dist.compress_sharded(data, mesh, block_size_idx=4)
    assert dist.decompress_sharded(comp, mesh) == data


def test_init_distributed_single_host_noop():
    dist.init_distributed()  # must not raise or require a coordinator
    dist.init_distributed(num_processes=1)
