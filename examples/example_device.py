"""Device-backend example: block-parallel LZ4 over a JAX device mesh.

Runs anywhere JAX runs. On a CPU-only machine, simulate a pod slice:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/example_device.py

On TPU hardware the same code shards blocks across the real chips
(pallas SMEM kernels per chip; no collectives in the hot path).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import plz4_tpu as plz4
from plz4_tpu.parallel import dist, mesh as mesh_mod, use_mesh


def main():
    import jax

    import plz4_tpu

    plz4_tpu.force_cpu_if_requested()

    plz4_tpu_devices = jax.devices()
    print(f"devices: {len(plz4_tpu_devices)} x {plz4_tpu_devices[0].platform}")

    data = (b"the quick brown fox jumps over the lazy dog " * 20000
            + os.urandom(100000))

    # 1. one-shot with explicit mesh sharding (blocks -> chips)
    mesh = mesh_mod.make_block_mesh()
    comp = dist.compress_sharded(data, mesh=mesh, content_checksum=False,
                                 block_checksum=True)
    out = dist.decompress_sharded(comp, mesh=mesh)
    assert out == data
    print(f"sharded frame: {len(data)} -> {len(comp)} bytes "
          f"(ratio {len(data) / len(comp):.2f}), block checksums computed "
          f"and verified ON DEVICE (ops/xxh32_jax)")

    # 2. the same through the ordinary API: backend='device' under a mesh
    with use_mesh(mesh):
        comp2 = plz4.compress(data, backend="device", level=6,
                              content_checksum=False)
        assert plz4.decompress(comp2, backend="device") == data
    print(f"backend='device' level 6 (mid kernel on TPU): "
          f"{len(comp2)} bytes (ratio {len(data) / len(comp2):.2f})")

    # 3. streams interoperate freely with the host codec
    assert plz4.decompress(comp2) == data
    host = plz4.compress(data, level=6)
    with use_mesh(mesh):
        assert plz4.decompress(host, backend="device") == data
    print("host <-> device streams fully interchangeable")


if __name__ == "__main__":
    main()
