"""Scaling-efficiency benchmark: block-parallel codec over 1..N devices.

BASELINE.md target: >=80% scaling efficiency at 1 chip / 1 host / N hosts.
Blocks are independent, so scaling is expected to be near-linear; this
harness measures it on whatever devices are visible (a real multi-chip
host, or the virtual CPU mesh for a smoke run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py).

Prints one JSON line per device count to stdout and a summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BLOCK = 64 * 1024
PER_DEVICE_BLOCKS = int(os.environ.get("PLZ4_SCALE_BLOCKS", "16"))


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import plz4_tpu
    from plz4_tpu.ops import encode_jax
    from plz4_tpu.parallel import mesh as mesh_mod

    plz4_tpu.enable_compile_cache()
    devices = jax.devices()
    _log(f"devices: {len(devices)} x {devices[0].device_kind}")

    rng = np.random.default_rng(7)
    vocab = [bytes(rng.integers(97, 123, int(rng.integers(2, 12)),
                                dtype=np.uint8)) + b" " for _ in range(256)]

    results = []
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n_dev in counts:
        B = PER_DEVICE_BLOCKS * n_dev
        out = bytearray()
        while len(out) < B * BLOCK:
            out += vocab[int(rng.integers(len(vocab)))]
        data_np = np.frombuffer(bytes(out[: B * BLOCK]),
                                dtype=np.uint8).reshape(B, BLOCK)
        lens_np = np.full((B,), BLOCK, dtype=np.int32)

        mesh = mesh_mod.make_block_mesh(devices[:n_dev])
        shard = NamedSharding(mesh, P(mesh_mod.BLOCK_AXIS))
        data = jax.device_put(jnp.asarray(data_np), shard)
        lens = jax.device_put(jnp.asarray(lens_np), shard)

        @jax.jit
        def step(d, l):
            out, totals, _ = encode_jax.encode_batch(d, l)
            return jnp.sum(totals)

        int(step(data, lens))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            total = int(step(data, lens))
        dt = (time.perf_counter() - t0) / reps
        gbps = B * BLOCK / 1e9 / dt
        results.append((n_dev, gbps))
        base = results[0][1]
        eff = gbps / (base * n_dev) if base else 0.0
        _log(f"n={n_dev}: {gbps:.4f} GB/s encode, efficiency {eff:.1%}")
        print(json.dumps({
            "metric": f"encode GB/s over {n_dev} devices (blocks sharded)",
            "value": round(gbps, 4),
            "unit": "GB/s",
            "vs_baseline": round(eff, 4),
        }))


if __name__ == "__main__":
    main()
