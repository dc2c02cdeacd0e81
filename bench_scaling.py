"""Scaling-efficiency benchmark: block-parallel codec over 1..N devices,
measured at the PRODUCTION layer (parallel/batch.encode_blocks /
decode_blocks) — staging, _shard_args, device compute, _fetch and host
compaction included — because host-side serialization is exactly what
breaks scaling first (VERDICT r2 #6; SURVEY §5.8 host-0 reassembly).
The raw-kernel number (encode_jax only, no host path) is printed per
device count as context, so the batch-layer efficiency has a same-run
compute-only yardstick.

BASELINE.md target: >=80% scaling efficiency at 1 chip / 1 host / N hosts.
Runs on whatever devices are visible (a real multi-chip host, or the
virtual CPU mesh for a smoke run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py).

Prints one JSON line per (layer, device count) to stdout and a summary to
stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BLOCK = int(os.environ.get("PLZ4_SCALE_BLOCK", str(64 * 1024)))
PER_DEVICE_BLOCKS = int(os.environ.get("PLZ4_SCALE_BLOCKS", "16"))
REPS = int(os.environ.get("PLZ4_SCALE_REPS", "3"))


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    import plz4_tpu

    plz4_tpu.force_cpu_if_requested()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plz4_tpu.ops import encode_jax
    from plz4_tpu.parallel import batch as batch_mod, mesh as mesh_mod

    plz4_tpu.enable_compile_cache()
    devices = jax.devices()
    _log(f"devices: {len(devices)} x {devices[0].device_kind}")

    rng = np.random.default_rng(7)
    vocab = [bytes(rng.integers(97, 123, int(rng.integers(2, 12)),
                                dtype=np.uint8)) + b" " for _ in range(256)]

    kern_base = batch_base = None
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n_dev in counts:
        B = PER_DEVICE_BLOCKS * n_dev
        out = bytearray()
        while len(out) < B * BLOCK:
            out += vocab[int(rng.integers(len(vocab)))]
        data_np = np.frombuffer(bytes(out[: B * BLOCK]),
                                dtype=np.uint8).reshape(B, BLOCK)
        lens_np = np.full((B,), BLOCK, dtype=np.int32)
        blocks = [data_np[i].tobytes() for i in range(B)]

        mesh = mesh_mod.make_block_mesh(devices[:n_dev])

        # --- raw kernel layer (compute-only yardstick) -------------------
        shard = NamedSharding(mesh, P(mesh_mod.BLOCK_AXIS))
        data = jax.device_put(jnp.asarray(data_np), shard)
        lens = jax.device_put(jnp.asarray(lens_np), shard)

        @jax.jit
        def step(d, l):
            o, totals, _ = encode_jax.encode_batch(d, l)
            return jnp.sum(totals)

        int(step(data, lens))  # compile
        t0 = time.perf_counter()
        for _ in range(REPS):
            int(step(data, lens))
        dt = (time.perf_counter() - t0) / REPS
        kern_gbps = B * BLOCK / 1e9 / dt
        if kern_base is None:
            kern_base = kern_gbps
        kern_eff = kern_gbps / (kern_base * n_dev)

        # --- production batch layer (stage + shard + compute + fetch +
        # compact, exactly what the engine calls) -------------------------
        with mesh_mod.use_mesh(mesh):
            enc = batch_mod.encode_blocks(blocks, BLOCK)  # warm/compile
            t0 = time.perf_counter()
            for _ in range(REPS):
                enc = batch_mod.encode_blocks(blocks, BLOCK)
            dt_e = (time.perf_counter() - t0) / REPS

            stored = [(s, raw) for s, raw in enc]
            dec = batch_mod.decode_blocks(stored, BLOCK)  # warm/compile
            assert dec == blocks, "batch-layer round-trip mismatch"
            t0 = time.perf_counter()
            for _ in range(REPS):
                batch_mod.decode_blocks(stored, BLOCK)
            dt_d = (time.perf_counter() - t0) / REPS

        batch_gbps = B * BLOCK / 1e9 / dt_e
        if batch_base is None:
            batch_base = batch_gbps
        batch_eff = batch_gbps / (batch_base * n_dev)
        dec_gbps = B * BLOCK / 1e9 / dt_d

        _log(f"n={n_dev}: kernel {kern_gbps:.4f} GB/s ({kern_eff:.1%}) | "
             f"batch encode {batch_gbps:.4f} GB/s ({batch_eff:.1%}) | "
             f"batch decode {dec_gbps:.4f} GB/s")
        for metric, val, eff in (
                (f"kernel encode GB/s over {n_dev} devices", kern_gbps,
                 kern_eff),
                (f"batch-layer encode GB/s over {n_dev} devices", batch_gbps,
                 batch_eff),
                (f"batch-layer decode GB/s over {n_dev} devices", dec_gbps,
                 0.0)):
            print(json.dumps({
                "metric": metric,
                "value": round(val, 4),
                "unit": "GB/s",
                "vs_baseline": round(eff, 4),
            }))


if __name__ == "__main__":
    main()
