"""Enforced scaling relation (VERDICT r4 next-#7): the production batch
layer (staging + _shard_args + compute + _fetch + compaction) must not
scale WORSE than the raw kernel it wraps. SCALING_r0N.json tracks the
absolute curves per round; this test makes the relation a pytest failure
instead of a JSON diff.

Methodology notes:
  * virtual 8-device CPU mesh on a ~4-vCPU contended VM — absolute
    numbers are meaningless and efficiencies fall off past the physical
    core count for BOTH layers; only the batch/kernel RATIO is asserted.
  * min-of-N timing with one warmup per (layer, n); a failing relation
    is re-measured once before failing (contended-host noise can be
    5-40x on cold iterations, docs/perf_notes.md).
  * tolerance 0.70: catches structural regressions (replicated work,
    serialized staging, a lost shard axis) while riding out timer noise.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from plz4_tpu.ops import encode_jax
from plz4_tpu.parallel import batch as batch_mod, mesh as mesh_mod

BLOCK = 16384
PER_DEVICE_BLOCKS = 4
TOL = 0.70


def _payload(n_blocks: int) -> np.ndarray:
    rng = np.random.default_rng(11)
    vocab = [bytes(rng.integers(97, 123, int(rng.integers(2, 12)),
                                dtype=np.uint8)) + b" " for _ in range(128)]
    out = bytearray()
    while len(out) < n_blocks * BLOCK:
        out += vocab[int(rng.integers(len(vocab)))]
    return np.frombuffer(bytes(out[: n_blocks * BLOCK]),
                         dtype=np.uint8).reshape(n_blocks, BLOCK)


def _min_of(f, n=3):
    f()
    return min(min(f() for _ in range(n)) for _ in range(1))


def _measure(n_dev: int) -> tuple[float, float]:
    """(raw-kernel GB/s, batch-layer GB/s) at n_dev devices."""
    B = PER_DEVICE_BLOCKS * n_dev
    data_np = _payload(B)
    blocks = [data_np[i].tobytes() for i in range(B)]
    lens_np = np.full((B,), BLOCK, dtype=np.int32)
    mesh = mesh_mod.make_block_mesh(jax.devices()[:n_dev])
    shard = NamedSharding(mesh, P(mesh_mod.BLOCK_AXIS))
    data = jax.device_put(jnp.asarray(data_np), shard)
    lens = jax.device_put(jnp.asarray(lens_np), shard)

    @jax.jit
    def step(d, l):
        _, totals, _ = encode_jax.encode_batch(d, l)
        return jnp.sum(totals)

    def kern():
        t0 = time.perf_counter()
        int(step(data, lens))
        return time.perf_counter() - t0

    t_k = _min_of(kern)

    with mesh_mod.use_mesh(mesh):
        def batch_enc():
            t0 = time.perf_counter()
            batch_mod.encode_blocks(blocks, BLOCK)
            return time.perf_counter() - t0

        t_b = _min_of(batch_enc)

    nbytes = B * BLOCK
    return nbytes / 1e9 / t_k, nbytes / 1e9 / t_b


def test_batch_layer_efficiency_tracks_raw_kernel():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    def run() -> list[tuple[int, float, float]]:
        k1, b1 = _measure(1)
        rows = []
        for n in (2, 4, 8):
            kn, bn = _measure(n)
            k_eff = kn / (k1 * n)
            b_eff = bn / (b1 * n)
            rows.append((n, k_eff, b_eff))
        return rows

    rows = run()
    bad = [(n, k, b) for (n, k, b) in rows if b < k * TOL]
    for _retry in range(2):
        if not bad:
            break
        # contended-host noise (5-40x on cold/unlucky iterations,
        # docs/perf_notes.md): back off and fully re-measure before
        # failing — a STRUCTURAL regression reproduces across retries
        time.sleep(10)
        rows = run()
        bad = [(n, k, b) for (n, k, b) in rows if b < k * TOL]
    assert not bad, (
        "batch-layer scaling efficiency fell below the raw kernel's: "
        + ", ".join(f"n={n}: kernel {k:.2f} vs batch {b:.2f}"
                    for (n, k, b) in bad)
        + f" (tolerance {TOL})")
