"""Benchmark: device LZ4 codec round-trip throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

metric: encode+decode round-trip GB/s on a Silesia-like corpus, 64 KiB
independent blocks, level-1 class, single chip (BASELINE.md config 2 shape).
vs_baseline: ratio against the single-threaded native C++ host codec on the
same machine (the reference plz4's per-core engine analog; the reference
publishes no absolute numbers — BASELINE.md).

Supplementary numbers go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BLOCK = 64 * 1024
DEVICE_CHUNK = int(os.environ.get("PLZ4_BENCH_CHUNK", "32"))


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_corpus() -> bytes:
    """Silesia webster sample when available; synthetic text otherwise."""
    candidates = [
        "/root/reference/internal/test/samples/webster.bz2",
    ]
    for path in candidates:
        if os.path.exists(path):
            import bz2

            with open(path, "rb") as f:
                data = bz2.decompress(f.read())
            _log(f"corpus: {path} ({len(data)} bytes)")
            return data[: 32 << 20]
    rng = np.random.default_rng(1234)
    vocab = []
    for _ in range(512):
        ln = int(rng.integers(2, 12))
        vocab.append(bytes(rng.integers(97, 123, ln, dtype=np.uint8)) + b" ")
    out = bytearray()
    target = 32 << 20
    while len(out) < target:
        out += vocab[int(rng.integers(len(vocab)))]
    _log(f"corpus: synthetic text ({target} bytes)")
    return bytes(out[:target])


def chunk_blocks(data: bytes) -> list[bytes]:
    return [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]


def bench_native(blocks: list[bytes]) -> tuple[float, float]:
    from plz4_tpu import native

    t0 = time.perf_counter()
    comp = [native.compress_into(b, max(1, len(b) - 1), level=1) or b
            for b in blocks]
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for c, b in zip(comp, blocks):
        if len(c) < len(b):
            native.decompress(c, len(b))
    t_dec = time.perf_counter() - t0
    return t_enc, t_dec


def bench_device(blocks: list[bytes]) -> tuple[float, float, float]:
    """Device-resident codec throughput: the TPU-native production dataflow
    keeps tensors in HBM (decode feeds device consumers; encode reads
    device-resident data), so the benchmark keeps data on device end to end
    and transfers only scalars. (This machine reaches the chip through a
    ~10 MB/s tunnel; production hosts use PCIe — excluding bulk transfer
    measures the chip, not the tunnel.)

    Returns (t_enc, t_dec, ratio) for one full pass over the corpus.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from plz4_tpu.ops import decode_jax, encode_jax

    B = DEVICE_CHUNK
    blocks = [b for b in blocks if len(b) == BLOCK]
    nb = (len(blocks) // B) * B
    blocks = blocks[:nb]
    data_np = np.stack(
        [np.frombuffer(b, dtype=np.uint8) for b in blocks]).reshape(-1, B, BLOCK)
    lens_np = np.full((data_np.shape[0], B), BLOCK, dtype=np.int32)
    n_chunks = data_np.shape[0]

    # one-time staging into HBM (excluded: production inputs are
    # device-resident)
    data = jax.device_put(jnp.asarray(data_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    jax.block_until_ready(data)

    # The tunnel to the remote chip has ~1s latency per *synchronous* call,
    # but dispatch is asynchronous: enqueue all chunk steps (scalar results
    # only), then force one real sync by pulling a combined scalar.
    # block_until_ready is unreliable through the tunnel; device_get of a
    # value is a true barrier. Null-dispatch latency is subtracted.
    R = int(os.environ.get("PLZ4_BENCH_REPEATS", "4"))

    @jax.jit
    def enc_step(d, l):
        out, totals, _ = encode_jax.encode_batch(d, l)
        return jnp.sum(totals)

    @jax.jit
    def rt_step(d, l):
        out, totals, _ = encode_jax.encode_batch(d, l)
        dec, n_out, ok = jax.vmap(
            lambda c, n: decode_jax.decode_block(c, n, out_cap=BLOCK)
        )(out, totals)
        good = jnp.all(ok & (n_out == l) & jnp.all(dec == d, axis=-1))
        # fold the validity flag into the scalar so one pull checks both
        return jnp.sum(totals) + jnp.where(good, 0, jnp.int32(1 << 30))

    @jax.jit
    def combine(xs):
        return jnp.sum(jnp.stack(xs))

    def run(step):
        parts = [step(data[i % n_chunks], lens[i % n_chunks])
                 for i in range(R * n_chunks)]
        return int(combine(parts))

    # compile + warm (same arity as the timed runs)
    run(enc_step)
    assert run(rt_step) < (1 << 30), "device round-trip mismatch"

    t0 = time.perf_counter()
    int(combine([enc_step(data[0], lens[0])] * (R * n_chunks)))
    t_null = time.perf_counter() - t0
    _log(f"sync overhead estimate: {t_null * 1000:.0f} ms")

    t0 = time.perf_counter()
    comp_sum = run(enc_step)
    t_enc = max(time.perf_counter() - t0 - t_null, 1e-9) / R
    ratio = (nb * BLOCK * R) / max(1, comp_sum)

    t0 = time.perf_counter()
    comp2 = run(rt_step)
    t_rt = max(time.perf_counter() - t0 - t_null, 1e-9) / R
    assert comp2 < (1 << 30), "device round-trip mismatch"

    t_dec = max(t_rt - t_enc, 1e-9)
    return t_enc, t_dec, ratio


def main() -> None:
    import plz4_tpu

    plz4_tpu.enable_compile_cache()
    data = load_corpus()
    blocks = chunk_blocks(data)
    gb = len(data) / 1e9

    t_enc_n, t_dec_n = bench_native(blocks)
    native_rt = 2 * gb / (t_enc_n + t_dec_n)
    _log(f"native 1-thread: encode {gb / t_enc_n:.3f} GB/s, "
         f"decode {gb / t_dec_n:.3f} GB/s, roundtrip {native_rt:.3f} GB/s")

    metric = ("lz4 frame roundtrip (encode+decode) GB/s per chip, "
              "64KiB blocks, level 1, Silesia-like corpus")
    try:
        t_enc_d, t_dec_d, ratio = bench_device(blocks)
        device_rt = 2 * gb / (t_enc_d + t_dec_d)
        _log(f"device: encode {gb / t_enc_d:.3f} GB/s, "
             f"decode {gb / t_dec_d:.3f} GB/s, roundtrip {device_rt:.3f} "
             f"GB/s, ratio {ratio:.3f}")
        print(json.dumps({
            "metric": metric,
            "value": round(device_rt, 4),
            "unit": "GB/s",
            "vs_baseline": round(device_rt / native_rt, 4),
        }))
    except BaseException as e:  # device/tunnel fault: still report something
        _log(f"device bench failed ({type(e).__name__}: {e}); "
             "reporting host-backend throughput")
        print(json.dumps({
            "metric": metric + " [device unavailable: native host fallback]",
            "value": round(native_rt, 4),
            "unit": "GB/s",
            "vs_baseline": 1.0,
        }))


if __name__ == "__main__":
    main()
