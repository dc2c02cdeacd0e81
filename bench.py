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
    import jax

    from plz4_tpu.parallel import batch as dev_batch

    # group into fixed-size chunks of blocks
    chunks = [blocks[i : i + DEVICE_CHUNK]
              for i in range(0, len(blocks), DEVICE_CHUNK)]

    # warmup / compile
    dev_batch.encode_blocks(chunks[0], BLOCK)

    t0 = time.perf_counter()
    stored: list[list[tuple[bytes, bool]]] = []
    for ch in chunks:
        stored.append(dev_batch.encode_blocks(ch, BLOCK))
    t_enc = time.perf_counter() - t0

    comp_bytes = sum(len(s) for ch in stored for (s, _) in ch)
    ratio = sum(len(b) for b in blocks) / max(1, comp_bytes)

    dev_batch.decode_blocks(stored[0], BLOCK)
    t0 = time.perf_counter()
    outs = []
    for ch in stored:
        outs.append(dev_batch.decode_blocks(ch, BLOCK))
    t_dec = time.perf_counter() - t0

    # verify correctness of the round-trip
    flat = [o for ch in outs for o in ch]
    for got, want in zip(flat, blocks):
        assert got == want, "bench round-trip mismatch"
    del jax
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

    t_enc_d, t_dec_d, ratio = bench_device(blocks)
    device_rt = 2 * gb / (t_enc_d + t_dec_d)
    _log(f"device: encode {gb / t_enc_d:.3f} GB/s, "
         f"decode {gb / t_dec_d:.3f} GB/s, roundtrip {device_rt:.3f} GB/s, "
         f"ratio {ratio:.3f}")

    print(json.dumps({
        "metric": "lz4 frame roundtrip (encode+decode) GB/s per chip, "
                  "64KiB blocks, level 1, Silesia-like corpus",
        "value": round(device_rt, 4),
        "unit": "GB/s",
        "vs_baseline": round(device_rt / native_rt, 4),
    }))


if __name__ == "__main__":
    main()
