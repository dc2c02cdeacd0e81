"""Randomized property tests: many seeds, sizes, structures, levels.

Complements the fixed-corpus suites with breadth across the input space:
every (structure, size, level) sample must round-trip bit-exact through
the native codec, and a sample of them through the frame engine.
"""

import numpy as np
import pytest

import plz4_tpu as plz4
from plz4_tpu import native


def _gen(rng: np.random.Generator, size: int) -> bytes:
    """Structurally diverse random payloads."""
    if size <= 0:
        # the concat structure recurses with size // 2, which bottoms out
        # at 0 for odd tiny sizes; several kinds crash on an empty draw
        return b""
    kind = int(rng.integers(6))
    if kind == 0:  # uniform random
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    if kind == 1:  # low-entropy bytes
        return rng.integers(0, 4, size, dtype=np.uint8).tobytes()
    if kind == 2:  # repeated tile with mutations
        period = int(rng.integers(1, 200))
        tile = rng.integers(0, 256, period, dtype=np.uint8)
        arr = np.tile(tile, size // period + 1)[:size].copy()
        n_mut = size // 50 + 1
        idx = rng.integers(0, size, n_mut)
        arr[idx] = rng.integers(0, 256, n_mut)
        return arr.tobytes()
    if kind == 3:  # sparse zeros with islands
        arr = np.zeros(size, dtype=np.uint8)
        for _ in range(int(rng.integers(1, 8))):
            start = int(rng.integers(0, max(1, size - 10)))
            hi = min(200, size - start)
            if hi <= 1:
                continue
            ln = int(rng.integers(1, hi))
            arr[start : start + ln] = rng.integers(0, 256, ln)
        return arr.tobytes()
    if kind == 4:  # text-ish
        words = [rng.integers(97, 123, int(rng.integers(1, 10)),
                              dtype=np.uint8).tobytes() for _ in range(30)]
        out = bytearray()
        while len(out) < size:
            out += words[int(rng.integers(30))] + b" "
        return bytes(out[:size])
    # concatenation of two structures
    half = size // 2
    return _gen(rng, half) + _gen(rng, size - half)


@pytest.mark.parametrize("seed", range(40))
def test_block_roundtrip_property(seed):
    rng = np.random.default_rng(seed)
    size = int(rng.integers(0, 100_000))
    level = int(rng.integers(1, 13))
    data = _gen(rng, size)
    try:
        comp = native.compress(data, level=level)
    except plz4.errors.Lz4Error:
        return  # incompressible at this cap: raw-storage path covers it
    assert native.decompress(comp, len(data)) == data


@pytest.mark.parametrize("seed", range(10))
def test_frame_roundtrip_property(seed):
    rng = np.random.default_rng(1000 + seed)
    size = int(rng.integers(0, 400_000))
    data = _gen(rng, size)
    kw = dict(
        level=int(rng.integers(1, 13)),
        block_size_idx=int(rng.integers(4, 8)),
        block_checksum=bool(rng.integers(2)),
        content_checksum=bool(rng.integers(2)),
        block_linked=bool(rng.integers(2)),
        parallel=int(rng.integers(-1, 4)),
    )
    comp = plz4.compress(data, **kw)
    assert plz4.decompress(comp) == data


@pytest.mark.parametrize("seed", range(5))
def test_device_decoder_property(seed):
    from plz4_tpu.ops import decode_jax

    rng = np.random.default_rng(2000 + seed)
    size = int(rng.integers(16, 30_000))
    data = _gen(rng, size)
    comp = native.compress(data, level=int(rng.integers(1, 13)))
    out = decode_jax.decode_block_host(comp, out_cap=max(len(data), 16))
    assert out == data


@pytest.mark.parametrize("seed", range(12))
def test_full_option_matrix_streaming_property(seed):
    """Randomized full-matrix property: random options x random payload x
    random streaming chunk pattern with interleaved flushes, decoded both
    one-shot and through chunked Reader reads (byte-exact)."""
    import io
    import random

    rng = random.Random(4000 + seed)
    nprng = np.random.default_rng(4000 + seed)
    data = _gen(nprng, int(nprng.integers(0, 90_000)))
    kw = dict(
        level=rng.choice([1, 2, 3, 6, 9, 12]),
        block_size_idx=rng.choice([4, 5]),
        block_linked=rng.random() < 0.4,
        block_checksum=rng.random() < 0.3,
        content_checksum=rng.random() < 0.5,
        parallel=rng.choice([0, 1, 3, -1]),
    )
    if rng.random() < 0.3:
        kw["content_size"] = len(data)
    dkw = {}
    if rng.random() < 0.25 and not kw["block_linked"]:
        kw["dictionary"] = bytes(_gen(nprng, rng.randrange(1, 70000))) or b"x"
        dkw["dictionary"] = kw["dictionary"]

    buf = io.BytesIO()
    w = plz4.Writer(buf, **kw)
    i = 0
    while i < len(data):
        step = rng.randrange(1, 30000)
        w.write(data[i:i + step])
        i += step
        if rng.random() < 0.1:
            w.flush()
    w.close()
    comp = buf.getvalue()

    assert plz4.decompress(comp, parallel=rng.choice([0, 2, -1]),
                           **dkw) == data
    r = plz4.Reader(io.BytesIO(comp), **dkw)
    got = bytearray()
    while True:
        chunk = r.read(rng.randrange(1, 50000))
        if not chunk:
            break
        got += chunk
    r.close()
    assert bytes(got) == data
