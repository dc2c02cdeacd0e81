"""Device (JAX) LZ4 block decoder vs the native C++ oracle.

The device decoder must accept any valid LZ4 block (produced by our native
codec at all levels) and reject corrupt streams via its ok flag.
"""

import numpy as np
import pytest

from plz4_tpu import errors as zerr
from plz4_tpu import native
from plz4_tpu.ops import decode_jax

from conftest import make_compressible, make_incompressible


def roundtrip_device(data: bytes, level: int = 1, dict_: bytes | None = None):
    comp = native.compress(data, level=level, dict_=dict_)
    out = decode_jax.decode_block_host(comp, out_cap=max(len(data), 8),
                                       dict_=dict_)
    assert out == data, (
        f"device decode mismatch: {len(out)} vs {len(data)} bytes"
    )
    return comp


@pytest.mark.parametrize("level", [1, 12])
@pytest.mark.parametrize("size", [12, 13, 5000, 65536])
def test_roundtrip_sizes(level, size):
    roundtrip_device(make_compressible(size, seed=size + level), level)


def test_roundtrip_tiny():
    for size in (0, 1, 5):
        roundtrip_device(make_compressible(size, seed=size), 1)


def test_roundtrip_random_data():
    roundtrip_device(make_incompressible(10000), 1)


def test_roundtrip_zeros_rle():
    # offset-1 self-referential match chains (worst case for resolution)
    roundtrip_device(b"\x00" * 50000, 1)


def test_roundtrip_short_period_patterns():
    for period in (1, 2, 3, 4, 7, 8, 15):
        pat = (make_incompressible(period, seed=period) * (20000 // period + 1))[:20000]
        roundtrip_device(pat, 1)


def test_roundtrip_long_literal_runs():
    # forces 255-run literal-length extensions
    data = make_incompressible(70000, seed=5)
    roundtrip_device(data, 1)


def test_roundtrip_long_matches():
    # forces 255-run match-length extensions
    data = make_incompressible(64, seed=6) * 2000
    roundtrip_device(data, 1)


@pytest.mark.parametrize("level", [1, 9])
def test_dict_decode(level):
    dict_ = make_incompressible(4096, seed=2)
    data = dict_[-2000:] + b"xyz" * 100
    comp = native.compress(data, level=level, dict_=dict_)
    out = decode_jax.decode_block_host(comp, out_cap=len(data), dict_=dict_)
    assert out == data


def test_dict_64k_window():
    dict_ = make_incompressible(70000, seed=3)
    data = dict_[-1000:]
    comp = native.compress(data, level=1, dict_=dict_)
    # decoder should apply the same last-64KiB window rule
    out = decode_jax.decode_block_host(comp, out_cap=len(data),
                                       dict_=dict_[-65536:])
    assert out == data


def test_corruption_flag():
    data = make_compressible(5000)
    comp = bytearray(native.compress(data, level=1))
    detected = 0
    trials = 0
    for i in range(0, len(comp), 13):
        mutated = bytearray(comp)
        mutated[i] ^= 0xFF
        trials += 1
        try:
            out = decode_jax.decode_block_host(bytes(mutated), out_cap=len(data))
            if out != data:
                detected += 1
        except zerr.Lz4Error:
            detected += 1
    assert detected >= trials // 2  # most corruptions must be caught


def test_truncation_rejected():
    data = make_compressible(5000)
    comp = native.compress(data, level=1)
    for cut in (1, len(comp) // 2, len(comp) - 1):
        try:
            out = decode_jax.decode_block_host(comp[:cut], out_cap=len(data))
            assert out != data
        except zerr.Lz4Error:
            pass


def test_decode_batch():
    blocks = [make_compressible(3000, seed=s) for s in range(6)]
    comps = [native.compress(b, level=1) for b in blocks]
    C = max(len(c) for c in comps) + 8
    arr = np.zeros((len(comps), C), dtype=np.uint8)
    for i, c in enumerate(comps):
        arr[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
    clens = np.array([len(c) for c in comps], dtype=np.int32)
    out, n_out, ok = decode_jax.decode_batch(arr, clens, out_cap=3000)
    out = np.asarray(out)
    for i, b in enumerate(blocks):
        assert bool(ok[i])
        assert int(n_out[i]) == len(b)
        assert out[i, : len(b)].tobytes() == b


def test_empty_token_block():
    # a bare 0x00 token = empty block
    out = decode_jax.decode_block_host(b"\x00", out_cap=8)
    assert out == b""
