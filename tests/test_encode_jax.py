"""Device (JAX) LZ4 block encoder: output must be valid LZ4 (decodable by
the native oracle) with ratio comparable to the native greedy level.
"""

import numpy as np
import pytest

from plz4_tpu import native
from plz4_tpu.ops import decode_jax, encode_jax

from conftest import make_compressible, make_incompressible


def roundtrip(data: bytes):
    comp = encode_jax.encode_block_host(data)
    if comp is None:  # incompressible: raw-block fallback is the contract
        assert len(native.compress(data, level=1)) >= len(data) - 64
        return None
    out = native.decompress(comp, len(data))
    assert out == data, "native decoder rejects device-encoded block"
    return comp


@pytest.mark.parametrize("size", [13, 100, 5000, 65536])
def test_roundtrip_text(size):
    comp = roundtrip(make_compressible(size, seed=size))
    if comp and size >= 5000:
        assert len(comp) < size  # text must compress


def test_roundtrip_tiny():
    for size in (0, 1, 5, 12):
        data = make_compressible(size, seed=size)
        comp = encode_jax.encode_block_host(data)
        if comp is not None:
            assert native.decompress(comp, len(data)) == data


def test_roundtrip_zeros():
    data = b"\x00" * 60000
    comp = roundtrip(data)
    assert comp is not None and len(comp) < 300


def test_roundtrip_periodic():
    for period in (3, 7, 16, 32):
        pat = (make_incompressible(period, seed=period) * (30000 // period + 1))[:30000]
        comp = roundtrip(pat)
        assert comp is not None and len(comp) < len(pat) // 10


def test_roundtrip_random_incompressible():
    data = make_incompressible(30000)
    assert encode_jax.encode_block_host(data) is None  # must flag raw


def test_roundtrip_mixed():
    data = (make_compressible(20000, seed=1)
            + make_incompressible(5000, seed=2)
            + b"A" * 3000
            + make_compressible(20000, seed=3))
    roundtrip(data)


def test_device_encode_device_decode():
    data = make_compressible(40000, seed=11)
    comp = encode_jax.encode_block_host(data)
    out = decode_jax.decode_block_host(comp, out_cap=len(data))
    assert out == data


def test_ratio_vs_native_greedy(text_1mb):
    data = text_1mb[:65536]
    comp_dev = encode_jax.encode_block_host(data)
    comp_nat = native.compress(data, level=1)
    assert comp_dev is not None
    # device greedy should be within 25% of the native greedy encoder
    # (native L1 hashes 5 bytes on >=64 KiB inputs since round 2, which
    # widened the gap; the device encoder still hashes 4)
    assert len(comp_dev) <= int(len(comp_nat) * 1.25), (
        len(comp_dev), len(comp_nat))


def test_long_literal_run_extension():
    # >270 literals forces multi-byte literal-length extension fields
    data = make_incompressible(1000, seed=4) + b"B" * 500
    roundtrip(data)


def test_long_match_extension():
    # very long match forces multi-byte match-length extensions
    data = make_compressible(200, seed=5) * 300
    comp = roundtrip(data)
    assert comp is not None


def test_encode_batch():
    blocks = [make_compressible(3000, seed=s) for s in range(5)]
    N = 4096
    arr = np.zeros((len(blocks), N), dtype=np.uint8)
    lens = np.zeros((len(blocks),), dtype=np.int32)
    for i, blk in enumerate(blocks):
        arr[i, : len(blk)] = np.frombuffer(blk, dtype=np.uint8)
        lens[i] = len(blk)
    out, totals, compressible = encode_jax.encode_batch(arr, lens)
    out = np.asarray(out)
    for i, blk in enumerate(blocks):
        assert bool(compressible[i])
        comp = out[i, : int(totals[i])].tobytes()
        assert native.decompress(comp, len(blk)) == blk


# --- dictionary / linked window support ------------------------------------


def test_device_encode_with_dict():
    from conftest import make_incompressible
    dict_ = make_incompressible(4096, seed=31)
    data = dict_[-2000:] + b"tail" * 50
    comp = encode_jax.encode_block_host(data, dict_=dict_)
    assert comp is not None
    assert native.decompress(comp, len(data), dict_=dict_) == data
    # dict must improve ratio vs no dict
    comp_nd = encode_jax.encode_block_host(data)
    if comp_nd is not None:
        assert len(comp) < len(comp_nd)


def test_device_encode_dict_device_decode():
    from plz4_tpu.ops import decode_jax as dj
    from conftest import make_incompressible
    dict_ = make_incompressible(8192, seed=32)
    data = dict_[-3000:]
    comp = encode_jax.encode_block_host(data, dict_=dict_)
    out = dj.decode_block_host(comp, out_cap=len(data), dict_=dict_)
    assert out == data


def test_device_encode_hc_levels_ratio():
    data = make_compressible(65536, seed=33)
    c1 = encode_jax.encode_block_host(data, level=1)
    c9 = encode_jax.encode_block_host(data, level=9)
    assert c1 is not None and c9 is not None
    assert len(c9) <= len(c1)
    assert native.decompress(c9, len(data)) == data


def test_device_encode_batch_dict():
    import jax.numpy as jnp
    from conftest import make_incompressible
    B, N, D = 4, 4096, 4096
    dicts_raw = [make_incompressible(D, seed=40 + i) for i in range(B)]
    blocks = [d[-2000:] + bytes([i]) * 2096 for i, d in enumerate(dicts_raw)]
    data = np.zeros((B, N), np.uint8)
    lens = np.zeros((B,), np.int32)
    dicts = np.zeros((B, D), np.uint8)
    dlens = np.zeros((B,), np.int32)
    for i in range(B):
        data[i, : len(blocks[i])] = np.frombuffer(blocks[i], np.uint8)
        lens[i] = len(blocks[i])
        dicts[i, D - len(dicts_raw[i]):] = np.frombuffer(dicts_raw[i], np.uint8)
        dlens[i] = len(dicts_raw[i])
    out, totals, compressible = encode_jax.encode_batch_dict(
        jnp.asarray(data), jnp.asarray(lens), jnp.asarray(dicts),
        jnp.asarray(dlens))
    out = np.asarray(out)
    for i in range(B):
        comp = out[i, : int(totals[i])].tobytes()
        assert native.decompress(comp, len(blocks[i]),
                                 dict_=dicts_raw[i]) == blocks[i]
