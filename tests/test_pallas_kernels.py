"""Pallas SMEM kernels (serial scalar-core codec) in interpret mode.

On real TPUs these kernels are the fast path (docs/perf_notes.md); tests
run them interpreted on CPU against the native oracle. Payloads are small:
interpret mode executes the scalar loop in Python-speed tracing.
"""

import pytest

from plz4_tpu import native
from plz4_tpu.ops import decode_pallas, encode_pallas

from conftest import make_compressible, make_incompressible


@pytest.mark.parametrize("data", [
    b"",
    b"a",
    b"hello world " * 12,
    b"\x00" * 2000,
    make_compressible(4000, seed=1),
    (make_incompressible(7, seed=2) * 500)[:3000],
], ids=["empty", "one", "text", "zeros", "vocab", "period7"])
def test_pallas_decode_vs_native(data):
    comp = native.compress(data, level=1)
    out = decode_pallas.decode_block_host(comp, out_cap=max(len(data), 16),
                                          interpret=True)
    assert out == data


def test_pallas_decode_rejects_corrupt():
    data = make_compressible(2000, seed=3)
    comp = bytearray(native.compress(data, level=1))
    comp[1] ^= 0xFF
    try:
        out = decode_pallas.decode_block_host(bytes(comp),
                                              out_cap=len(data),
                                              interpret=True)
        assert out != data
    except Exception:
        pass


def test_pallas_decode_truncated():
    data = make_compressible(2000, seed=4)
    comp = native.compress(data, level=1)
    from plz4_tpu import errors as zerr
    with pytest.raises(zerr.Lz4Error):
        decode_pallas.decode_block_host(comp[: len(comp) // 2],
                                        out_cap=len(data), interpret=True)


@pytest.mark.parametrize("data", [
    b"hello world " * 12,
    b"\x00" * 1500,
    make_compressible(3000, seed=5),
], ids=["text", "zeros", "vocab"])
def test_pallas_encode_vs_native(data):
    comp = encode_pallas.encode_block_host(data, interpret=True)
    assert comp is not None
    assert native.decompress(comp, len(data)) == data
    # greedy parity: identical hash discipline should land within a hair
    ref = native.compress(data, level=1)
    assert len(comp) <= int(len(ref) * 1.05) + 8


def test_pallas_encode_incompressible_flag():
    data = make_incompressible(2000)
    assert encode_pallas.encode_block_host(data, interpret=True) is None


def test_pallas_roundtrip_pallas_decode():
    data = make_compressible(2500, seed=6)
    comp = encode_pallas.encode_block_host(data, interpret=True)
    out = decode_pallas.decode_block_host(comp, out_cap=len(data),
                                          interpret=True)
    assert out == data


def test_pallas_encode_with_window():
    """Window-prefix (linked/dict) encode kernel."""
    import jax.numpy as jnp
    import numpy as np

    dict_ = make_incompressible(2048, seed=50)
    rec = dict_[-1000:] + b"fresh tail" * 20
    N = (len(rec) + 3) & ~3
    buf = np.zeros(N, np.uint8)
    buf[: len(rec)] = np.frombuffer(rec, np.uint8)
    D = 2048
    dbuf = np.zeros(D, np.uint8)
    dbuf[D - len(dict_):] = np.frombuffer(dict_, np.uint8)
    out, total, ok = encode_pallas.encode_block_pallas_dict(
        jnp.asarray(buf), jnp.int32(len(rec)), jnp.asarray(dbuf),
        jnp.int32(len(dict_)), interpret=True)
    assert bool(ok)
    comp = np.asarray(out)[: int(total)].tobytes()
    assert native.decompress(comp, len(rec), dict_=dict_) == rec
    # the window must actually be exploited
    assert int(total) < len(native.compress(rec, level=1))


def test_pallas_encode_window_partial():
    """Short window (dlen < D): padding must not produce matches."""
    import jax.numpy as jnp
    import numpy as np

    dict_ = make_incompressible(500, seed=51)
    rec = dict_ + b"x" * 100
    N = (len(rec) + 3) & ~3
    buf = np.zeros(N, np.uint8)
    buf[: len(rec)] = np.frombuffer(rec, np.uint8)
    D = 1024
    dbuf = np.zeros(D, np.uint8)
    dbuf[D - len(dict_):] = np.frombuffer(dict_, np.uint8)
    out, total, ok = encode_pallas.encode_block_pallas_dict(
        jnp.asarray(buf), jnp.int32(len(rec)), jnp.asarray(dbuf),
        jnp.int32(len(dict_)), interpret=True)
    comp = np.asarray(out)[: int(total)].tobytes()
    assert native.decompress(comp, len(rec), dict_=dict_) == rec
