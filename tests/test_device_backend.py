"""Full-frame round-trips through the device (JAX) backend, including the
mesh-sharded path on the 8-device CPU mesh.

Reference analog: the async pipeline exercised through the public API, with
the block codec running as batched device computations instead of CGO.
"""

import io

import pytest

import plz4_tpu as plz4
from plz4_tpu import errors as zerr
from plz4_tpu.frame import descriptor as desc

from conftest import make_compressible, make_incompressible

PAYLOAD = make_compressible(300_000, seed=55)


def test_device_write_native_read():
    comp = plz4.compress(PAYLOAD, backend="device",
                         block_size_idx=desc.BLOCK_IDX_64KB)
    assert plz4.decompress(comp, backend="native") == PAYLOAD


def test_native_write_device_read():
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB)
    assert plz4.decompress(comp, backend="device") == PAYLOAD


def test_device_roundtrip_both():
    comp = plz4.compress(PAYLOAD, backend="device",
                         block_size_idx=desc.BLOCK_IDX_64KB,
                         block_checksum=True)
    assert plz4.decompress(comp, backend="device") == PAYLOAD


def test_device_incompressible():
    data = make_incompressible(200_000)
    comp = plz4.compress(data, backend="device",
                         block_size_idx=desc.BLOCK_IDX_64KB)
    assert plz4.decompress(comp, backend="device") == data


def test_device_linked_blocks():
    base = make_incompressible(60_000, seed=5)
    data = base + base + base
    comp = plz4.compress(data, backend="device", block_linked=True,
                         block_size_idx=desc.BLOCK_IDX_64KB,
                         content_checksum=False)
    comp_indep = plz4.compress(data, backend="device",
                               block_size_idx=desc.BLOCK_IDX_64KB,
                               content_checksum=False)
    assert len(comp) < len(comp_indep)  # cross-block matches exploited
    assert plz4.decompress(comp) == data


def test_device_with_dictionary():
    dict_ = make_incompressible(8192, seed=7)
    data = dict_[-4000:] + dict_[-8000:-4000]
    comp = plz4.compress(data, backend="device", dictionary=dict_,
                         block_size_idx=desc.BLOCK_IDX_64KB,
                         content_checksum=False)
    assert plz4.decompress(comp, dictionary=dict_) == data
    # regression: the device DECODE dict path (XLA fallback) — a vmap
    # positional/keyword collision on out_cap made this raise TypeError
    assert plz4.decompress(comp, backend="device",
                           dictionary=dict_) == data


def test_device_decode_linked_frame():
    """Linked frames decoded with backend='device' (serialized carried
    window through the device dict decoder)."""
    data = make_compressible(100000, seed=8)
    comp = plz4.compress(data, block_linked=True, level=1,
                         block_size_idx=desc.BLOCK_IDX_64KB,
                         content_checksum=False)
    assert plz4.decompress(comp, backend="device") == data


def test_device_sharded_mesh():
    """Blocks sharded across the 8-device CPU mesh (SPMD data parallel)."""
    import jax

    from plz4_tpu.parallel import mesh as mesh_mod
    from plz4_tpu.parallel import use_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    mesh = mesh_mod.make_block_mesh()
    with use_mesh(mesh):
        comp = plz4.compress(PAYLOAD, backend="device",
                             block_size_idx=desc.BLOCK_IDX_64KB)
        out = plz4.decompress(comp, backend="device")
    assert out == PAYLOAD


def test_device_block_checksums_computed_on_device(monkeypatch):
    """With block_checksum=True the device path must generate AND verify
    per-block hashes on device — zero host xxh32 calls per block
    (ops/xxh32_jax wired into parallel/batch.py)."""
    import plz4_tpu
    from plz4_tpu import native

    calls = {"n": 0}
    real = native.xxh32

    def counting(data, seed=0):
        calls["n"] += 1
        return real(data, seed)

    monkeypatch.setattr(native, "xxh32", counting)
    data = make_compressible(200000, seed=61)
    comp = plz4_tpu.compress(data, backend="device", block_size_idx=4,
                             block_checksum=True, content_checksum=False)
    assert calls["n"] == 0, f"writer did {calls['n']} host block hashes"
    out = plz4_tpu.decompress(comp, backend="device")
    assert out == data
    assert calls["n"] == 0, f"reader did {calls['n']} host block hashes"

    # corrupted block payload must still trip the (device-verified) hash
    blob = bytearray(comp)
    blob[40] ^= 0x5A
    with pytest.raises(zerr.Lz4Error) as ei:
        plz4_tpu.decompress(bytes(blob), backend="device")
    assert ei.value is zerr.ErrBlockHash


def test_device_level_mapping():
    """Pin the documented device level->parse-quality mapping (opts.py):
    levels <= 2 route to the greedy kernel, levels 3-7 to the depth-2
    "mid" kernel, level 8 to the depth-4 chain (round-4 third tier),
    and levels >= 9 to the deep hash-chain finder with lazy matching
    (round-4 fourth tier; walk budget 2/8/16/32 at 9/10/11/12 — the
    level-9 rung added round 5: 2.439 at 21.8 MB/s on chip between
    depth-4's 2.422/34.0 and t8's 2.474/14.7).
    Pins both the routing (greedy/mid/depth-4/deep sizes strictly
    improve) and the ratio band per kernel so a silent quality change
    fails loudly."""
    import numpy as np
    import jax.numpy as jnp

    from plz4_tpu import native
    from plz4_tpu.ops import encode_pallas

    data = make_compressible(8000, seed=41)
    buf = np.frombuffer(data, dtype=np.uint8)
    lens = jnp.int32(len(data))

    out_g, tot_g, ok_g = encode_pallas.encode_block_pallas(
        jnp.asarray(buf), lens, interpret=True)
    out_m, tot_m, ok_m = encode_pallas.encode_block_pallas_mid(
        jnp.asarray(buf), lens, interpret=True)
    out_4, tot_4, ok_4 = encode_pallas.encode_block_pallas_mid(
        jnp.asarray(buf), lens, interpret=True, depth4=True)
    deep = {}
    for tries in (2, 8, 16, 32):
        out_d, tot_d, ok_d = encode_pallas.encode_block_pallas_deep(
            jnp.asarray(buf), lens, interpret=True, tries=tries)
        assert bool(ok_d)
        deep[tries] = (out_d, int(tot_d))
    assert bool(ok_g) and bool(ok_m) and bool(ok_4)
    size_g, size_m, size_4 = int(tot_g), int(tot_m), int(tot_4)

    # all decode bit-exactly via the native codec
    for out, size in ((out_g, size_g), (out_m, size_m), (out_4, size_4),
                      *deep.values()):
        comp = np.asarray(out)[:size].tobytes()
        assert native.decompress(comp, len(data)) == data

    # mid (device levels 3-7) must compress strictly better than greedy
    # (device levels <= 2), depth-4 (level 8) strictly better than
    # mid, and the deep chain finder (levels >= 9) strictly better
    # than depth-4: backend="device", level=12 buys measurably more
    # ratio than level=3
    assert size_m < size_g
    assert size_4 < size_m, (size_4, size_m)
    assert deep[2][1] < size_4, (deep[2][1], size_4)
    # wider walk budgets never lose size (the level 9..12 ladder)
    assert (deep[32][1] <= deep[16][1] <= deep[8][1] <= deep[2][1]), deep
    # ... and the band vs the native ladder is the documented trade:
    # greedy tracks native L1, mid lands BETWEEN native L1 and L2 on this
    # corpus — far above native L12's size (the trade opts.py documents)
    n1 = len(native.compress(data, level=1))
    n2 = len(native.compress(data, level=2))
    n12 = len(native.compress(data, level=12))
    assert abs(size_g - n1) <= n1 * 0.02, (size_g, n1)
    assert n2 < size_m < n1, (n2, size_m, n1)
    assert size_m > n12 * 1.1, (size_m, n12)
    # the deep tier closes most of the native gap but never beats the
    # exact-DP native parse
    assert n12 <= deep[32][1], (n12, deep[32][1])

    # public API: device level 12 approaches but does NOT beat native
    # L12 (the exact DP) — the documented trade (opts.py) — regardless
    # of which device kernel family serves the request (pallas on TPU,
    # XLA array path off-TPU)
    c12 = plz4.compress(PAYLOAD, backend="device", level=12,
                        content_checksum=False)
    assert plz4.decompress(c12) == PAYLOAD
    n12_frame = plz4.compress(PAYLOAD, backend="native", level=12,
                              content_checksum=False)
    assert len(c12) >= len(n12_frame), (len(c12), len(n12_frame))


def test_pool_balance_on_error_and_abort():
    """Round-3 review regressions: staged pool buffers must return on
    (a) validation errors raised before dispatch, (b) engine shutdown
    with batches still in flight (Pending.discard), (c) normal use."""
    from plz4_tpu import native
    from plz4_tpu.parallel import batch as dev_batch

    base = native.buffer_pool.borrowed

    # (a) oversized block raises BEFORE staging buffers are taken
    with pytest.raises(zerr.Lz4Error):
        dev_batch.encode_blocks([b"x" * 70000], 65536)
    with pytest.raises(zerr.Lz4Error):
        dev_batch.decode_blocks([(b"x" * 70000, False)], 65536)
    assert native.buffer_pool.borrowed == base

    # (b) reader closed with read-ahead batches dispatched but unconsumed:
    # pending_size=2 forces 2-block batches so read(1) leaves a LIVE
    # read-ahead batch that close() must discard (not fetch)
    data = PAYLOAD[:300_000]
    comp = plz4.compress(data, backend="device", level=1, block_size_idx=4)
    r = plz4.Reader(io.BytesIO(comp), backend="device", pending_size=2)
    r.read(1)  # dispatches current + read-ahead batches
    assert r._device_pending, "scenario must leave a batch in flight"
    r.close()
    assert native.buffer_pool.borrowed == base

    # (c) full roundtrip leaves the pool balanced
    assert plz4.decompress(comp, backend="device") == data
    assert native.buffer_pool.borrowed == base
