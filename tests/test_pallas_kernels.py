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


@pytest.mark.parametrize("stream", [
    # match at op=0 with off=50: bad (off > op) while op < 8 — the careful
    # path's m_fast prologue used to index negative SMEM offsets
    bytes([0x04, 50, 0]),
    # one literal then off=200 at op=1: same shape, non-zero op
    bytes([0x14, 0x41, 200, 0]),
    # off=0 (always invalid) right at the start
    bytes([0x04, 0, 0]),
], ids=["off50-op0", "off200-op1", "off0"])
def test_pallas_decode_rejects_early_bad_offset(stream):
    """Regression: corrupt first-sequence offsets must flag, not fault."""
    from plz4_tpu import errors as zerr
    with pytest.raises(zerr.Lz4Error):
        decode_pallas.decode_block_host(stream, out_cap=256, interpret=True)


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


def test_dict_kernel_boundary_fuzz():
    """Stress the dict kernel's word/straddle/byte copy partition: random
    chains whose matches straddle the window/block boundary at every
    alignment."""
    import jax.numpy as jnp
    import numpy as np

    from plz4_tpu import native

    rng = np.random.default_rng(0xD1C7)
    for trial in range(24):
        dlen = int(rng.integers(8, 300)) * 4
        dict_ = bytes(rng.integers(97, 105, dlen, dtype=np.uint8))
        # craft data that matches into the dict at varying depths
        parts = []
        for _ in range(6):
            a = int(rng.integers(0, dlen - 8))
            ln = int(rng.integers(4, min(64, dlen - a)))
            parts.append(dict_[a : a + ln])
            parts.append(bytes(rng.integers(0, 256, int(rng.integers(1, 9)),
                                            dtype=np.uint8)))
        data = b"".join(parts)
        comp = native.compress(data, level=6, dict_=dict_)
        # pad dict to a multiple of 4 (kernel contract)
        D = (dlen + 3) & ~3
        dbuf = np.zeros(D, dtype=np.uint8)
        dbuf[D - dlen:] = np.frombuffer(dict_, dtype=np.uint8)
        C = max(16, (len(comp) + 8 + 3) & ~3)
        cbuf = np.zeros(C, dtype=np.uint8)
        cbuf[: len(comp)] = np.frombuffer(comp, dtype=np.uint8)
        cap = (len(data) + 3) & ~3
        out, n, ok = decode_pallas.decode_block_pallas_dict(
            jnp.asarray(cbuf), jnp.int32(len(comp)), jnp.asarray(dbuf),
            jnp.int32(dlen), out_cap=cap, interpret=True)
        assert bool(ok), f"trial {trial}"
        assert np.asarray(out)[: int(n)].tobytes() == data, f"trial {trial}"


def test_dict_kernel_boundary_ending_match():
    """Regression (round 4): a match whose dict portion ends EXACTLY at the
    dict/block boundary reads the final dict word (k=4) — an over-tight
    clip in rd_d_word shifted that read one byte early and corrupted the
    last word of the match. Sweep every word-aligned (off, ml=off) pair on
    several window sizes, plus the ml<off interiors as controls."""
    import jax.numpy as jnp
    import numpy as np

    from plz4_tpu import native

    def build_block(off, ml, tail):
        out = bytearray([min(ml - 4, 15)])
        out += bytes([off & 255, off >> 8])
        if ml - 4 >= 15:
            r = ml - 4 - 15
            while r >= 255:
                out.append(255)
                r -= 255
            out.append(r)
        out.append(len(tail) << 4)
        out += tail
        return bytes(out)

    rng = np.random.default_rng(0xB0DA)
    for D in (16, 64, 256):
        dict_ = rng.integers(1, 255, D, dtype=np.uint8).tobytes()
        dbuf = np.frombuffer(dict_, np.uint8)
        for off in range(4, D + 1, 4):
            for ml in (off, max(4, off - 3)):
                tail = b"QWERT"
                comp = build_block(off, ml, tail)
                expect = dict_[D - off : D - off + ml] + tail
                # independent oracle: the native codec agrees on expect
                assert native.decompress(comp, len(expect),
                                         dict_=dict_) == expect
                N = (len(expect) + 3) & ~3
                CPAD = (len(comp) + 3) & ~3
                cb = np.zeros(CPAD, np.uint8)
                cb[: len(comp)] = np.frombuffer(comp, np.uint8)
                out, n, ok = decode_pallas.decode_block_pallas_dict(
                    jnp.asarray(cb), jnp.int32(len(comp)),
                    jnp.asarray(dbuf), jnp.int32(D), out_cap=N,
                    interpret=True)
                assert bool(ok), (D, off, ml)
                assert np.asarray(out)[: int(n)].tobytes() == expect, \
                    (D, off, ml)


@pytest.mark.parametrize("data_name,seed", [("text", 90), ("mixed", 92)])
def test_mid_kernel_better_ratio_and_valid(data_name, seed):
    """The depth-2 mid kernel (device levels >= 3) must emit valid streams
    with ratio >= the greedy kernel."""
    import jax.numpy as jnp
    import numpy as np

    data = make_compressible(6000, seed=seed)
    N = max(16, (len(data) + 3) & ~3)
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    og, tg, okg = encode_pallas.encode_block_pallas(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True)
    om, tm, okm = encode_pallas.encode_block_pallas_mid(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True)
    assert bool(okm)
    cm = np.asarray(om)[: int(tm)].tobytes()
    assert native.decompress(cm, len(data)) == data
    assert int(tm) <= int(tg)


def test_mid_kernel_dict_window():
    import jax.numpy as jnp
    import numpy as np

    dict_ = make_compressible(3000, seed=7)
    data = dict_[500:2500] + make_compressible(1000, seed=8)
    N = max(16, (len(data) + 3) & ~3)
    D = (len(dict_) + 3) & ~3
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    dbuf = np.zeros(D, np.uint8)
    dbuf[D - len(dict_):] = np.frombuffer(dict_, np.uint8)
    om, tm, okm = encode_pallas.encode_block_pallas_mid_dict(
        jnp.asarray(buf), jnp.int32(len(data)), jnp.asarray(dbuf),
        jnp.int32(len(dict_)), interpret=True)
    assert bool(okm)
    cm = np.asarray(om)[: int(tm)].tobytes()
    assert native.decompress(cm, len(data), dict_=dict_) == data


@pytest.mark.parametrize("data_name,seed", [("text", 90), ("mixed", 92)])
def test_deep_kernel_better_ratio_and_valid(data_name, seed):
    """The deep hash-chain kernel (device levels >= 10) must emit valid
    streams with ratio strictly better than the depth-4 tier below it."""
    import jax.numpy as jnp
    import numpy as np

    data = make_compressible(6000, seed=seed)
    N = max(16, (len(data) + 3) & ~3)
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    o4, t4, ok4 = encode_pallas.encode_block_pallas_mid(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True,
        depth4=True)
    od, td, okd = encode_pallas.encode_block_pallas_deep(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True)
    assert bool(okd)
    cd = np.asarray(od)[: int(td)].tobytes()
    assert native.decompress(cd, len(data)) == data
    assert int(td) < int(t4), (int(td), int(t4))


@pytest.mark.parametrize("data", [
    b"\x00" * 3000,
    b"a",
    b"abcabcabcabca",
    b"abcd" * 700,
    b"A" * 500 + b"xyz" * 100 + b"B" * 800,
], ids=["zeros", "one", "short13", "period4", "runs"])
def test_deep_kernel_edges(data):
    """Deep-kernel edge shapes: long runs exercise the lazy loop and the
    insert-all pass; tiny blocks must flag incompressible, never emit."""
    import jax.numpy as jnp
    import numpy as np

    N = max(16, (len(data) + 3) & ~3)
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    od, td, okd = encode_pallas.encode_block_pallas_deep(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True, tries=8)
    if bool(okd):
        cd = np.asarray(od)[: int(td)].tobytes()
        assert native.decompress(cd, len(data)) == data
    else:
        assert len(data) < 20 or len(native.compress(data)) >= len(data)


def test_deep_kernel_dict_window():
    """Window-prefix deep encode (small windows fit the chain budget;
    the full 64 KiB device window falls back to depth-4 inside the
    wrapper — both paths must produce dict-decodable streams)."""
    import jax.numpy as jnp
    import numpy as np

    dict_ = make_compressible(3000, seed=7)
    data = dict_[500:2500] + make_compressible(1000, seed=8)
    N = max(16, (len(data) + 3) & ~3)
    D = (len(dict_) + 3) & ~3
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    dbuf = np.zeros(D, np.uint8)
    dbuf[D - len(dict_):] = np.frombuffer(dict_, np.uint8)
    od, td, okd = encode_pallas.encode_block_pallas_deep_dict(
        jnp.asarray(buf), jnp.int32(len(data)), jnp.asarray(dbuf),
        jnp.int32(len(dict_)), interpret=True)
    assert bool(okd)
    cd = np.asarray(od)[: int(td)].tobytes()
    assert native.decompress(cd, len(data), dict_=dict_) == data
    # the deep finder must reach the window: strictly better than the
    # depth-4 dict path on this window-heavy payload
    om, tm, _ = encode_pallas.encode_block_pallas_mid_dict(
        jnp.asarray(buf), jnp.int32(len(data)), jnp.asarray(dbuf),
        jnp.int32(len(dict_)), interpret=True, depth4=True)
    assert int(td) < int(tm), (int(td), int(tm))


def test_deep_kernel_fuzz_mixed():
    """Randomized mixed payloads through the deep kernel at several walk
    budgets — every compressible outcome must decode bit-exactly."""
    import random

    import jax.numpy as jnp
    import numpy as np

    rng = random.Random(0)
    for seed in range(8):
        rng.seed(seed)
        parts = []
        for _ in range(rng.randint(1, 5)):
            k = rng.randint(0, 3)
            if k == 0:
                parts.append(make_compressible(rng.randint(1, 2000),
                                               seed=seed * 7 + 1))
            elif k == 1:
                parts.append(make_incompressible(rng.randint(1, 600),
                                                 seed=seed * 7 + 2))
            elif k == 2:
                parts.append(bytes([rng.randint(0, 255)])
                             * rng.randint(1, 700))
            else:
                parts.append((make_incompressible(rng.randint(2, 9),
                                                  seed=seed * 7 + 3)
                              * 300)[: rng.randint(1, 900)])
        data = b"".join(parts)
        N = max(16, (len(data) + 3) & ~3)
        buf = np.zeros(N, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        for tries in (4, 32):
            od, td, okd = encode_pallas.encode_block_pallas_deep(
                jnp.asarray(buf), jnp.int32(len(data)), interpret=True,
                tries=tries)
            if bool(okd):
                cd = np.asarray(od)[: int(td)].tobytes()
                assert native.decompress(cd, len(data)) == data, \
                    (seed, tries)


def test_deep_kernel_boundary_shapes():
    """Boundary shapes for the deep kernel: runs ending at the match
    limits, self-overlapping tails, periodic payloads, run soup, and
    odd lengths — every compressible outcome decodes bit-exactly."""
    import random

    import jax.numpy as jnp
    import numpy as np

    rng = random.Random(99)
    for seed in range(12):
        rng.seed(seed)
        shape = seed % 6
        if shape == 0:
            data = make_compressible(2000, seed=seed) + b"\x00" * (12 + seed)
        elif shape == 1:
            data = b"\x00" * (1500 + seed) + make_incompressible(17,
                                                                 seed=seed)
        elif shape == 2:
            p = make_incompressible(3 + seed % 14, seed=seed)
            data = (p * 700)[: 2000 + seed]
        elif shape == 3:
            data = make_compressible(1500, seed=seed)
            data = data + data[-(5 + seed % 8):]
        elif shape == 4:
            data = b"".join(bytes([rng.randrange(256)])
                            * rng.randrange(1, 40) for _ in range(150))
        else:
            data = make_compressible(3000, seed=seed)[: 2993 + seed % 9]
        N = max(16, (len(data) + 3) & ~3)
        buf = np.zeros(N, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        for tries in (2, 16):
            od, td, okd = encode_pallas.encode_block_pallas_deep(
                jnp.asarray(buf), jnp.int32(len(data)), interpret=True,
                tries=tries)
            if bool(okd):
                cd = np.asarray(od)[: int(td)].tobytes()
                assert native.decompress(cd, len(data)) == data, \
                    (seed, shape, tries)


def test_deep_kernel_oversize_fallback():
    """Blocks whose chain array exceeds the SMEM element budget must
    take the depth-4 fallback inside the deep wrapper (device frames
    clamp to 64 KiB so this never fires on TPU, but the guard is the
    safety net for raw kernel users) — outputs must equal the depth-4
    kernel exactly."""
    import jax.numpy as jnp
    import numpy as np

    from plz4_tpu.ops.encode_pallas import _deep_fits

    N = 128 * 1024
    CAP = (N + N // 255 + 64 + 3) & ~3
    assert not _deep_fits(N + 8, CAP)  # the premise of this test
    data = make_compressible(2000, seed=3)
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    od, td, okd = encode_pallas.encode_block_pallas_deep(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True)
    o4, t4, ok4 = encode_pallas.encode_block_pallas_mid(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=True,
        depth4=True)
    assert bool(okd) == bool(ok4) and int(td) == int(t4)
    assert np.array_equal(np.asarray(od)[: int(td)],
                          np.asarray(o4)[: int(t4)])
    assert native.decompress(
        np.asarray(od)[: int(td)].tobytes(), len(data)) == data


def test_deep_kernel_u16_chain_variant():
    """The u16-delta-chain deep variant (full-window dict calls,
    VERDICT r4 next-#5): identical stream semantics to the i32 chain;
    the 64 KiB-window + 64 KiB-block footprint fits its budget while the
    i32 chain's does not. On-chip quality/speed in BASELINE.md; the
    bench.py gate asserts it beats depth-4 on the live chip."""
    import jax.numpy as jnp
    import numpy as np

    from plz4_tpu.ops.encode_pallas import (_deep_fits, _deep_fits_u16,
                                            _encode_call_deep)

    # routing arithmetic: the production shape takes the u16 path
    N = 65536
    CAP = (N + N // 255 + 64 + 3) & ~3
    assert not _deep_fits(65536 + N + 8, CAP)
    assert _deep_fits_u16(32768 + N + 8, CAP)

    for n, dl in ((4096, 2048), (3000, 0), (5000, 4096)):
        data = make_compressible(n, seed=n)
        dict_ = make_compressible(dl, seed=n + 1) if dl else b""
        Np = (n + 3) & ~3
        D = max(4, (dl + 3) & ~3)
        buf = np.zeros(Np, np.uint8)
        buf[:n] = np.frombuffer(data, np.uint8)
        dbuf = np.zeros(D, np.uint8)
        if dl:
            dbuf[D - dl:] = np.frombuffer(dict_, np.uint8)
        cap = (Np + Np // 255 + 64 + 3) & ~3
        combined = jnp.concatenate([jnp.asarray(dbuf), jnp.asarray(buf),
                                    jnp.zeros((8,), jnp.uint8)])
        meta = jnp.stack([jnp.int32(n), jnp.int32(D), jnp.int32(D - dl)])
        outs = {}
        for u16 in (False, True):
            o, t, ok = _encode_call_deep(combined, meta, cap, 16,
                                         interpret=True, u16chain=u16)
            assert bool(ok), (n, dl, u16)
            comp = np.asarray(o)[: int(t)].tobytes()
            assert native.decompress(
                comp, n, dict_=dict_ if dl else None) == data, (n, dl, u16)
            outs[u16] = comp
        # same chain semantics (hash log differs but these sizes collide
        # identically): byte-identical streams
        assert outs[False] == outs[True], (n, dl)
