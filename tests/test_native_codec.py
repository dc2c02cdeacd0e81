"""Native C++ block codec: round-trips, levels, dictionaries, corruption.

Reference test analog: internal/test/block_test.go (raw block API round-trips
and cross-implementation interop).
"""

import numpy as np
import pytest

from plz4_tpu import errors as zerr
from plz4_tpu import native

from conftest import make_compressible, make_incompressible

LEVELS = [1, 2, 4, 6, 9, 10, 11, 12]


@pytest.mark.parametrize("level", LEVELS)
@pytest.mark.parametrize("size", [0, 1, 5, 12, 13, 64, 1000, 65536, 1 << 18])
def test_roundtrip_text(level, size):
    data = make_compressible(size, seed=size + level)
    comp = native.compress(data, level=level)
    assert native.decompress(comp, len(data)) == data


@pytest.mark.parametrize("level", [1, 6, 12])
def test_roundtrip_random(level):
    data = make_incompressible(4096)
    comp = native.compress(data, level=level)
    assert native.decompress(comp, len(data)) == data


@pytest.mark.parametrize("level", [1, 6, 12])
def test_roundtrip_zeros(level):
    data = b"\x00" * 100_000
    comp = native.compress(data, level=level)
    assert len(comp) < 1000  # RLE-style data compresses hard
    assert native.decompress(comp, len(data)) == data


def test_higher_levels_do_not_hurt():
    data = make_compressible(1 << 18)
    sizes = [len(native.compress(data, level=lv)) for lv in (1, 6, 12)]
    assert sizes[1] <= sizes[0]
    assert sizes[2] <= sizes[1]


def test_compress_into_cap_too_small_returns_none():
    data = make_incompressible(4096)
    assert native.compress_into(data, dst_cap=100, level=1) is None


def test_compress_bound():
    for n in (0, 1, 100, 65536):
        data = make_incompressible(n, seed=n)
        comp = native.compress(data, level=1)
        assert len(comp) <= native.compress_bound(n)


@pytest.mark.parametrize("level", [1, 6, 12])
def test_dictionary_roundtrip(level):
    dict_ = make_compressible(8192, seed=1)
    # payload shares structure with the dictionary -> better ratio
    data = dict_[100:2100] + b"tail bytes " * 20
    comp_nodict = native.compress(data, level=level)
    comp_dict = native.compress(data, level=level, dict_=dict_)
    assert native.decompress(comp_dict, len(data), dict_=dict_) == data
    assert len(comp_dict) <= len(comp_nodict)


def test_dictionary_wrong_dict_fails_or_differs():
    dict_ = make_incompressible(4096, seed=2)
    data = dict_[-2000:]  # only the dict window can supply matches
    comp = native.compress(data, level=1, dict_=dict_)
    assert len(comp) < len(data)  # dict must actually have been referenced
    wrong = make_incompressible(4096, seed=3)
    try:
        out = native.decompress(comp, len(data), dict_=wrong)
        assert out != data
    except zerr.Lz4Error:
        pass


def test_dictionary_truncated_to_64k():
    dict_ = make_compressible(100_000, seed=4)
    data = dict_[-5000:]
    comp = native.compress(data, level=1, dict_=dict_)
    # only the last 64 KiB is the window; decode with the same truncation rule
    assert native.decompress(comp, len(data), dict_=dict_) == data


def test_decompress_corrupted():
    data = make_compressible(10000)
    comp = bytearray(native.compress(data, level=1))
    bad = 0
    for i in range(0, len(comp), 7):
        mutated = bytearray(comp)
        mutated[i] ^= 0xFF
        try:
            out = native.decompress(bytes(mutated), len(data))
            if out != data:
                bad += 1
        except zerr.Lz4Error:
            bad += 1
    assert bad > 0  # most corruptions must be detected or change output


def test_decompress_truncated():
    data = make_compressible(10000)
    comp = native.compress(data, level=1)
    for cut in range(0, len(comp), 11):
        try:
            out = native.decompress(comp[:cut], len(data))
            assert out != data or cut == len(comp)
        except zerr.Lz4Error:
            pass


def test_decompress_overflow_guard():
    data = make_compressible(10000)
    comp = native.compress(data, level=1)
    with pytest.raises(zerr.Lz4Error):
        native.decompress(comp, len(data) - 1)  # dst too small must error


def test_empty_block():
    comp = native.compress(b"", level=1)
    assert native.decompress(comp, 0) == b""


def test_incompressible_detection():
    # With cap below input size, random data must signal incompressible
    data = make_incompressible(65536)
    assert native.compress_into(data, dst_cap=len(data) - 1, level=1) is None


def test_dict_context_reuse():
    """Reusable dict context must match per-call dict compression output
    semantics and round-trip, while amortizing window loading."""
    import plz4_tpu as plz4

    dict_ = make_incompressible(65536, seed=21)
    ctx = plz4.DictContext(dict_)
    # note: with a full 64 KiB window, bytes at its very start sit at
    # distance 65536 — beyond the LZ4 max offset — so start past them
    for i in range(1, 20):
        rec = dict_[i * 1000 : i * 1000 + 900] + bytes([i]) * 124
        comp = ctx.compress_block(rec)
        assert ctx.decompress_block(comp, dst_size=len(rec)) == rec
        # must actually exploit the dictionary
        assert len(comp) < len(rec) // 2


def test_dict_context_matches_plain_dict_path():
    import plz4_tpu as plz4

    dict_ = make_incompressible(8192, seed=22)
    rec = dict_[-1500:]
    ctx = plz4.DictContext(dict_)
    comp_ctx = ctx.compress_block(rec)
    assert native.decompress(comp_ctx, len(rec), dict_=dict_) == rec


def test_dict_context_speedup():
    import time

    import plz4_tpu as plz4

    dict_ = make_compressible(65536, seed=23)
    recs = [make_compressible(1024, seed=100 + i) for i in range(50)]
    ctx = plz4.DictContext(dict_)

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain = timed(lambda: [plz4.compress_block(r, dictionary=dict_)
                             for r in recs])
    t_ctx = timed(lambda: [ctx.compress_block(r) for r in recs])
    # amortized table must win clearly (wide margin vs timing noise)
    assert t_ctx < t_plain * 0.8, (t_ctx, t_plain)


# --- streaming contexts (round 2) ------------------------------------------


def test_stream_compressor_chain_roundtrip():
    """Chained blocks through the stateful stream context decode with the
    rolling-window semantics of a linked frame, at every level class."""
    blocks = [make_compressible(12000, seed=300 + i) for i in range(6)]
    for level in (1, 6, 9, 12):
        sc = native.StreamCompressor(level)
        window = b""
        for raw in blocks:
            comp = sc.compress(raw)
            out = native.decompress(comp, len(raw),
                                    dict_=window if window else None)
            assert out == raw, f"level {level}"
            window = (window + raw)[-65536:]


def test_stream_compressor_initial_dict():
    d = make_compressible(30000, seed=310)
    data = make_compressible(20000, seed=311)
    for level in (1, 6):
        sc = native.StreamCompressor(level, dict_=d)
        comp = sc.compress(data)
        assert native.decompress(comp, len(data), dict_=d) == data


def test_stream_decompressor_chain():
    blocks = [make_compressible(12000, seed=320 + i) for i in range(6)]
    sc = native.StreamCompressor(6)
    sd = native.StreamDecompressor()
    for raw in blocks:
        comp = sc.compress(raw)
        assert sd.decompress(comp, len(raw)) == raw


def test_stream_decompressor_raw_blocks_extend_window():
    """Uncompressed blocks in a chain still extend the decode window."""
    a = make_compressible(9000, seed=330)
    b = make_incompressible(5000, seed=331)  # stored raw
    c = a[:4000] + b[:2000]                  # matches into both
    sc = native.StreamCompressor(1)
    sd = native.StreamDecompressor()
    ca = sc.compress(a)
    assert sd.decompress(ca, len(a)) == a
    cb = sc.compress(b, len(b) - 1)          # likely incompressible
    if cb is None:
        sd.append_raw(b)
    else:
        assert sd.decompress(cb, len(b)) == b
    cc = sc.compress(c)
    assert sd.decompress(cc, len(c)) == c


def test_stream_slide_preserves_window():
    """Chains longer than the stream buffer slide without corrupting the
    rolling 64 KiB window."""
    blocks = [make_compressible(150000, seed=340 + i) for i in range(12)]
    sc = native.StreamCompressor(1)
    sd = native.StreamDecompressor()
    window = b""
    for raw in blocks:
        comp = sc.compress(raw)
        assert sd.decompress(comp, len(raw)) == raw
        # cross-check against the stateless dict decoder
        assert native.decompress(comp, len(raw),
                                 dict_=window if window else None) == raw
        window = (window + raw)[-65536:]


def test_sync_linked_writer_uses_stream_path():
    """parallel=0 linked frames (stream-context path) must interoperate
    with the threaded reader and vice versa."""
    import io

    import plz4_tpu as plz4

    data = make_compressible(300000, seed=350)
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=0, block_linked=True, level=6,
                    block_size_idx=4)
    w.write(data)
    w.close()
    assert plz4.decompress(out.getvalue(), parallel=-1) == data
    assert plz4.decompress(out.getvalue(), parallel=0) == data


def test_cost64_instantiation_parity():
    """The int64 CostT instantiation (giant raw-API inputs) must produce
    byte-identical output to the int32 path on the same data. Forced via
    PLZ4_FORCE_COST64 in a subprocess (the flag is read once per
    process)."""
    import subprocess
    import sys

    code = r"""
import sys
sys.path.insert(0, %r)
sys.path.insert(0, %r)
from conftest import make_compressible
from plz4_tpu import native
data = make_compressible(150000, seed=77) + b"\x00" * 5000 + \
    make_compressible(30000, seed=78)
for lv in (9, 11, 12):
    comp = native.compress(data, level=lv)
    assert native.decompress(comp, len(data)) == data, lv
    sys.stdout.write("%%d:%%d\n" %% (lv, len(comp)))
"""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = code % (repo, os.path.join(repo, "tests"))

    def run(env_extra):
        env = dict(os.environ, **env_extra)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-800:]
        return r.stdout

    assert run({}) == run({"PLZ4_FORCE_COST64": "1"})


# --- sparse-parse (levels 9-11) edge cases ------------------------------
# The dispatcher routes L9-10 (and L11 blocks > 1 MiB) through the DP
# with coverage-extension pass-1 scheduling (compress_opt_t<.., SPARSE>),
# except run-dominated blocks which take the dense scan (lz4r.cpp
# compress_opt). Reference analog of the speed tier this replaces:
# LZ4HC_compress_optimal (lz4hc.c:1823).


@pytest.mark.parametrize("level", [9, 10, 11])
def test_fwd_parse_routing_boundary_roundtrip(level):
    """Blocks straddling the L11 1-MiB sparse/dense routing boundary
    roundtrip bit-exactly on both sides (and the boundary block itself)."""
    rng = np.random.default_rng(77)
    base = make_compressible(1 << 20, seed=7) + bytes(rng.integers(
        0, 256, 4096, dtype=np.uint8))
    for n in ((1 << 20) - 1, 1 << 20, (1 << 20) + 1):
        data = base[:n]
        comp = native.compress(data, level=level)
        assert native.decompress(comp, n) == data


@pytest.mark.parametrize("level", [9, 10, 11])
def test_fwd_parse_run_dense_min_of_two(level):
    """Run-dense blocks route to the dense-scan DP; the output must
    roundtrip and never exceed the plain HC level below it (sanity
    envelope, not the contract — the upstream oracle pins the real
    contract)."""
    rng = np.random.default_rng(13)
    parts = []
    for _ in range(200):
        parts.append(bytes([int(rng.integers(0, 4))]) *
                     int(rng.integers(40, 3000)))
        parts.append(bytes(rng.integers(33, 120, int(rng.integers(5, 90)),
                                        dtype=np.uint8)))
    data = b"".join(parts)
    comp = native.compress(data, level=level)
    assert native.decompress(comp, len(data)) == data
    assert len(comp) <= len(native.compress(data, level=8))


@pytest.mark.parametrize("level", [9, 10, 11, 12])
def test_dict_context_prebuilt_opt_matches_plain(level):
    """DictContext at the opt levels runs on prebuilt rebased chains
    (lz4r.cpp Lz4rDictCtx.opt) — outputs must be bit-identical to the
    plain per-call dict path (the prebuilt inserts stop 8 short of the
    window end and the working finder's first insert_upto catches up,
    so the finder state at the first probe is identical)."""
    rng = np.random.default_rng(55)
    dict_ = make_compressible(65536, seed=21)
    ctx = None
    import plz4_tpu as plz4
    ctx = plz4.DictContext(dict_)
    payloads = [
        make_compressible(1024, seed=100 + i) for i in range(8)
    ] + [
        b"\x00" * 5000,  # run-dense: the DP-only routing
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # incompressible
        dict_[1000:3000],  # pure dict match
    ]
    for data in payloads:
        a = ctx.compress_block(data, level=level)
        b = native.compress(data, level=level, dict_=dict_)
        assert a == b
        assert native.decompress(a, len(data), dict_=dict_) == data


@pytest.mark.parametrize("level", [9, 10, 11])
def test_fwd_parse_tight_cap_returns_none(level):
    """compress_into with an undersized dst fails cleanly (the raw-block
    API's retry-growth path depends on this) at the fwd-parse levels."""
    data = make_incompressible(8192, seed=3)
    assert native.compress_into(data, dst_cap=64, level=level) is None


def test_hc_lab_knobs_subprocess():
    """The env-gated chain-finder lab knobs (PLZ4_HC_SWAP / PLZ4_HC_ATT /
    PLZ4_HC_SUFF — read once via static init, so they need a fresh
    process) must keep the codec correct: roundtrip at the chain levels
    and decode via the plain-config codec. Keeps the gated paths from
    rotting while they stay off by default."""
    import os
    import subprocess
    import sys

    prog = (
        "import sys; sys.path.insert(0, %r)\n"
        "from plz4_tpu import native\n"
        "from conftest_helpers import payload\n"
        "data = payload()\n"
        "for lvl in (2, 5, 8):\n"
        "    c = native.compress(data, level=lvl)\n"
        "    assert native.decompress(c, len(data)) == data, lvl\n"
        "print('ok', flush=True)\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    helper = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "conftest_helpers.py")
    for env_extra in ({"PLZ4_HC_SWAP": "1"},
                      {"PLZ4_HC_ATT": "768"},
                      {"PLZ4_HC_SUFF": "64"},
                      {"PLZ4_HC_SWAP": "1", "PLZ4_HC_ATT": "512",
                       "PLZ4_HC_SUFF": "96"}):
        env = dict(os.environ, **env_extra)
        env["PYTHONPATH"] = os.path.dirname(helper)
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0 and "ok" in r.stdout, \
            (env_extra, r.stdout, r.stderr)
