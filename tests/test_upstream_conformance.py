"""Independent conformance vs the reference's vendored upstream lz4 v1.10.0.

This anchors the BASELINE.md north-star contract to an implementation we did
not write (reference: internal/pkg/clz4/{lz4.c,lz4hc.c}, the exact codec the
reference calls through CGO — clz4/clz4.go:27-94):

  * every repo encoder's output decodes bit-exactly with upstream
    LZ4_decompress_safe[_usingDict];
  * upstream-compressed blocks (fast + HC 2-12, dict + linked-chain modes)
    decode bit-exactly on every repo decoder;
  * our compressed size is <= upstream's at every mapped level on multiple
    corpora (the "size <= plz4" half of the contract).

The fixture corpus includes the one sample surviving in the mount
(internal/test/samples/dict.bin.bz2). Skips when the reference mount or a C
compiler is unavailable.
"""

import bz2
import os

import pytest

import upstream_oracle as up
from plz4_tpu import native
from plz4_tpu.ops import decode_jax, decode_pallas, encode_jax, encode_pallas

from conftest import make_compressible, make_incompressible

pytestmark = pytest.mark.skipif(
    not up.available(), reason=lambda: up.unavailable_reason())

_DICT_SAMPLE = "/root/reference/internal/test/samples/dict.bin.bz2"


def _dict_bin() -> bytes:
    with open(_DICT_SAMPLE, "rb") as f:
        return bz2.decompress(f.read())


def corpus():
    from plz4_tpu import corpus as corpus_mod

    c = [
        ("text64k", make_compressible(65536, seed=90)),
        ("mixed", make_compressible(30000, seed=92)
         + make_incompressible(8000, seed=93) + b"Z" * 12000),
        ("zeros", b"\x00" * 50000),
        ("period5", (make_incompressible(5, seed=91) * 10000)[:50000]),
        ("random", make_incompressible(32768, seed=5)),
        # realistic mixed corpora (deterministic enwik8/Silesia stand-ins)
        ("enwik", corpus_mod.enwik_like(1 << 19)),
        ("silesia", corpus_mod.silesia_like(1 << 19)),
    ]
    if os.path.exists(_DICT_SAMPLE):
        c.append(("dictbin", _dict_bin()[:65536]))
    return c


CORPUS = corpus() if up.available() else []
CORPUS_IDS = [name for name, _ in CORPUS]


# --- our encoders -> upstream decoder --------------------------------------


@pytest.mark.parametrize("level", [1, 2, 3, 6, 9, 10, 12])
@pytest.mark.parametrize("name,data", CORPUS, ids=CORPUS_IDS)
def test_native_encode_upstream_decode(level, name, data):
    comp = native.compress(data, level=level)
    assert up.decompress(comp, len(data)) == data


@pytest.mark.parametrize("name,data", CORPUS[:3], ids=CORPUS_IDS[:3])
def test_array_encode_upstream_decode(name, data):
    data = data[:8000]
    comp = encode_jax.encode_block_host(data)
    if comp is None:  # encoder flagged incompressible
        return
    assert up.decompress(comp, len(data)) == data


@pytest.mark.parametrize("name,data", CORPUS[:3], ids=CORPUS_IDS[:3])
def test_pallas_encode_upstream_decode(name, data):
    data = data[:8000]
    comp = encode_pallas.encode_block_host(data, interpret=True)
    if comp is None:
        return
    assert up.decompress(comp, len(data)) == data


# --- upstream encoder -> our decoders --------------------------------------


@pytest.mark.parametrize("level", [1, 3, 6, 9, 12])
@pytest.mark.parametrize("name,data", CORPUS, ids=CORPUS_IDS)
def test_upstream_encode_native_decode(level, name, data):
    comp = up.compress(data, level)
    assert native.decompress(comp, len(data)) == data


@pytest.mark.parametrize("name,data", CORPUS[:3], ids=CORPUS_IDS[:3])
def test_upstream_encode_device_decoders(name, data):
    data = data[:8000]
    comp = up.compress(data, 6)
    cap = max(len(data), 16)
    assert decode_jax.decode_block_host(comp, out_cap=cap) == data
    assert decode_pallas.decode_block_host(
        comp, out_cap=cap, interpret=True) == data


# --- size contract: ours <= upstream at every level ------------------------


@pytest.mark.parametrize("name,data", CORPUS, ids=CORPUS_IDS)
def test_size_contract_every_level(name, data):
    deltas = {}
    for level in range(1, 13):
        ours = len(native.compress(data, level=level))
        theirs = len(up.compress(data, level))
        deltas[level] = ours - theirs
    losses = {lv: d for lv, d in deltas.items() if d > 0}
    assert not losses, (
        f"compressed size exceeds upstream on {name}: {losses} "
        f"(full deltas {deltas})")


# --- dictionary conformance -------------------------------------------------


@pytest.mark.parametrize("level", [1, 6, 12])
def test_dict_compress_upstream_decodes(level):
    dict_ = _dict_bin()[:65536] if os.path.exists(_DICT_SAMPLE) else \
        make_compressible(30000, seed=1)
    data = make_compressible(20000, seed=40)
    comp = native.compress(data, level=level, dict_=dict_)
    assert up.decompress(comp, len(data), dict_=dict_) == data


@pytest.mark.parametrize("level", [1, 9, 10, 11])
def test_upstream_dict_compress_we_decode(level):
    dict_ = _dict_bin()[:65536] if os.path.exists(_DICT_SAMPLE) else \
        make_compressible(30000, seed=1)
    data = make_compressible(20000, seed=41)
    comp = up.compress_linked([data], level=level, dict_=dict_)[0]
    assert native.decompress(comp, len(data), dict_=dict_) == data


# --- linked-chain conformance (the linked-frame block sequence) -------------


@pytest.mark.parametrize("level", [1, 6, 9, 11])
def test_upstream_linked_chain_we_decode(level):
    blocks = [make_compressible(16000, seed=50 + i) for i in range(5)]
    chain = up.compress_linked(blocks, level=level)
    window = b""
    for raw, comp in zip(blocks, chain):
        out = native.decompress(comp, len(raw),
                                dict_=window if window else None)
        assert out == raw
        window = (window + out)[-65536:]


@pytest.mark.parametrize("level", [1, 6, 9, 11])
def test_our_linked_chain_upstream_decodes(level):
    blocks = [make_compressible(16000, seed=60 + i) for i in range(5)]
    window = b""
    for raw in blocks:
        comp = native.compress(raw, level=level,
                               dict_=window if window else None)
        out = up.decompress(comp, len(raw), dict_=window if window else None)
        assert out == raw
        window = (window + raw)[-65536:]


# --- randomized cross-fuzz: both directions at random levels ----------------


def _structured_payload(rng) -> bytes:
    """Random mix of compressible / incompressible / periodic / zero /
    run-dense-text segments — the structural shapes that stress parser
    tiers and the pass-1 approximations."""
    parts = []
    for _ in range(rng.randrange(1, 8)):
        kind = rng.randrange(5)
        n = rng.randrange(1, 20000)
        if kind == 0:
            parts.append(make_compressible(n, seed=rng.randrange(1 << 30)))
        elif kind == 1:
            parts.append(make_incompressible(n, seed=rng.randrange(1 << 30)))
        elif kind == 2:
            p = max(1, rng.randrange(1, 40))
            parts.append(
                (make_incompressible(p, seed=rng.randrange(1 << 30))
                 * (n // p + 1))[:n])
        elif kind == 3:
            parts.append(b"\x00" * n)
        else:
            # word-soup text interleaved with many SHORT zero runs: the
            # worst constructed class for the carry-skip approximation
            # (see the KNOWN APPROXIMATION note in lz4r.cpp pass 1)
            seg = bytearray()
            while len(seg) < n:
                seg += make_compressible(rng.randrange(30, 300),
                                         seed=rng.randrange(1 << 30))
                seg += b"\x00" * rng.randrange(8, 520)
            parts.append(bytes(seg[:n]))
    return b"".join(parts)


@pytest.mark.parametrize("seed", range(12))
def test_cross_fuzz_random_payloads(seed):
    """Randomized conformance: our encoders' output decodes bit-exactly
    through the upstream decoder AND vice versa, at a random level,
    with and without a random dictionary."""
    import random

    rng = random.Random(9000 + seed)
    data = _structured_payload(rng)
    level = rng.choice([1, 2, 3, 5, 6, 8, 9, 10, 12])
    dict_ = (None if rng.random() < 0.5 else
             _structured_payload(rng)[:rng.randrange(16, 65536)])

    ours = native.compress(data, level=level, dict_=dict_)
    assert up.decompress(ours, len(data), dict_=dict_) == data
    theirs = (up.compress(data, level) if dict_ is None else None)
    if theirs is not None:
        assert native.decompress(theirs, len(data)) == data
        assert len(ours) <= len(theirs), (
            f"size contract violated at level {level}: "
            f"{len(ours)} > {len(theirs)}")


@pytest.mark.skipif(not os.environ.get("PLZ4_FUZZ_FULL"),
                    reason="adversarial sweep: set PLZ4_FUZZ_FULL=1 "
                           "(500 seeds, ~20 s) or 2 (2000 seeds)")
def test_size_contract_residual_bound():
    """The KNOWN APPROXIMATION in lz4r.cpp, enforced at the measurement
    (VERDICT r3 #6 tightened the old 20%/2% envelope): across 500 seeds
    (2000 with PLZ4_FUZZ_FULL=2) of adversarial structured payloads at
    every opt level, each loss vs upstream is <= max(10 bytes, 1% of the
    upstream size) and at most 8% of (payload, level) trials lose at
    all. Measured round 5 (2000-seed tier, after the shortlag reroute
    gained its uniform<16 discriminator): 5.2% of trials lose, worst
    35 B / 0.15% abs and 13 B / 0.40% rel, L9 near-zero (8 losses).
    The relative arm exists for the run-dense-text class — see the
    KNOWN APPROXIMATION note in lz4r.cpp pass 1; knob sweeps recover
    under 20% of it, the rest is the carry-skip architecture trade.
    Realistic corpora must never lose (pinned by
    test_size_contract_every_level); this pins the adversarial boundary
    so the contract's edge is a test, not folklore."""
    import random

    seeds = 2000 if os.environ.get("PLZ4_FUZZ_FULL") == "2" else 500
    trials = 0
    losses = []  # (seed, level, delta, rel)
    for seed in range(seeds):
        rng = random.Random(31337 + seed)
        data = _structured_payload(rng)
        for level in (9, 10, 11, 12):
            trials += 1
            ours = len(native.compress(data, level=level))
            theirs = len(up.compress(data, level))
            if ours > theirs:
                losses.append((seed, level, ours - theirs,
                               (ours - theirs) / max(1, theirs)))
    bad = [x for x in losses if x[2] > 10 and x[3] > 0.01]
    frac = len(losses) / trials
    assert not bad, f"loss exceeds documented bound: {bad[:20]}"
    assert frac <= 0.08, (
        f"{len(losses)}/{trials} trials lose vs upstream "
        f"(bound 8%): {losses[:20]}")


# --- frame-level: upstream blocks wrapped in our frames round-trip ----------


def test_frame_of_upstream_blocks_decodes():
    """Hand-build an LZ4 frame whose block payloads were produced by the
    upstream codec; our frame Reader must decode it bit-exactly."""
    import io

    from plz4_tpu import Reader
    from plz4_tpu.frame import block_io, header as hdr, trailer

    payload = make_compressible(200000, seed=70)
    bs = 65536
    pieces = [hdr.write_header(block_size_idx=4, block_linked=False,
                               block_checksum=False, content_checksum=False,
                               content_size=None, dict_id=None)]
    for i in range(0, len(payload), bs):
        blk = payload[i:i + bs]
        comp = up.compress_fast(blk)
        if len(comp) >= len(blk):
            pieces.append(block_io.frame_block(blk, True, False,
                                               hash_fn=native.xxh32))
        else:
            pieces.append(block_io.frame_block(comp, False, False,
                                               hash_fn=native.xxh32))
    pieces.append(trailer.write_trailer(None))
    stream = b"".join(pieces)
    with Reader(io.BytesIO(stream)) as r:
        assert r.read() == payload


def test_l8_is_the_upstream_l9_point():
    """Round-4 capability pin (VERDICT r3 missing #2): level 8 — the
    ladder's fast-high chain parse, with the PaSum run fast path — must
    stay within a whisker of upstream LEVEL 9's size on the four lab
    corpora (measured at 1 MiB: +0 enwik / +44 silesia / +0 boiler /
    +5 runs). This is the "switch-over" point for upstream-L9 users:
    near-tie size at 0.75-0.84x upstream-L9 single-thread speed
    (BASELINE.md L9 design note). A finder regression that reopens the
    old +700 B runs/silesia gaps fails here."""
    from plz4_tpu import corpus as corpus_mod
    from tools.bench_host_levels import boiler, runs

    size = 1 << 20
    corpora = {
        "enwik": corpus_mod.enwik_like(size),
        "silesia": corpus_mod.silesia_like(size),
        "boiler": boiler(size),
        "runs": runs(size),
    }
    total = 0
    for name, data in corpora.items():
        ours = len(native.compress(data, level=8))
        theirs = len(up.compress(data, 9))
        delta = ours - theirs
        assert delta <= 100, (name, ours, theirs, delta)
        total += max(0, delta)
    assert total <= 150, total


def test_runs_class_contract_pinned_exception():
    """Runs-class size contract (VERDICT r4 directive #2): the byte-runs
    corpus is the ONE class where "size <= upstream at every level" has
    known, argued exceptions — pinned here so the contract's edge is a
    test, not a perf-notes footnote. Two levels lose by a bounded hair:

      * L9: upstream's hashChain heuristic lands 3-4 B/MiB below our
        sparse-scheduled exact DP (measured -4 B at 1 MiB, -13 B at
        4 MiB). The exhaustive pass-1 parameters that tie it exactly
        (skip_len=inf, valve off) are rejected because they admit the
        mutated-short-period pathology class (~2 MB/s crawls, measured
        round 4; docs/perf_notes.md "Known residuals").
      * L1: greedy parse-choice noise, ~6-15 B/MiB (measured -6 B at
        1 MiB, -60 B at 4 MiB): our greedy occasionally takes a long
        FAR match that ends mid-run and pays an extra sequence where
        upstream hits the period-2 RLE continuation two bytes later
        (sequence-stream diff, round 5). Mimicking upstream's exact
        table policy pointwise would forfeit the L2-8 wins below.

    Bounds: L1 <= 12 B and L9 <= 8 B at 1 MiB (3x measured headroom,
    0.004%/0.003% of output); every other level must win or tie
    outright (we beat upstream by +163 B (L8) to +463 B (L2) and
    +97..+166 B at L10-12 on this class), and streams stay bit-exact
    both ways."""
    from plz4_tpu import corpus as corpus_mod

    data = corpus_mod.byte_runs(1 << 20)
    bounds = {1: 12, 9: 8}
    for level in range(1, 13):
        ours_c = native.compress(data, level=level)
        theirs_c = up.compress(data, level)
        delta = len(ours_c) - len(theirs_c)
        assert delta <= bounds.get(level, 0), (
            level, len(ours_c), len(theirs_c), delta)
        # conformance is two-sided: both streams decode bit-exactly on
        # the other implementation's decoder
        assert up.decompress(ours_c, len(data)) == data
        assert native.decompress(theirs_c, len(data)) == data


def test_chain_level_adversarial_envelope():
    """Levels 1-8 analog of the opt-level residual bound above: across
    structured adversarial payloads (the property-fuzz generator: tiles,
    concats, soups, runs), each loss vs upstream is <= max(16 B, 2.5% of
    the upstream size). Pins the round-5 level-2 tiny-alphabet bump —
    upstream's clevel 1-2 are LZ4MID (dual 4+8-byte hash,
    clz4/lz4hc.c:92-107) whose 8-gram selectivity beat the 4-gram chain
    by up to 24% on <= 16-distinct regions before the windowed
    classification. Measured round 5 (three ~130k-case differential
    soaks): worst residual 545 B / 1.7%."""
    import numpy as np

    from test_property_fuzz import _gen

    bad = []
    for seed in range(200):
        rng = np.random.default_rng(777000 + seed)
        size = int(rng.integers(4096, 128 * 1024))
        data = _gen(rng, size)
        for level in (1, 2, 5, 8):
            ours = len(native.compress(data, level=level))
            theirs = len(up.compress(data, level))
            d = ours - theirs
            if d > 16 and d > theirs * 0.025:
                bad.append((seed, level, d, d / theirs))
    assert not bad, f"chain-level loss exceeds envelope: {bad[:10]}"
