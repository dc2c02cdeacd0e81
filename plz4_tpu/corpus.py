"""Deterministic benchmark corpora.

The environment has no network egress, so the classic corpora (enwik8,
Silesia) cannot be downloaded; these generators produce statistically
similar mixtures deterministically from a seed. `enwik_like` follows
enwik8's shape: XML-wrapped natural-language articles with wiki markup,
links, numeric tables and occasional base64-ish blobs — entropy sits in the
same band (lz4 -1 ratio ~1.9-2.2, HC ~2.4-2.8) so per-level ratio and
throughput comparisons carry over.

Reference analog: the Silesia samples used by the reference's tests
(internal/test/samples/README.md) — which were stripped from this mount.
"""

from __future__ import annotations

import numpy as np


def _words(rng) -> list[bytes]:
    """Zipf-ish vocabulary: a few hundred common short words, a long tail
    of longer rare ones (natural-language word-length distribution)."""
    common = [b"the", b"of", b"and", b"in", b"to", b"a", b"is", b"was",
              b"for", b"on", b"as", b"with", b"by", b"at", b"from", b"that",
              b"it", b"his", b"are", b"were", b"which", b"this", b"also",
              b"has", b"had", b"an", b"be", b"or", b"its", b"first", b"one",
              b"new", b"their", b"after", b"who", b"but", b"not", b"have",
              b"her", b"she", b"two", b"other", b"time", b"when", b"during"]
    tail = []
    for _ in range(4000):
        ln = int(rng.integers(4, 14))
        tail.append(bytes(rng.integers(97, 123, ln, dtype=np.uint8)))
    return common, tail


def _sentence(rng, common, tail) -> bytes:
    n = int(rng.integers(6, 22))
    words = []
    for _ in range(n):
        if rng.random() < 0.55:
            words.append(common[int(rng.integers(len(common)))])
        else:
            words.append(tail[int(rng.zipf(1.3)) % len(tail)])
    s = b" ".join(words)
    return s[:1].upper() + s[1:] + b". "


def _article(rng, common, tail, title_id: int) -> bytes:
    out = bytearray()
    out += b'  <page>\n    <title>Article %d</title>\n    <id>%d</id>\n' % (
        title_id, title_id)
    out += b'    <revision>\n      <timestamp>2006-%02d-%02dT%02d:44Z' % (
        int(rng.integers(1, 13)), int(rng.integers(1, 29)),
        int(rng.integers(0, 24)))
    out += b'</timestamp>\n      <text xml:space="preserve">'
    n_par = int(rng.integers(1, 5))
    for _ in range(n_par):
        n_sent = int(rng.integers(3, 12))
        for _ in range(n_sent):
            s = _sentence(rng, common, tail)
            # wiki markup: occasional links and emphasis
            if rng.random() < 0.25:
                w = tail[int(rng.integers(len(tail)))]
                s = s.replace(b" ", b" [[" + w + b"]] ", 1)
            if rng.random() < 0.1:
                s = b"'''" + s
            out += s
        out += b"\n\n"
    if rng.random() < 0.15:  # numeric table
        for _ in range(int(rng.integers(3, 10))):
            row = b"| %d || %d.%02d || %d\n" % tuple(
                int(x) for x in rng.integers(0, 10000, 4))
            out += row
    if rng.random() < 0.05:  # base64-ish blob (high entropy)
        blob = rng.integers(0, 64, int(rng.integers(100, 500)))
        table = (b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                 b"abcdefghijklmnopqrstuvwxyz0123456789+/")
        out += bytes(table[int(v)] for v in blob) + b"\n"
    out += b"</text>\n    </revision>\n  </page>\n"
    return bytes(out)


def enwik_like(size: int, seed: int = 20060303) -> bytes:
    """Deterministic enwik8-shaped corpus of exactly `size` bytes."""
    rng = np.random.default_rng(seed)
    common, tail = _words(rng)
    out = bytearray()
    out += b'<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.3/">\n'
    i = 0
    while len(out) < size:
        out += _article(rng, common, tail, i)
        i += 1
    return bytes(out[:size])


def byte_runs(size: int, seed: int = 9) -> bytes:
    """Byte runs interleaved with random text — the runs4m sweep-lab class
    (long period-1 runs exercise the pattern-analysis / long-run DP
    machinery; see docs/perf_notes.md). Shared by tools/bench_host_levels
    and the conformance suite's runs-class contract row."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    while len(out) < size:
        out += bytes([int(rng.integers(0, 4))]) * int(rng.integers(64, 8192))
        out += rng.integers(32, 127, int(rng.integers(20, 200)),
                            dtype=np.uint8).tobytes()
    return bytes(out[:size])


def boiler_rows(size: int, seed: int = 7) -> bytes:
    """Templated rows: medium-length repeats at thousands of offsets."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    tmpl = (b'<row id="%06d" class="item item-%d" state="ok">'
            b'<name>unit %05d</name><value>%d.%03d</value></row>\n')
    while len(out) < size:
        out += tmpl % tuple(int(x) for x in rng.integers(0, 1000, 5))
    return bytes(out[:size])


def runs_mix(size: int, seed: int = 7) -> bytes:
    """Byte runs interleaved with text — the runs4m conformance class
    (long single-byte runs force the far-carry / long-run machinery in
    the optimal parse; see docs/perf_notes.md runs4m)."""
    rng = np.random.default_rng(seed)
    text = enwik_like(min(size, 1 << 20), seed=seed + 1)
    out = bytearray()
    ti = 0
    while len(out) < size:
        if rng.random() < 0.5:
            out += bytes([int(rng.integers(0, 256))]) * int(
                rng.integers(20, 4000))
        else:
            n = int(rng.integers(200, 3000))
            out += text[ti % len(text): ti % len(text) + n]
            ti += n
    return bytes(out[:size])


def fixture_payload(spec: dict) -> bytes:
    """Deterministic payload from a manifest spec — the committed
    conformance fixtures (tests/fixtures/, tools/gen_fixtures.py) record
    these specs instead of the raw content so only the compressed frames
    plus hashes live in git (reference analog: the pinned-sha256 sample
    scheme of internal/test/samples/README.md)."""
    kind, size = spec["kind"], int(spec["size"])
    seed = spec.get("seed")
    if kind == "enwik":
        return enwik_like(size, **({"seed": seed} if seed else {}))
    if kind == "silesia":
        return silesia_like(size, **({"seed": seed} if seed else {}))
    if kind == "runs":
        return runs_mix(size, **({"seed": seed} if seed else {}))
    if kind == "random":
        rng = np.random.default_rng(seed if seed is not None else 99)
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    raise ValueError(f"unknown fixture payload kind {kind!r}")


def silesia_like(size: int, seed: int = 2003) -> bytes:
    """Mixed-mode corpus in Silesia's spirit: concatenated segments of
    text, structured records, sparse binary, and incompressible data."""
    rng = np.random.default_rng(seed)
    common, tail = _words(rng)
    out = bytearray()
    while len(out) < size:
        kind = rng.random()
        if kind < 0.45:  # text
            for _ in range(200):
                out += _sentence(rng, common, tail)
        elif kind < 0.70:  # structured records (log lines)
            for _ in range(300):
                out += b"2026-08-%02d %02d:%02d:%02d host%02d svc[%d]: " % (
                    tuple(int(x) for x in (
                        rng.integers(1, 29), rng.integers(0, 24),
                        rng.integers(0, 60), rng.integers(0, 60),
                        rng.integers(1, 20), rng.integers(100, 999))))
                out += common[int(rng.integers(len(common)))] + b" ok\n"
        elif kind < 0.85:  # sparse binary
            seg = np.zeros(int(rng.integers(5000, 20000)), dtype=np.uint8)
            pos = rng.integers(0, len(seg), len(seg) // 50)
            seg[pos] = rng.integers(1, 256, len(pos))
            out += seg.tobytes()
        else:  # incompressible
            out += rng.integers(0, 256, int(rng.integers(3000, 12000)),
                                dtype=np.uint8).tobytes()
    return bytes(out[:size])
