"""Compression-ratio regression guard.

Pins the per-level compressed sizes on a fixed corpus (1 MiB synthetic
text, seed 777). A future change may only shrink these (better ratio);
growth beyond 1% fails. This is the "compressed size <= plz4 at every
level" contract's internal regression net (BASELINE.md).
"""

from plz4_tpu import native

from conftest import make_compressible

# sizes recorded 2026-08-17 (native codec, levels 1..12) after the round-2
# match-finder rewrites: wider-match scoring + 3-match arbitration (2-8),
# 5-byte greedy hash (1), and the extension-aware optimal parse (9-12).
# Every level is <= the upstream lz4 v1.10.0 size at the same level across
# the 11-corpus conformance sweep (test_upstream_conformance.py).
PINNED = [433375, 277188, 263067, 250105, 239111, 233586, 230888, 227882,
          218537, 206571, 204152, 204152]


def test_ratio_ladder_no_regression():
    data = make_compressible(1 << 20, seed=777)
    for level, pinned in zip(range(1, 13), PINNED):
        size = len(native.compress(data, level=level))
        assert size <= int(pinned * 1.01), (
            f"level {level} ratio regressed: {size} vs pinned {pinned}")
        assert native.decompress(
            native.compress(data, level=level), len(data)) == data


def test_ladder_monotone_nonincreasing():
    data = make_compressible(1 << 19, seed=778)
    sizes = [len(native.compress(data, level=lv)) for lv in (1, 3, 6, 9, 12)]
    for a, b in zip(sizes, sizes[1:]):
        assert b <= int(a * 1.005), sizes
