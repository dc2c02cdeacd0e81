"""Compression-ratio regression guard.

Pins the per-level compressed sizes on a fixed corpus (1 MiB synthetic
text, seed 777). A future change may only shrink these (better ratio);
growth beyond 1% fails. This is the "compressed size <= plz4 at every
level" contract's internal regression net (BASELINE.md).
"""

from plz4_tpu import native

from conftest import make_compressible

# sizes recorded 2026-08-17 (native codec, levels 1..12)
PINNED = [511340, 379330, 340924, 300606, 267061, 248322, 237736, 227066,
          215808, 206671, 204152, 204152]


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
