"""Large-payload tests (reference analog: the 2 GiB "Monster" generator,
internal/test/samples.go:122-139 — scaled down for CI; set PLZ4_MONSTER=1
for the full-size run)."""

import io
import os

import numpy as np
import pytest

import plz4_tpu as plz4
from plz4_tpu.frame import descriptor as desc

MONSTER = os.environ.get("PLZ4_MONSTER") == "1"
SIZE = (2 << 30) if MONSTER else (64 << 20)


def _monster_chunks(total: int, chunk: int = 4 << 20):
    """Repeating compressible pattern, generated streamingly."""
    pat = np.frombuffer(
        b"the quick brown fox jumps over the lazy dog 0123456789 " * 1024,
        dtype=np.uint8)
    base = np.tile(pat, chunk // len(pat) + 1)[:chunk].tobytes()
    n = 0
    while n < total:
        take = min(chunk, total - n)
        yield base[:take]
        n += take


@pytest.mark.parametrize("parallel", [0, -1])
def test_monster_roundtrip_streaming(tmp_path, parallel):
    path = tmp_path / "monster.lz4"
    import hashlib

    h_in = hashlib.sha256()
    with open(path, "wb") as f:
        w = plz4.Writer(f, parallel=parallel,
                        block_size_idx=desc.BLOCK_IDX_4MB)
        for chunk in _monster_chunks(SIZE):
            h_in.update(chunk)
            w.write(chunk)
        w.close()

    assert path.stat().st_size < SIZE // 50  # repetitive data crushes

    h_out = hashlib.sha256()
    n = 0
    with open(path, "rb") as f:
        r = plz4.Reader(f, parallel=parallel)
        while True:
            b = r.read(8 << 20)
            if not b:
                break
            h_out.update(b)
            n += len(b)
        r.close()
    assert n == SIZE
    assert h_out.digest() == h_in.digest()
