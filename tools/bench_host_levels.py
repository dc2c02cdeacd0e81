"""Host codec A/B harness: single-thread encode speed + size per level.

Usage: python tools/bench_host_levels.py [--levels 9,10,11,12] [--mb 8]

Measures lz4r_compress (via the ctypes binding) on three corpora:
  * enwik-like  (natural text)
  * silesia-like (mixed: text / logs / sparse / incompressible)
  * boiler      (templated rows — the repeat-heavy pathology that made
                 L11-12 run at 0.3-6 MB/s before pattern analysis)

Hazards honored (docs/perf_notes.md): warm-up pass + min-of-N timing on a
contended VM; buffers preallocated to dodge first-touch faults.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plz4_tpu import corpus, native  # noqa: E402


# canonical constructions live in plz4_tpu.corpus (shared with the
# conformance suite's runs-class contract row)
boiler = corpus.boiler_rows
runs = corpus.byte_runs


def bench_one(data: bytes, level: int, reps: int) -> tuple[float, int]:
    csize = len(native.compress(data, level=level))  # warm-up + size
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        native.compress(data, level=level)
        best = min(best, time.perf_counter() - t0)
    return len(data) / best / 1e6, csize


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="6,9,10,11,12")
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    size = int(args.mb * (1 << 20))
    levels = [int(x) for x in args.levels.split(",")]
    corpora = {
        "enwik": corpus.enwik_like(size),
        "silesia": corpus.silesia_like(size),
        "boiler": boiler(size),
        "runs": runs(size),
    }
    print(f"{'corpus':10s} {'lvl':>3s} {'MB/s':>9s} {'csize':>10s} ratio")
    for name, data in corpora.items():
        for lv in levels:
            mbs, csize = bench_one(data, lv, args.reps)
            print(f"{name:10s} {lv:3d} {mbs:9.2f} {csize:10d} "
                  f"{len(data)/csize:.3f}", flush=True)


if __name__ == "__main__":
    main()
