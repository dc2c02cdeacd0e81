"""Per-level single-thread speed + size: ours vs upstream lz4 v1.10.0.

Same-process interleaved A/B on identical buffers (docs/perf_notes.md
measurement hazards: warm-up + min-of-N on a contended VM).

Usage: python tools/bench_vs_upstream.py [--levels 1,3,6,9,10,11,12]
       [--mb 4] [--reps 3] [--block-kb 0 (one-shot) | 64 | 4096]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plz4_tpu import corpus, native  # noqa: E402
from plz4_tpu.native import upstream  # noqa: E402
from tools.bench_host_levels import boiler, runs  # noqa: E402


def bench(fn, data: bytes, reps: int) -> tuple[float, int]:
    csize = len(fn(data))  # warm-up + size
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(data)
        best = min(best, time.perf_counter() - t0)
    return len(data) / best / 1e6, csize


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,3,6,9,10,11,12")
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--corpora", default="enwik,silesia,boiler,runs")
    args = ap.parse_args()
    size = int(args.mb * (1 << 20))
    levels = [int(x) for x in args.levels.split(",")]
    gens = {
        "enwik": lambda: corpus.enwik_like(size),
        "silesia": lambda: corpus.silesia_like(size),
        "boiler": lambda: boiler(size),
        "runs": lambda: runs(size),
    }
    corpora = {n: gens[n]() for n in args.corpora.split(",")}
    if not upstream.available():
        sys.exit(f"upstream oracle unavailable: {upstream.unavailable_reason()}")
    hdr = (f"{'corpus':8s} {'lvl':>3s} {'ours MB/s':>10s} {'up MB/s':>9s} "
           f"{'speed x':>8s} {'ours sz':>9s} {'up sz':>9s} {'delta':>7s}")
    print(hdr)
    for name, data in corpora.items():
        for lv in levels:
            om, os_ = bench(lambda d: native.compress(d, level=lv), data,
                            args.reps)
            um, us = bench(lambda d: upstream.compress(d, level=lv), data,
                           args.reps)
            print(f"{name:8s} {lv:3d} {om:10.2f} {um:9.2f} {om/um:8.2f} "
                  f"{os_:9d} {us:9d} {us-os_:+7d}", flush=True)


if __name__ == "__main__":
    main()
