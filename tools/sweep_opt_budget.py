"""Sweep optimal-parse search budgets (levels 9-12) against the upstream
oracle: for each (attempts, sufficient, skip_len) config, report size delta
vs upstream on every conformance corpus and single-thread speed on the 4 MiB
bench corpora. Used to pick the per-level defaults in lz4r.cpp's
g_opt_params (the speed/size frontier; contract: delta >= 0 everywhere).

Usage: python tools/sweep_opt_budget.py [--level 9] [--mb 4] [--reps 2]
"""

from __future__ import annotations

import argparse
import ctypes
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plz4_tpu import corpus as corpus_mod, native  # noqa: E402
from plz4_tpu.native import upstream  # noqa: E402
from tools.bench_host_levels import boiler, runs  # noqa: E402


def set_params(level: int, attempts: int, sufficient: int,
               skip_len: int, seed_attempts: int = 0,
               pa_budget: int = 0) -> None:
    lib = native._load()
    lib.lz4r_set_opt_params.argtypes = [ctypes.c_int] * 6
    lib.lz4r_set_opt_params.restype = None
    lib.lz4r_set_opt_params(level, attempts, sufficient, skip_len,
                            seed_attempts or attempts, pa_budget)


def compress(data: bytes, level: int) -> bytes:
    # direct ctypes call: native.compress prefers the C-extension module,
    # which links its OWN copy of lz4r.cpp — the setter above would not
    # reach it
    lib = native._load()
    cap = lib.lz4r_compress_bound(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = lib.lz4r_compress(
        ctypes.cast(data, ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), cap, level,
        None, 0)
    assert n > 0
    return dst.raw[:n]


def small_corpora() -> list[tuple[str, bytes]]:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from conftest import make_compressible, make_incompressible

    return [
        ("text64k", make_compressible(65536, seed=90)),
        ("mixed", make_compressible(30000, seed=92)
         + make_incompressible(8000, seed=93) + b"Z" * 12000),
        ("zeros", b"\x00" * 50000),
        ("period5", (make_incompressible(5, seed=91) * 10000)[:50000]),
        ("random", make_incompressible(32768, seed=5)),
        ("enwik.5m", corpus_mod.enwik_like(1 << 19)),
        ("silesia.5m", corpus_mod.silesia_like(1 << 19)),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, required=True)
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--configs", default="",
                    help="semicolon list of attempts,sufficient,skip "
                         "(default: a per-level ladder)")
    args = ap.parse_args()
    lv = args.level
    size = int(args.mb * (1 << 20))

    if not upstream.available():
        sys.exit(f"upstream unavailable: {upstream.unavailable_reason()}")

    if args.configs:
        configs = [tuple(int(x) for x in c.split(","))
                   for c in args.configs.split(";")]
    else:
        ladders = {
            9: [(256, 192, 256), (128, 128, 256), (96, 96, 256),
                (64, 64, 256), (48, 64, 256), (32, 64, 256)],
            10: [(512, 192, 256), (256, 192, 256), (128, 128, 256),
                 (96, 96, 256), (64, 96, 256)],
            11: [(65536, 768, 256), (8192, 768, 256), (2048, 512, 256),
                 (1024, 256, 256), (512, 256, 256), (256, 192, 256)],
            12: [(65536, 4095, 4095), (32768, 4095, 4095),
                 (16384, 4095, 4095), (8192, 4095, 4095),
                 (4096, 2048, 4095), (2048, 1024, 4095)],
        }
        configs = ladders[lv]

    small = small_corpora()
    big = {
        "enwik4m": corpus_mod.enwik_like(size),
        "silesia4m": corpus_mod.silesia_like(size),
        "boiler4m": boiler(size),
        "runs4m": runs(size),
    }
    up_small = {n: len(upstream.compress(d, lv)) for n, d in small}
    up_big = {n: len(upstream.compress(d, lv)) for n, d in big.items()}

    names = [n for n, _ in small] + list(big)
    print(f"level {lv}; delta = upstream - ours (NEGATIVE = contract "
          f"violation)")
    hdr = (f"{'att':>6s} {'suf':>5s} {'skip':>5s} {'sat':>6s} {'MB/s':>7s}  "
           + "  ".join(f"{n[:9]:>9s}" for n in names))
    print(hdr)
    for cfg in configs:
        att, suf, skip = cfg[:3]
        sat = cfg[3] if len(cfg) > 3 else att
        pab = cfg[4] if len(cfg) > 4 else 0
        set_params(lv, att, suf, skip, sat, pab)
        deltas = []
        for n, d in small:
            deltas.append(up_small[n] - len(compress(d, lv)))
        speed_num = speed_den = 0.0
        for n, d in big.items():
            csz = len(compress(d, lv))  # warm
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                compress(d, lv)
                best = min(best, time.perf_counter() - t0)
            speed_num += len(d)
            speed_den += best
            deltas.append(up_big[n] - csz)
        mbs = speed_num / speed_den / 1e6
        row = (f"{att:6d} {suf:5d} {skip:5d} {sat:6d} {mbs:7.2f}  "
               + "  ".join(f"{d:+9d}" for d in deltas))
        bad = any(d < 0 for d in deltas)
        print(row + ("   <-- VIOLATES" if bad else ""), flush=True)


if __name__ == "__main__":
    main()
