"""Long-running differential fuzz campaign (wall-clock budgeted).

Complements the committed suites with BULK: random payload structures x
sizes x levels x engine options, each iteration cross-checked against
the upstream oracle (decode bit-exact both directions) and the frame
engine. Intended for soak runs between milestones:

    python tools/fuzz_campaign.py --seconds 1800 [--seed-base N]

Prints one summary line per 200 iterations and a final JSON summary;
exits non-zero on the first failure with a full repro tuple.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import plz4_tpu as plz4  # noqa: E402
from plz4_tpu import native  # noqa: E402
from plz4_tpu.native import upstream  # noqa: E402
from test_property_fuzz import _gen  # noqa: E402


def _gen_safe(rng, size: int) -> bytes:
    # _gen's tile/concat structures assume a few bytes of room
    if size < 8:
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    return _gen(rng, size)


def one_case(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    size = int(rng.integers(1, 1 << int(rng.integers(4, 20))))
    data = _gen_safe(rng, size)
    level = int(rng.integers(1, 13))

    # raw block: roundtrip + upstream cross-decode both directions
    comp = native.compress(data, level=level)
    assert native.decompress(comp, len(data)) == data, "self-decode"
    assert upstream.decompress(comp, len(data)) == data, "upstream-decode"
    up = upstream.compress(data, level)
    assert native.decompress(up, len(data)) == data, "decode-upstream"

    # frame engine with random options
    opts = dict(
        level=level,
        parallel=int(rng.integers(-1, 3)),
        block_linked=bool(rng.integers(2)),
        block_checksum=bool(rng.integers(2)),
        content_checksum=bool(rng.integers(2)),
        block_size_idx=4 + int(rng.integers(4)),
    )
    if rng.integers(4) == 0 and size >= 16:
        opts["dictionary"] = data[: min(len(data), 4096)]
    frame = plz4.compress(data, **opts)
    rd = {k: opts[k] for k in ("dictionary",) if k in opts}
    assert plz4.decompress(frame, **rd) == data, ("frame", opts)

    # streaming writer path with chunked writes (every 8th case)
    if seed % 8 == 0:
        buf = io.BytesIO()
        w = plz4.Writer(buf, **opts)
        step = max(1, len(data) // int(rng.integers(1, 9)))
        for i in range(0, len(data), step):
            w.write(data[i: i + step])
        w.close()
        r = plz4.Reader(io.BytesIO(buf.getvalue()), **rd)
        assert r.read() == data, ("stream", opts)

    return {"size": size, "level": level,
            "ours": len(comp), "upstream": len(up)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=600)
    ap.add_argument("--seed-base", type=int, default=1_000_000)
    args = ap.parse_args()
    t0 = time.time()
    n = 0
    losses = 0
    worst = (0, 0.0, None)  # bytes, frac, seed
    while time.time() - t0 < args.seconds:
        seed = args.seed_base + n
        try:
            r = one_case(seed)
        except AssertionError as e:
            print(json.dumps({"FAIL": str(e), "seed": seed}), flush=True)
            return 1
        d = r["ours"] - r["upstream"]
        if d > 0:
            losses += 1
            frac = d / r["upstream"]
            if d > worst[0]:
                worst = (d, frac, seed)
        n += 1
        if n % 200 == 0:
            print(f"# {n} cases, {time.time() - t0:.0f}s, "
                  f"{losses} size-losses, worst {worst[0]} B", flush=True)
    print(json.dumps({
        "cases": n, "seconds": round(time.time() - t0, 1),
        "size_losses": losses, "loss_rate": round(losses / max(1, n), 4),
        "worst_loss_bytes": worst[0],
        "worst_loss_frac": round(worst[1], 5), "worst_seed": worst[2],
    }), flush=True)
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.exit(main())
