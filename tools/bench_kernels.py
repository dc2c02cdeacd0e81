"""Per-kernel on-chip throughput: encode L1, mid encode, decode.

Same measurement discipline as bench.py bench_device (single-dispatch
k-loops, per-iteration data variation, hoistable-loop overhead
subtraction, scalar pulls as the only sync). Run on the real chip:

    python tools/bench_kernels.py [enc mid dec] [--k N]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import plz4_tpu

import bench as benchmod


def main():
    args = sys.argv[1:]
    which = []
    k = 32
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--k"):
            if "=" in a:
                k = int(a.split("=")[1])
            else:
                i += 1
                k = int(args[i])
        else:
            which.append(a)
        i += 1
    which = which or ["enc", "mid", "dec"]

    plz4_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from plz4_tpu.ops import decode_pallas, encode_pallas

    print("backend:", jax.default_backend())
    BLOCK = benchmod.BLOCK
    B = benchmod.DEVICE_CHUNK
    blocks = [b for b in benchmod.chunk_blocks(benchmod.load_corpus())
              if len(b) == BLOCK][:B]
    data_np = np.stack([np.frombuffer(b, dtype=np.uint8) for b in blocks])
    lens_np = np.full((len(blocks),), BLOCK, dtype=np.int32)
    data = jax.device_put(jnp.asarray(data_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    nbytes = data_np.size

    def enc_fn(d, l):
        return encode_pallas.encode_batch_pallas(d, l)

    def mid_fn(d, l):
        f = encode_pallas.encode_block_pallas_mid
        return jax.lax.map(lambda args: f(*args), (d, l))

    def dec_fn(c, t):
        return decode_pallas.decode_batch_pallas(c, t, out_cap=BLOCK)

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        return r, time.perf_counter() - t0

    def measure(label, kfn, kk):
        # two-k differencing: time the SAME varying loop at k and k/4 and
        # divide the delta by the iteration delta — robust whether or not
        # XLA hoists a loop-invariant body (it stopped hoisting pallas
        # bodies, which silently zeroed the old subtract-hoistable-loop
        # scheme), and cancels the tunnel's fixed dispatch latency.
        klo = max(1, kk // 4)
        if klo == kk:
            kk += 1
        int(kfn(True, kk))
        int(kfn(True, klo))
        t_hi = min(timed(lambda: int(kfn(True, kk)))[1] for _ in range(3))
        t_lo = min(timed(lambda: int(kfn(True, klo)))[1] for _ in range(3))
        per = max(t_hi - t_lo, 1e-9) / (kk - klo)
        print(f"{label}: {nbytes / per / 1e6:.1f} MB/s "
              f"({per * 1e3:.2f} ms/batch, lo {t_lo:.2f}s hi {t_hi:.2f}s, "
              f"k={kk})")

    todo = [(label, f) for label, key, f in
            (("enc-L1", "enc", enc_fn), ("enc-mid", "mid", mid_fn))
            if key in which]
    for label, f in todo:
        @functools.partial(jax.jit, static_argnames=("vary", "k"))
        def enc_k(vary, k, _f=f):
            def body(i, acc):
                d2 = data ^ (i % 7).astype(jnp.uint8) if vary else data
                _, totals, _ = _f(d2, lens)
                return acc + jnp.sum(totals)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        measure(label, enc_k, k if label == "enc-L1" else max(4, k // 2))

    if "dec" in which:
        @jax.jit
        def enc_once(d, l):
            return enc_fn(d, l)

        data1 = data ^ np.uint8(1)
        c0, t0v, _ = enc_once(data, lens)
        c1, t1v, _ = enc_once(data1, lens)

        @functools.partial(jax.jit, static_argnames=("vary", "k"))
        def dec_k(vary, k):
            def body(i, carry):
                acc, bad = carry
                pick = (i % 2 == 0) if vary else True
                c = jnp.where(pick, c0, c1)
                t = jnp.where(pick, t0v, t1v)
                d = jnp.where(pick, data, data1)
                c = c.at[:, -1].set((i & 255).astype(jnp.uint8))
                dec, n_out, ok = dec_fn(c, t)
                good = jnp.all(ok & (n_out == lens)
                               & jnp.all(dec == d, axis=-1))
                return acc + jnp.sum(n_out), bad | ~good
            acc, bad = jax.lax.fori_loop(0, k, body,
                                         (jnp.int32(0), jnp.bool_(False)))
            # bounded accumulator + sign sentinel: a raw sum collides with
            # the sentinel at k>=512 and overflows int32 at k>=1024
            return jnp.where(bad, jnp.int32(-1), acc % (1 << 20))

        def run(vary, kk):
            r = int(dec_k(vary, kk))
            assert r >= 0, "round-trip mismatch"
            return r

        measure("dec", run, k)


if __name__ == "__main__":
    main()
