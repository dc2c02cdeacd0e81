"""VERDICT r4 weak-#1 experiments: can the headline roundtrip beat the
serial enc-then-dec sum?

(a) FUSED dispatch: one k-loop body running encode(batch A) AND
    decode(batch B) — if the TPU serializes both on the single scalar
    core, per-iter time == t_enc + t_dec and the headline's harmonic
    mean is the per-chip ceiling; any gap below the sum is recoverable
    overlap (the reference overlaps compress workers with the writeLoop,
    async/writer.go:232-381 — its analog here would be pipelining
    batches through ONE dispatch).
(b) batch-size scaling 32 -> 64 -> 128 blocks per dispatch: per-step
    fixed costs (lax.map machinery, table zeroing) amortize with B if
    they matter.

Two-k differencing throughout (tools/bench_kernels.py discipline).
Run ON CHIP from /root/repo:  python tools/overlap_ab.py [--k N]
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
    k = 64
    for i, a in enumerate(sys.argv[1:]):
        if a.startswith("--k"):
            k = int(a.split("=")[1]) if "=" in a else int(sys.argv[i + 2])

    plz4_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from plz4_tpu.ops import decode_pallas, encode_pallas

    print("backend:", jax.default_backend(), flush=True)
    BLOCK = benchmod.BLOCK
    corpus = benchmod.load_corpus()

    def batch(nblocks, off=0):
        blocks = [b for b in benchmod.chunk_blocks(corpus)
                  if len(b) == BLOCK][off:off + nblocks]
        assert len(blocks) == nblocks
        d = np.stack([np.frombuffer(b, dtype=np.uint8) for b in blocks])
        l = np.full((nblocks,), BLOCK, dtype=np.int32)
        return (jax.device_put(jnp.asarray(d)),
                jax.device_put(jnp.asarray(l)))

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def two_k(kfn, kk):
        klo = max(1, kk // 4)
        if klo == kk:
            kk += 1
        int(kfn(kk))
        int(kfn(klo))
        t_hi = min(timed(lambda: int(kfn(kk))) for _ in range(3))
        t_lo = min(timed(lambda: int(kfn(klo))) for _ in range(3))
        return max(t_hi - t_lo, 1e-9) / (kk - klo)

    # ---- (b) batch scaling ------------------------------------------------
    for B in (32, 64, 128):
        data, lens = batch(B)

        @functools.partial(jax.jit, static_argnames=("k",))
        def enc_k(k, data=data, lens=lens):
            def body(i, acc):
                d2 = data ^ (i % 7).astype(jnp.uint8)
                _, totals, _ = encode_pallas.encode_batch_pallas(d2, lens)
                return acc + jnp.sum(totals)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        per = two_k(enc_k, max(8, k * 32 // B))
        print(f"enc B={B}: {B * BLOCK / per / 1e6:.1f} MB/s "
              f"({per * 1e3:.2f} ms/batch)", flush=True)

    # ---- (a) fused enc+dec vs serial sum ---------------------------------
    B = benchmod.DEVICE_CHUNK
    data, lens = batch(B)
    datb, lenb = batch(B, off=B)

    @jax.jit
    def enc_once(d, l):
        return encode_pallas.encode_batch_pallas(d, l)

    c0, t0v, _ = enc_once(datb, lenb)
    c1, t1v, _ = enc_once(datb ^ np.uint8(1), lenb)

    @functools.partial(jax.jit, static_argnames=("k", "mode"))
    def k_loop(k, mode):
        def body(i, acc):
            s = jnp.int32(0)
            if mode in ("enc", "fused"):
                d2 = data ^ (i % 7).astype(jnp.uint8)
                _, totals, _ = encode_pallas.encode_batch_pallas(d2, lens)
                s = s + jnp.sum(totals)
            if mode in ("dec", "fused"):
                pick = i % 2 == 0
                c = jnp.where(pick, c0, c1)
                t = jnp.where(pick, t0v, t1v)
                _, n_out, _ = decode_pallas.decode_batch_pallas(
                    c, t, out_cap=BLOCK)
                s = s + jnp.sum(n_out)
            return (acc + s) % (1 << 20)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    t_enc = two_k(functools.partial(k_loop, mode="enc"), k)
    t_dec = two_k(functools.partial(k_loop, mode="dec"), k)
    t_fused = two_k(functools.partial(k_loop, mode="fused"), k)
    nb = B * BLOCK
    print(f"enc alone : {t_enc * 1e3:8.2f} ms/batch ({nb / t_enc / 1e6:.1f} MB/s)")
    print(f"dec alone : {t_dec * 1e3:8.2f} ms/batch ({nb / t_dec / 1e6:.1f} MB/s)")
    print(f"fused     : {t_fused * 1e3:8.2f} ms/batch vs serial sum "
          f"{(t_enc + t_dec) * 1e3:.2f} ms "
          f"-> overlap gain {(t_enc + t_dec - t_fused) / (t_enc + t_dec) * 100:.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
