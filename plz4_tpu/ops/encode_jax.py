"""LZ4 block encode as a fully parallel JAX computation (greedy, level-1
class).

TPU-native reformulation of the serial hash-table scan loop (reference
analog: LZ4_compress_fast hot loop, clz4/lz4.c:930) into vector stages:

  1. *Match finding*: 4-byte hashes at every position; the most recent
     previous occurrence of each hash is found with one stable argsort
     (positions with equal hash become adjacent; the predecessor in sort
     order is the candidate — the vector analog of the reference's rolling
     hash table). Candidates are verified and extended with a bounded
     word-at-a-time compare loop. Separately, *periodic runs* (offsets
     1..8, 16, 32 — the RLE/struct patterns where greedy matching shines)
     get exact unbounded lengths via next-mismatch reverse scans.
  2. *Greedy parse*: the parse is the orbit of position 0 under the jump
     map f(p) = first matchable position g >= p, advanced by its match
     length (literal runs are collapsed into a single reverse-cummin
     "next good position" lookup). The orbit is materialized with the
     same pointer-doubling path expansion used by the decoder — no scan.
  3. *Emission*: per-sequence byte costs (token + length extensions +
     literals + offset) are computed vectorized; an exclusive cumsum lays
     out the output; every output byte classifies itself into
     token/extension/literal/offset fields and gathers its value.

The encoder emits valid LZ4 that the reference CLI can decode; the
incompressible case (compressed >= input) surfaces as a flag so the frame
layer stores the block raw (reference: blk/blk.go:75-92).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
U32 = jnp.uint32

HASH_PRIME = np.uint32(2654435761)
HASH_LOG = 16
MAX_DISTANCE = 65535
PERIODS = (1, 2, 3, 4, 5, 6, 7, 8, 16, 32)
WORD_STEPS = 16  # bounded extension: up to 4 + 16*4 + 3 = 71 bytes via words


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(2, n))))


def _take(arr, idx):
    return jnp.take(arr, jnp.clip(idx, 0, arr.shape[0] - 1))


def _orbit_of_zero(f: jnp.ndarray, s_max: int) -> jnp.ndarray:
    levels = int(math.log2(s_max))
    J = f
    P = jnp.zeros((1,), dtype=I32)
    for _ in range(levels):
        P = jnp.concatenate([P, jnp.take(J, P)])
        J = jnp.take(J, J)
    return P


def _find_matches(b: jnp.ndarray, n: jnp.ndarray):
    """Per-position best match (length, offset). b: (N,) int32 bytes."""
    N = b.shape[0]
    idx = jnp.arange(N, dtype=I32)

    u32 = (b
           | (_take(b, idx + 1) << 8)
           | (_take(b, idx + 2) << 16)
           | (_take(b, idx + 3) << 24)).astype(U32)
    h = ((u32 * HASH_PRIME) >> np.uint32(32 - HASH_LOG)).astype(I32)

    # most recent previous position with the same hash: stable argsort
    # groups equal hashes with ascending positions (vector hash "table")
    order = jnp.argsort(h, stable=True).astype(I32)
    h_sorted = jnp.take(h, order)
    prev_in_sort = jnp.concatenate(
        [jnp.array([-1], dtype=I32), order[:-1]])
    same_h = jnp.concatenate(
        [jnp.array([False]), h_sorted[1:] == h_sorted[:-1]])
    cand_sorted = jnp.where(same_h, prev_in_sort, -1)
    cand = jnp.zeros((N,), dtype=I32).at[order].set(cand_sorted)

    dist = idx - cand
    good0 = (cand >= 0) & (dist <= MAX_DISTANCE) & (
        jnp.take(u32, jnp.clip(cand, 0, N - 1)) == u32)

    mlimit = n - 5  # matches may not cover the last 5 bytes
    # verified 4-byte match requires the full word before mlimit
    good0 = good0 & (idx + 4 <= mlimit)

    def word_step(_, carry):
        ml, active = carry
        room = idx + ml + 4 <= mlimit
        eq = _take(u32, idx + ml) == _take(u32, cand + ml)
        adv = active & room & eq
        return ml + jnp.where(adv, 4, 0), active & room & eq

    def byte_step(_, carry):
        ml, active = carry
        room = idx + ml < mlimit
        eq = _take(b, idx + ml) == _take(b, cand + ml)
        adv = active & room & eq
        return ml + jnp.where(adv, 1, 0), active & room & eq

    ml = jnp.where(good0, 4, 0)
    ml, _ = jax.lax.fori_loop(0, WORD_STEPS, word_step, (ml, good0))
    ml, _ = jax.lax.fori_loop(0, 3, byte_step, (ml, good0))
    off = jnp.where(good0, dist, 0)

    # periodic runs: exact unbounded lengths for small offsets (vmapped
    # next-mismatch reverse scans over all periods at once)
    periods = np.array([d for d in PERIODS if d < N], dtype=np.int32)
    if periods.size:
        def period_run(d):
            e = jnp.take(b, idx - d, mode="fill", fill_value=-1) == b
            not_e_idx = jnp.where(~e, idx, N)
            nf = jax.lax.cummin(not_e_idx, reverse=True)  # next mismatch >= i
            run = jnp.clip(nf - idx, 0, jnp.maximum(mlimit - idx, 0))
            return jnp.where((idx >= d) & (run >= 4), run, 0)

        runs = jax.vmap(period_run)(jnp.asarray(periods))  # (P, N)
        best_p = jnp.argmax(runs, axis=0)
        best_run = jnp.take_along_axis(runs, best_p[None, :], axis=0)[0]
        better = best_run > ml
        ml = jnp.where(better, best_run, ml)
        off = jnp.where(better, jnp.asarray(periods)[best_p], off)

    good = (ml >= 4) & (idx <= n - 12) & (idx < n)
    ml = jnp.where(good, ml, 0)
    return ml, off, good


@functools.partial(jax.jit, static_argnames=())
def _encode_impl(data: jnp.ndarray, n: jnp.ndarray):
    N = data.shape[0]
    CAP = N + N // 255 + 16
    b = data.astype(I32)
    idx = jnp.arange(N, dtype=I32)

    ml, off, good = _find_matches(b, n)

    # greedy parse: jump map over [0, N] with fixpoint at n (clamped to N)
    good_idx = jnp.where(good, idx, N)
    nxt = jax.lax.cummin(good_idx, reverse=True)  # first matchable >= i
    nxt_ext = jnp.concatenate([nxt, jnp.array([N], dtype=I32)])
    ml_at_nxt = _take(ml, nxt)
    f_body = jnp.where(nxt < n, nxt + ml_at_nxt, n)
    f = jnp.concatenate([f_body, jnp.array([0], dtype=I32)])
    f = jnp.clip(f, 0, N)
    f = f.at[N].set(jnp.clip(n, 0, N))
    # ensure fixpoint at the terminal position n
    f = jnp.where(jnp.arange(N + 1) == n, n, f)

    s_max = 1 << _ceil_log2(N // 4 + 2)
    P = _orbit_of_zero(f, s_max)
    valid = (P < n).astype(I32)

    g = _take(nxt_ext, P)            # match position for this sequence
    is_final = g >= n
    lit = (jnp.where(is_final, n, g) - P) * valid
    m = jnp.where(is_final, 0, _take(ml, g)) * valid
    o = _take(off, g)

    # per-sequence byte cost
    litext = jnp.where(lit < 15, 0, 1 + (lit - 15) // 255)
    mv = jnp.maximum(m - 4, 0)
    mext = jnp.where(m == 0, 0, jnp.where(mv < 15, 0, 1 + (mv - 15) // 255))
    cost = (1 + litext + lit + jnp.where(m > 0, 2 + mext, 0)) * valid

    cs = jnp.cumsum(cost)
    out_off = cs - cost
    total = cs[-1]
    # empty input still emits one 0x00 token
    total = jnp.where(n == 0, 1, total)

    # ---- vectorized serialization over the output domain ----------------
    pos = jnp.arange(CAP, dtype=I32)
    starts = jnp.zeros((CAP,), dtype=I32).at[out_off].add(valid, mode="drop")
    seg = jnp.clip(jnp.cumsum(starts) - 1, 0, s_max - 1)

    t = pos - jnp.take(out_off, seg)
    l_s = jnp.take(lit, seg)
    le_s = jnp.take(litext, seg)
    m_s = jnp.take(m, seg)
    mv_s = jnp.take(mv, seg)
    me_s = jnp.take(mext, seg)
    o_s = jnp.take(o, seg)
    p_s = jnp.take(P, seg)

    a1 = 1 + le_s          # end of literal-extension field
    a2 = a1 + l_s          # end of literals
    a3 = a2 + 2            # end of offset

    token = (jnp.minimum(l_s, 15) << 4) | jnp.where(
        m_s > 0, jnp.minimum(mv_s, 15), 0)
    lq = (l_s - 15) // 255
    lr = (l_s - 15) % 255
    lit_ext_byte = jnp.where(t - 1 < lq, 255, lr)
    lit_byte = _take(b, p_s + (t - a1))
    off_byte = jnp.where(t == a2, o_s & 255, o_s >> 8)
    mq = (mv_s - 15) // 255
    mr = (mv_s - 15) % 255
    m_ext_byte = jnp.where(t - a3 < mq, 255, mr)

    val = jnp.where(
        t == 0, token,
        jnp.where(t < a1, lit_ext_byte,
                  jnp.where(t < a2, lit_byte,
                            jnp.where(t < a3, off_byte, m_ext_byte))))
    val = jnp.where(pos < total, val, 0)
    val = jnp.where((n == 0) & (pos == 0), 0, val)
    out = val.astype(jnp.uint8)

    compressible = total < n
    return out, total, compressible


def encode_block(data: jnp.ndarray, n: jnp.ndarray):
    """Encode one LZ4 block on device.

    data: (N,) uint8 zero-padded; n: scalar int32 true size.
    Returns (out (N + N//255 + 16,) uint8, total int32, compressible bool).
    When not compressible, the caller stores the block raw with the
    uncompressed bit (frame layer responsibility).
    """
    return _encode_impl(data, jnp.asarray(n, dtype=I32))


@jax.jit
def encode_batch(data: jnp.ndarray, lens: jnp.ndarray):
    """Encode a batch: data (B, N) uint8, lens (B,) int32."""
    return jax.vmap(_encode_impl)(data, lens)


def encode_block_host(data: bytes) -> bytes | None:
    """Host convenience wrapper; None when incompressible (store raw).

    Shapes bucket to powers of two to bound recompilation.
    """
    N = 1 << _ceil_log2(max(16, len(data)))
    buf = np.zeros(N, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    out, total, compressible = encode_block(jnp.asarray(buf), len(data))
    if len(data) > 0 and not bool(compressible):
        return None
    return np.asarray(out)[: int(total)].tobytes()
