"""LZ4 block encode as a fully parallel JAX computation.

TPU-native reformulation of the serial hash-table scan loop (reference
analog: LZ4_compress_fast, clz4/lz4.c:930 and LZ4HC_compress_generic,
clz4/lz4hc.c:1374) into vector stages:

  1. *Match finding*: 4-byte hashes at every position; the K most recent
     previous occurrences of each hash are found with one stable argsort
     (positions with equal hash become adjacent; the K predecessors in sort
     order are the candidates — the vector analog of the reference's hash
     table (K=1, level 1) and hash-chain (K>1, HC levels)). Candidates get
     a short probing extension, the winner a full word-at-a-time
     extension. Separately, *periodic runs* (offsets 1..8, 16, 32 — the
     RLE/struct patterns) get exact unbounded lengths via next-mismatch
     reverse scans.
  2. *Greedy parse*: the parse is the orbit of the block start under the
     jump map f(p) = first matchable position g >= p advanced by its match
     length (literal runs collapse into a reverse-cummin "next good
     position" lookup). The orbit is materialized with pointer-doubling
     path expansion — no scan.
  3. *Emission*: per-sequence byte costs are computed vectorized; an
     exclusive cumsum lays out the output; every output byte classifies
     itself into token/extension/literal/offset fields and gathers its
     value.

Dictionary/linked support: the window is a prefix domain — the input is
[pad | dict | block] and matches may start only inside the block but may
reference the dict (the reference's LZ4_compress_fast_continue semantics,
clz4/clz4.go:224-248). Linked-block encode thus stays fully parallel
across blocks with per-block window tails, mirroring the reference's
pre-dispatch dict snapshots (async/writer.go:412-437).

The encoder emits valid LZ4 streams; incompressible blocks surface as a
flag so the frame layer stores them raw (reference: blk/blk.go:75-92).
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
PROBE_STEPS = 4    # short probing extension per candidate (up to 20 bytes)
WORD_STEPS = 16    # full extension for the winning candidate
MAX_DICT = 65536


from ._array_util import ceil_log2 as _ceil_log2, take as _take


def _orbit(f: jnp.ndarray, start: int, s_max: int) -> jnp.ndarray:
    """Materialize the orbit of `start` under strictly-increasing f by
    pointer-doubling path expansion. f: (M+1,) with fixpoint at the end."""
    levels = int(math.log2(s_max))
    J = f
    P = jnp.full((1,), start, dtype=I32)
    for _ in range(levels):
        P = jnp.concatenate([P, jnp.take(J, P)])
        J = jnp.take(J, J)
    return P


def candidates_for_level(level: int) -> int:
    """Sort-neighborhood candidate count — the hash-chain depth analog
    (reference: lz4hc nbSearches by level, lz4hc.h:47-50)."""
    if level <= 2:
        return 1
    if level <= 5:
        return 2
    if level <= 8:
        return 4
    return 8


def _find_matches(b: jnp.ndarray, abs_end: jnp.ndarray, first: jnp.ndarray,
                  n_cand: int):
    """Per-position best match over the extended domain [pad|dict|block].

    b: (M,) int32 bytes; abs_end: scalar end of real data; first: scalar
    first valid byte (M_pad_start = D - dlen). Match starts are restricted
    by the caller; sources must be >= first.
    Returns (ml, off) per position.
    """
    M = b.shape[0]
    idx = jnp.arange(M, dtype=I32)

    u32 = (b
           | (_take(b, idx + 1) << 8)
           | (_take(b, idx + 2) << 16)
           | (_take(b, idx + 3) << 24)).astype(U32)
    h = ((u32 * HASH_PRIME) >> np.uint32(32 - HASH_LOG)).astype(I32)

    order = jnp.argsort(h, stable=True).astype(I32)
    h_sorted = jnp.take(h, order)
    inv = jnp.zeros((M,), dtype=I32).at[order].set(idx)

    mlimit = abs_end - 5

    def probe(cand):
        """Short extension: verified 4 + up to PROBE_STEPS words."""
        good = ((cand >= first) & (cand < idx)
                & (idx - cand <= MAX_DISTANCE)
                & (_take(u32, cand) == u32)
                & (idx + 4 <= mlimit))
        ml = jnp.where(good, 4, 0)

        def step(_, carry):
            ml, active = carry
            room = idx + ml + 4 <= mlimit
            eq = _take(u32, idx + ml) == _take(u32, cand + ml)
            adv = active & room & eq
            return ml + jnp.where(adv, 4, 0), active & room & eq

        ml, _ = jax.lax.fori_loop(0, PROBE_STEPS, step, (ml, good))
        return ml

    # K nearest previous same-hash positions via the sort neighborhood
    best_ml = jnp.zeros((M,), dtype=I32)
    best_cand = jnp.full((M,), -1, dtype=I32)
    r = inv
    for k in range(1, n_cand + 1):
        prev_ok = (r - k >= 0) & (_take(h_sorted, r - k) == h)
        cand = jnp.where(prev_ok, _take(order, r - k), -1)
        ml_k = probe(cand)
        better = ml_k > best_ml
        best_ml = jnp.where(better, ml_k, best_ml)
        best_cand = jnp.where(better, cand, best_cand)

    # full extension for the winner
    cand = best_cand
    active0 = best_ml > 0

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

    ml, _ = jax.lax.fori_loop(0, WORD_STEPS, word_step, (best_ml, active0))
    ml, _ = jax.lax.fori_loop(0, 3, byte_step, (ml, active0))
    off = jnp.where(active0, idx - cand, 0)

    # periodic runs: exact unbounded lengths for small offsets
    periods = np.array([d for d in PERIODS if d < M], dtype=np.int32)
    if periods.size:
        def period_run(d):
            e = jnp.take(b, idx - d, mode="fill", fill_value=-1) == b
            not_e_idx = jnp.where(~e, idx, M)
            nf = jax.lax.cummin(not_e_idx, reverse=True)
            run = jnp.clip(nf - idx, 0, jnp.maximum(mlimit - idx, 0))
            return jnp.where((idx - d >= first) & (run >= 4), run, 0)

        runs = jax.vmap(period_run)(jnp.asarray(periods))  # (P, M)
        best_p = jnp.argmax(runs, axis=0)
        best_run = jnp.take_along_axis(runs, best_p[None, :], axis=0)[0]
        better = best_run > ml
        ml = jnp.where(better, best_run, ml)
        off = jnp.where(better, jnp.asarray(periods)[best_p], off)

    return ml, off


@functools.partial(jax.jit, static_argnames=("dict_cap", "n_cand"))
def _encode_impl(data: jnp.ndarray, n: jnp.ndarray,
                 dict_: jnp.ndarray | None = None,
                 dlen: jnp.ndarray | None = None,
                 dict_cap: int = 0, n_cand: int = 1):
    """data: (N,) uint8; n: true length. dict_: (dict_cap,) uint8 window,
    right-aligned (dict_[dict_cap-dlen:] are the usable bytes)."""
    N = data.shape[0]
    D = dict_cap
    M = D + N
    CAP = N + N // 255 + 16

    if D > 0:
        ext = jnp.concatenate([dict_, data]).astype(I32)
        first = (D - dlen).astype(I32)
    else:
        ext = data.astype(I32)
        first = jnp.int32(0)

    idx = jnp.arange(M, dtype=I32)
    abs_end = D + n  # end of real data in ext coords

    ml, off = _find_matches(ext, abs_end, first, n_cand)

    # match starts live inside the block only, with the spec end conditions
    good = (ml >= 4) & (idx >= D) & (idx <= abs_end - 12) & (idx < abs_end)
    ml = jnp.where(good, ml, 0)

    # greedy parse over [D, M] with fixpoint at abs_end (clamped to M)
    good_idx = jnp.where(good, idx, M)
    nxt = jax.lax.cummin(good_idx, reverse=True)
    nxt_ext = jnp.concatenate([nxt, jnp.array([M], dtype=I32)])
    ml_at_nxt = _take(ml, nxt)
    f_body = jnp.where(nxt < abs_end, nxt + ml_at_nxt, abs_end)
    f = jnp.concatenate([f_body, jnp.array([0], dtype=I32)])
    f = jnp.clip(f, 0, M)
    f = f.at[M].set(jnp.clip(abs_end, 0, M))
    f = jnp.where(jnp.arange(M + 1) == abs_end, abs_end, f)

    s_max = 1 << _ceil_log2(N // 4 + 2)
    P = _orbit(f, D, s_max)
    valid = (P < abs_end).astype(I32)

    g = _take(nxt_ext, P)
    is_final = g >= abs_end
    lit = (jnp.where(is_final, abs_end, g) - P) * valid
    m = jnp.where(is_final, 0, _take(ml, g)) * valid
    o = _take(off, g)

    litext = jnp.where(lit < 15, 0, 1 + (lit - 15) // 255)
    mv = jnp.maximum(m - 4, 0)
    mext = jnp.where(m == 0, 0, jnp.where(mv < 15, 0, 1 + (mv - 15) // 255))
    cost = (1 + litext + lit + jnp.where(m > 0, 2 + mext, 0)) * valid

    cs = jnp.cumsum(cost)
    out_off = cs - cost
    total = cs[-1]
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
    o_s = jnp.take(o, seg)
    p_s = jnp.take(P, seg)

    a1 = 1 + le_s
    a2 = a1 + l_s
    a3 = a2 + 2

    token = (jnp.minimum(l_s, 15) << 4) | jnp.where(
        m_s > 0, jnp.minimum(mv_s, 15), 0)
    lq = (l_s - 15) // 255
    lr = (l_s - 15) % 255
    lit_ext_byte = jnp.where(t - 1 < lq, 255, lr)
    lit_byte = _take(ext, p_s + (t - a1))
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


def encode_block(data: jnp.ndarray, n, dict_: jnp.ndarray | None = None,
                 dlen=None, dict_cap: int = 0, level: int = 1):
    """Encode one LZ4 block on device.

    Returns (out (N + N//255 + 16,) uint8, total int32, compressible bool).
    """
    return _encode_impl(
        data, jnp.asarray(n, dtype=I32), dict_,
        None if dlen is None else jnp.asarray(dlen, dtype=I32),
        dict_cap=dict_cap, n_cand=candidates_for_level(level))


@functools.partial(jax.jit, static_argnames=("n_cand",))
def _encode_batch_impl(data, lens, n_cand):
    fn = functools.partial(_encode_impl, n_cand=n_cand)
    return jax.vmap(fn)(data, lens)


@functools.partial(jax.jit, static_argnames=("dict_cap", "n_cand"))
def _encode_batch_dict_impl(data, lens, dicts, dlens, dict_cap, n_cand):
    fn = functools.partial(_encode_impl, dict_cap=dict_cap, n_cand=n_cand)
    return jax.vmap(fn)(data, lens, dicts, dlens)


def encode_batch(data: jnp.ndarray, lens: jnp.ndarray, level: int = 1):
    """Encode a batch of independent blocks: data (B, N), lens (B,)."""
    return _encode_batch_impl(data, lens, candidates_for_level(level))


def encode_batch_dict(data, lens, dicts, dlens, level: int = 1):
    """Encode a batch with per-block windows: dicts (B, D) right-aligned,
    dlens (B,). This is the linked-block / dictionary device path."""
    return _encode_batch_dict_impl(
        data, lens, dicts, dlens, dicts.shape[1],
        candidates_for_level(level))


def encode_block_host(data: bytes, level: int = 1,
                      dict_: bytes | None = None) -> bytes | None:
    """Host convenience wrapper; None when incompressible (store raw)."""
    N = 1 << _ceil_log2(max(16, len(data)))
    buf = np.zeros(N, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    if dict_:
        dict_ = dict_[-MAX_DICT:]
        D = 1 << _ceil_log2(max(16, len(dict_)))
        dbuf = np.zeros(D, dtype=np.uint8)
        dbuf[D - len(dict_):] = np.frombuffer(dict_, dtype=np.uint8)
        out, total, compressible = encode_block(
            jnp.asarray(buf), len(data), jnp.asarray(dbuf), len(dict_),
            dict_cap=D, level=level)
    else:
        out, total, compressible = encode_block(
            jnp.asarray(buf), len(data), level=level)
    if len(data) > 0 and not bool(compressible):
        return None
    return np.asarray(out)[: int(total)].tobytes()
