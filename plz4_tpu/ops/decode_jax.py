"""LZ4 block decode as a fully parallel JAX computation.

TPU-native reformulation of the serial token-parse/copy loop (reference
analog: LZ4_decompress_safe hot loop, clz4/lz4.c:2016) into four
vector/scan/gather stages with **no sequential dependence on sequence
count or match chains**:

  1. *Speculative per-byte parse*: every compressed byte position is decoded
     as if it were a sequence token — literal-length nibble + 255-run
     extension (run lengths via a reverse cumulative-min "next non-255"
     scan), match-length nibble + extension — yielding, for every position
     ``p``, the start of the *next* sequence ``f[p]``. All vector ops.
  2. *Path doubling*: the true sequence starts are the orbit of 0 under
     ``f``. Jump tables ``J_k = f^(2^k)`` are built by pointer doubling, and
     the orbit is materialized by path expansion ``P_{k+1} = P_k ++ J_k[P_k]``
     — O(log n) gathers, no scan.
  3. *Layout*: per-sequence literal/match lengths are gathered at the
     sequence starts; output offsets come from an exclusive cumsum; a
     scatter+cumsum assigns each output byte its sequence id.
  4. *Match resolution*: each output byte points at its source (itself for
     literals, ``i - offset`` for match bytes, negative reach into the
     dictionary window). Overlapping/self-referential matches (RLE) are
     resolved by pointer doubling over the source map — ``log2(n)``
     gathers — then one final gather pulls every byte from the literal pool
     or the dictionary.

Output positions, counts and a validity flag are computed on device, so a
batch of blocks decodes with zero host round-trips (vmap over the block
axis; sharded across chips in plz4_tpu.parallel).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


from ._array_util import ceil_log2 as _ceil_log2, take as _take


def _parse_all_positions(comp: jnp.ndarray, clen: jnp.ndarray):
    """Stage 1 — decode a hypothetical sequence at EVERY byte position.

    comp: (C,) uint8 padded compressed bytes; clen: scalar true length.
    Returns per-position arrays (int32): next_seq (C,), lit_len, lit_start,
    match_len (0 for the final literals-only sequence), offset, ok bits.
    """
    C = comp.shape[0]
    idx = jnp.arange(C, dtype=I32)
    comp_i = comp.astype(I32)

    # next non-255 byte at or after p (reverse cumulative min of masked idx)
    non255_idx = jnp.where(comp_i != 255, idx, C)
    nz = jax.lax.cummin(non255_idx, reverse=True)

    tok = comp_i
    lit_nib = tok >> 4
    ml_nib = tok & 15

    # literal length (+ extension byte run)
    ext_start = idx + 1
    ext_end = _take(nz, ext_start)
    n255 = ext_end - ext_start
    ext_byte = _take(comp_i, ext_end)
    lit_len = jnp.where(lit_nib < 15, lit_nib, 15 + 255 * n255 + ext_byte)
    lit_bytes = jnp.where(lit_nib < 15, 0, n255 + 1)
    lit_start = idx + 1 + lit_bytes
    after_lit = lit_start + lit_len

    # match offset + match length (+ extension run)
    offset = _take(comp_i, after_lit) | (_take(comp_i, after_lit + 1) << 8)
    m_ext_start = after_lit + 2
    m_ext_end = _take(nz, m_ext_start)
    m_n255 = m_ext_end - m_ext_start
    m_ext_byte = _take(comp_i, m_ext_end)
    match_len = jnp.where(ml_nib < 15, ml_nib + 4,
                          4 + 15 + 255 * m_n255 + m_ext_byte)
    ml_bytes = jnp.where(ml_nib < 15, 0, m_n255 + 1)

    is_final = after_lit >= clen
    next_seq = jnp.where(is_final, C, m_ext_start + ml_bytes)
    next_seq = jnp.clip(next_seq, 0, C)
    match_len = jnp.where(is_final, 0, match_len)

    # structural validity of a sequence *if selected*
    seq_ok = jnp.where(
        is_final,
        after_lit == clen,  # final literals must land exactly on the end
        (m_ext_start + ml_bytes <= clen) & (offset >= 1),
    )
    return next_seq, lit_len, lit_start, match_len, offset, seq_ok, is_final


def _orbit_of_zero(f: jnp.ndarray, s_max: int) -> jnp.ndarray:
    """Stage 2 — materialize the orbit of 0 under strictly-increasing f.

    f: (C+1,) int32 with terminal fixpoint f[C] == C. Returns (s_max,) int32
    positions in depth order (strictly increasing until the terminal C, then
    C repeated). s_max must be a power of two >= max chain length.
    """
    levels = int(math.log2(s_max))
    J = f
    P = jnp.zeros((1,), dtype=I32)
    for _ in range(levels):
        P = jnp.concatenate([P, jnp.take(J, P)])
        J = jnp.take(J, J)
    return P


@functools.partial(jax.jit, static_argnames=("out_cap", "dict_cap"))
def decode_block(
    comp: jnp.ndarray,      # (C,) uint8, zero-padded past clen
    clen: jnp.ndarray,      # scalar int32: true compressed size
    out_cap: int,           # static: max decompressed size (block size)
    dict_: jnp.ndarray | None = None,  # (dict_cap,) uint8 window, right-aligned
    dlen: jnp.ndarray | None = None,   # scalar int32: true dict length
    dict_cap: int = 0,
):
    """Decode one LZ4 block entirely on device.

    Returns (out, n_out, ok): out is (out_cap,) uint8 zero-padded, n_out the
    true decoded size, ok a bool validity flag (False => corrupt stream,
    reference analog: ErrDecompress).

    The dictionary window, when present, must be right-aligned in a
    (dict_cap,) buffer: dict_[dict_cap - dlen:] are the usable bytes
    (matches the 64 KiB sliding-window semantics, reference:
    compress/dict.go:146-199).
    """
    C = comp.shape[0]
    N = out_cap
    D = dict_cap
    clen = clen.astype(I32)

    (next_seq, lit_len, lit_start, match_len, offset, seq_ok,
     is_final) = _parse_all_positions(comp, clen)

    # f over domain [0, C] with terminal fixpoint at C
    f = jnp.concatenate([next_seq, jnp.array([C], dtype=I32)])
    s_max = 1 << _ceil_log2(C // 3 + 2)
    P = _orbit_of_zero(f, s_max)

    valid = (P < clen).astype(I32)
    litS = _take(lit_len, P) * valid
    mlS = _take(match_len, P) * valid
    lit_startS = _take(lit_start, P)
    offS = _take(offset, P)
    okS = jnp.where(valid == 1, _take(seq_ok, P), True)
    finS = _take(is_final, P) & (valid == 1)

    # clip per-sequence sizes so corrupt garbage cannot overflow the cumsum;
    # the saturating inclusive scan caps totals at N+1, which necessarily
    # trips the n_out <= N validity check (min(a+b, S) is associative for
    # non-negative operands)
    seq_out = jnp.clip(litS + mlS, 0, N + 1)
    sat = N + 1
    cs = jax.lax.associative_scan(
        lambda a, b: jnp.minimum(a + b, sat), seq_out)
    n_out_sat = cs[-1]
    out_pos = jnp.clip(cs - seq_out, 0, N).astype(I32)
    n_out = jnp.minimum(n_out_sat, N).astype(I32)

    # overall validity: every selected sequence well-formed, exactly one
    # final literals-only sequence selected, output fits
    ok = jnp.all(okS) & (jnp.sum(finS.astype(I32)) == 1) & (n_out_sat <= N)
    # match offsets may not reach before the window start
    match_start = out_pos + litS
    ok = ok & jnp.all(
        jnp.where((valid == 1) & (mlS > 0),
                  offS <= match_start + (dlen if dlen is not None else 0),
                  True))
    # literals must come from within the compressed buffer
    ok = ok & jnp.all(
        jnp.where(valid == 1, lit_startS + litS <= clen, True))

    # ---- stage 3: per-output-byte sequence assignment -------------------
    i = jnp.arange(N, dtype=I32)
    starts = jnp.zeros((N,), dtype=I32).at[out_pos].add(valid, mode="drop")
    seg = jnp.cumsum(starts) - 1
    seg = jnp.clip(seg, 0, s_max - 1)

    in_off = i - jnp.take(out_pos, seg)
    seg_lit = jnp.take(litS, seg)
    is_lit = in_off < seg_lit
    comp_src = jnp.take(lit_startS, seg) + in_off  # valid where is_lit

    # ---- stage 4: match-chain resolution via pointer doubling -----------
    # extended domain j in [0, D+N): [0, D) = dictionary (terminal),
    # [D, D+N) = output bytes
    j = i + D
    ptr_out = jnp.where(is_lit, j, j - jnp.take(offS, seg))
    ptr_out = jnp.clip(ptr_out, 0, D + N - 1)
    if D > 0:
        ptr = jnp.concatenate([jnp.arange(D, dtype=I32), ptr_out])
    else:
        ptr = ptr_out
    ptr = jax.lax.fori_loop(
        0, _ceil_log2(D + N), lambda _, p: jnp.take(p, p), ptr)
    final = ptr[D:]

    # gather bytes: literals from comp, dict bytes from dict_
    lit_idx = _take(comp_src, jnp.maximum(final - D, 0))
    byte_from_comp = _take(comp, lit_idx)
    if D > 0:
        # dict window is right-aligned: logical dict byte k (0-based from
        # window start) lives at dict_[D - dlen + k]; extended index
        # j in [0, D) already uses the physical layout when we offset by
        # (D - dlen) at reference time. Match reach into dict was computed
        # against logical window end == position 0 of output, i.e. extended
        # index D. Physical index = j (since window is right-aligned and
        # logical end == physical end).
        byte_from_dict = _take(dict_, final)
        out_bytes = jnp.where(final < D, byte_from_dict, byte_from_comp)
    else:
        out_bytes = byte_from_comp

    out = jnp.where(i < n_out, out_bytes, 0).astype(jnp.uint8)
    return out, n_out, ok


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decode_batch(comp: jnp.ndarray, clens: jnp.ndarray, out_cap: int):
    """Decode a batch of independent blocks: comp (B, C) uint8, clens (B,).

    Returns (out (B, out_cap) uint8, n_out (B,), ok (B,)).
    """
    fn = functools.partial(decode_block, out_cap=out_cap)
    return jax.vmap(fn)(comp, clens)


def decode_block_host(comp: bytes, out_cap: int, dict_: bytes | None = None):
    """Convenience host wrapper: bytes in, bytes out (testing/oracle use).

    Shapes are bucketed to powers of two to bound recompilation.
    """
    C = 1 << _ceil_log2(max(16, len(comp) + 8))
    out_cap = 1 << _ceil_log2(max(8, out_cap))
    buf = np.zeros(C, dtype=np.uint8)
    buf[: len(comp)] = np.frombuffer(comp, dtype=np.uint8)
    if dict_:
        D = 1 << _ceil_log2(max(8, len(dict_)))
        dbuf = np.zeros(D, dtype=np.uint8)
        dbuf[D - len(dict_):] = np.frombuffer(dict_, dtype=np.uint8)
        out, n, ok = decode_block(
            jnp.asarray(buf), jnp.int32(len(comp)), out_cap,
            dict_=jnp.asarray(dbuf), dlen=jnp.int32(len(dict_)), dict_cap=D)
    else:
        out, n, ok = decode_block(jnp.asarray(buf), jnp.int32(len(comp)), out_cap)
    if not bool(ok):
        from .. import errors as zerr
        raise zerr.ErrDecompress
    return np.asarray(out)[: int(n)].tobytes()
