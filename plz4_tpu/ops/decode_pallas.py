"""LZ4 block decode as a Pallas TPU kernel — serial per-block sequence loop
over SMEM with byte-packed words.

Motivation (docs/perf_notes.md): on TPU, random gathers cost ~5-10 ns per
element, so the O(log n)-depth array-program decoder (decode_jax.py) is
gather-bound at a few MB/s per chip. The classic serial LZ4 loop (reference
analog: LZ4_decompress_generic, clz4/lz4.c:2016) instead runs on the TPU
scalar core over SMEM, where dynamic scalar loads/stores are native.
Mosaic constraints shape the design:

  * scalar stores are only legal to SMEM, and SMEM operands are capped at
    ~256 KiB — so both the compressed input and the decoded output live in
    SMEM as int32 *words* with 4 bytes packed per word (shift/mask access),
    keeping a 64 KiB block + 64 KiB output + metadata within budget;
  * packing/unpacking between uint8 arrays and packed words happens
    outside the kernel at VPU speed.

Blocks parallelize across grid steps / vmap and across chips via the mesh;
within a block the loop is serial exactly like the C hot loop — that is
the fast shape for byte-granular work on this hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def pack_words(data_u8: jnp.ndarray) -> jnp.ndarray:
    """(..., N) uint8 -> (..., N//4) int32 little-endian packed words."""
    shape = data_u8.shape
    w = data_u8.reshape(*shape[:-1], shape[-1] // 4, 4).astype(I32)
    return (w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
            | (w[..., 3] << 24))


def unpack_words(words_i32: jnp.ndarray) -> jnp.ndarray:
    """(..., W) int32 -> (..., W*4) uint8."""
    w = words_i32[..., None]
    b = jnp.concatenate(
        [w & 255, (w >> 8) & 255, (w >> 16) & 255, (w >> 24) & 255],
        axis=-1)
    return b.reshape(*words_i32.shape[:-1],
                     words_i32.shape[-1] * 4).astype(jnp.uint8)


_SRL = jax.lax.shift_right_logical


def _make_copy_helpers(ow_ref):
    """Funnel-copy helpers closed over the output ref: one SMEM load + one
    store per 4 bytes (vs 2+2 for the per-word read-modify-write scheme);
    fill_rot is the zero-load constant-pattern fill for period-1/2 matches
    (RLE hot path)."""

    def copy_funnel(ref, RefW, src, dst, n):
        """Copy n bytes from byte position `src` of `ref` to byte position
        `dst` of the output, dst-word-aligned: output full words are
        produced directly with ONE net source shift (the composition of
        the src-unalign and dst-align shifts), so the steady state is
        1 load + 4 shifts/ors + 1 store per 4 bytes. The last word may
        wild-write up to 3 bytes past dst+n (callers guarantee later
        writes overwrite the overshoot).

        Source-side bounds: reads words k0..k0+W where the last read ends
        <= src+n+7 bytes — callers guarantee 8 bytes of tail slack. For
        in-output sources (matches) the caller must guarantee
        src + 4 <= dst: then every word this funnel reads was stored on an
        earlier iteration (read index trails the write index by >= 1 word;
        at exactly src+4 the high word of the funnel is unused because the
        net shift is 0)."""
        d_idx = dst >> 2
        d_sh = (dst & 3) * 8
        # net shift: output word D holds source bytes delta + 4D + b,
        # so the in-word byte offset r is constant across words
        a = ((src - dst) & 3) * 8
        # first source word: sits one below 0 when src < dst&3. Only the
        # lo READ is clamped (its bytes all map to masked output positions
        # below dst in that case); clamping k0 itself would shift the
        # whole read window by a word and corrupt the unmasked bytes.
        k0 = (src - (dst & 3)) >> 2
        W = ((dst & 3) + n + 3) >> 2

        def sfun(lo, hi):
            # lo >>> a | hi << (32 - a); double-shifts keep the a == 0
            # case branchless (hi << 32 becomes 0, not UB)
            return _SRL(lo, a) | ((hi << 1) << (31 - a))

        w_lo = ref[jnp.maximum(k0, 0)]
        w_hi = ref[k0 + 1]
        v0 = sfun(w_lo, w_hi)
        d0 = ow_ref[d_idx]
        keep = (1 << d_sh) - 1
        ow_ref[d_idx] = (d0 & keep) | (v0 & ~keep)

        def wbody(t, carry):
            w_prev = carry
            w_nxt = ref[k0 + t + 1]
            ow_ref[d_idx + t] = sfun(w_prev, w_nxt)
            return w_nxt

        jax.lax.fori_loop(1, W, wbody, w_hi)

    def fill_rot(dst, n, v):
        """Fill n bytes at dst with the 4-byte pattern v (already aligned
        to dst): one store per word, zero loads."""
        d_idx = dst >> 2
        d_sh = (dst & 3) * 8
        rot = (v << d_sh) | _SRL(_SRL(v, 1), 31 - d_sh)
        d_lo = ow_ref[d_idx]
        ow_ref[d_idx] = (d_lo & ((1 << d_sh) - 1)) | (v << d_sh)

        def wbody(t, _):
            ow_ref[d_idx + t] = rot
            return 0

        jax.lax.fori_loop(1, ((n + 3) >> 2) + 1, wbody, 0)

    return copy_funnel, fill_rot


def _decode_kernel(cw_ref, clen_ref, ow_ref, n_out_ref, ok_ref):
    """cw_ref: (Wc,) packed compressed words (SMEM); ow_ref: (Wo,) packed
    output words (SMEM). clen in bytes."""
    Wc = cw_ref.shape[0]
    Wo = ow_ref.shape[0]
    C = Wc * 4
    N = Wo * 4
    clen = clen_ref[0]

    def rd_c(p):
        p = jnp.clip(p, 0, C - 1)
        w = cw_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def rd_o(p):
        p = jnp.clip(p, 0, N - 1)
        w = ow_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def wr_o(p, v):
        p = jnp.clip(p, 0, N - 1)
        idx = p >> 2
        sh = (p & 3) * 8
        w = ow_ref[idx]
        ow_ref[idx] = (w & (jnp.int32(-1) ^ (255 << sh))) | (v << sh)

    def rd_c_word(p):
        """Unaligned 4-byte little-endian read from the compressed stream."""
        p = jnp.clip(p, 0, C - 5)
        idx = p >> 2
        sh = (p & 3) * 8
        lo = cw_ref[idx]
        hi = cw_ref[jnp.minimum(idx + 1, Wc - 1)]
        # sh == 0 must not shift hi by 32 (UB); select instead
        return jnp.where(
            sh == 0, lo,
            ((lo >> sh) & ((1 << (32 - sh)) - 1)) | (hi << (32 - sh)))

    def rd_o_word(p):
        p = jnp.clip(p, 0, N - 5)
        idx = p >> 2
        sh = (p & 3) * 8
        lo = ow_ref[idx]
        hi = ow_ref[jnp.minimum(idx + 1, Wo - 1)]
        return jnp.where(
            sh == 0, lo,
            ((lo >> sh) & ((1 << (32 - sh)) - 1)) | (hi << (32 - sh)))

    def wr_o_word(p, v):
        """Unaligned 4-byte write (branchless two-word read-modify-write:
        for sh == 0 the masks degenerate to a plain store + no-op, so no
        branch sits on the scalar critical path)."""
        p = jnp.clip(p, 0, N - 5)
        idx = p >> 2
        idx2 = jnp.minimum(idx + 1, Wo - 1)
        sh = (p & 3) * 8
        lo_mask = (1 << sh) - 1
        lo = ow_ref[idx]
        hi = ow_ref[idx2]
        ow_ref[idx] = (lo & lo_mask) | (v << sh)
        # sh == 0: mask is 0 so the second store rewrites hi unchanged
        v_hi = jax.lax.shift_right_logical(v, 32 - sh) & lo_mask
        ow_ref[idx2] = (hi & (jnp.int32(-1) ^ lo_mask)) | v_hi

    copy_funnel, fill_rot = _make_copy_helpers(ow_ref)

    def read_varint(ip, base):
        def vcond(s):
            _, _, last = s
            return last == 255

        def vbody(s):
            total, p, _ = s
            b = rd_c(p)
            return total + b, p + 1, b

        total, p, _ = jax.lax.while_loop(vcond, vbody, (base, ip, 255))
        return total, p

    def cond(state):
        _, _, _, done = state
        return jnp.logical_not(done)

    def body(state):
        ip, op, ok, _ = state
        bad = ip >= clen
        # one unaligned word read covers token + first length-extension byte
        # (multi-extension runs fall back to the varint loop)
        hw = rd_c_word(ip)
        token = hw & 255
        ip = ip + 1

        lit_len = token >> 4
        ext0 = (hw >> 8) & 255

        def lit_ext():
            return jax.lax.cond(
                ext0 == 255,
                lambda: read_varint(ip, 15),
                lambda: (15 + ext0, ip + 1))

        lit_len, ip = jax.lax.cond(lit_len == 15, lit_ext,
                                   lambda: (lit_len, ip))
        bad = bad | (ip + lit_len > clen) | (op + lit_len > N)

        lit_n = jnp.where(bad, 0, lit_len)
        use_words = op + lit_n + 8 <= N

        def lit_words():
            copy_funnel(cw_ref, Wc, ip, op, lit_n)

        def lit_bytes():
            def bbody(i, _):
                wr_o(op + i, rd_c(ip + i))
                return 0
            jax.lax.fori_loop(0, lit_n, bbody, 0)

        jax.lax.cond(use_words & (lit_n > 0), lit_words, lit_bytes)
        ip = ip + lit_len
        op = op + lit_len

        done = (ip >= clen) | bad

        def do_match(ip, op, bad):
            # one word read: offset (2 bytes) + first match-length ext byte
            mw = rd_c_word(ip)
            off = mw & 0xFFFF
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlen = token & 15
            mext0 = (mw >> 16) & 255

            def m_ext():
                return jax.lax.cond(
                    mext0 == 255,
                    lambda: read_varint(ip, 15),
                    lambda: (15 + mext0, ip + 1))

            mlen, ip = jax.lax.cond(mlen == 15, m_ext, lambda: (mlen, ip))
            mlen = mlen + 4
            bad = bad | (op + mlen > N) | (off > op)

            m_n = jnp.where(bad, 0, mlen)
            # off >= 8: funnel copy (source stays a word ahead of the write
            # cursor). off 1/2: the output repeats with that period — fill
            # with a rotated constant word, zero loads (RLE hot path).
            # off 4..7: fresh-read word copy. off 3: byte loop.
            room = op + m_n + 8 <= N
            has = room & (m_n > 0)

            def m_funnel():
                copy_funnel(ow_ref, Wo, op - off, op, m_n)

            def m_splat():
                b0 = rd_o(op - off)
                v = jax.lax.cond(
                    off == 1,
                    lambda: b0 * jnp.int32(0x01010101),
                    lambda: (b0 | (rd_o(op - off + 1) << 8))
                    * jnp.int32(0x00010001))
                # v holds the pattern aligned to (op - off); for off 1/2
                # the period divides 4, so it is also aligned to op
                fill_rot(op, m_n, v)

            def m_words():
                def wbody(t, _):
                    wr_o_word(op + t * 4, rd_o_word(op - off + t * 4))
                    return 0
                jax.lax.fori_loop(0, (m_n + 3) >> 2, wbody, 0)

            def m_bytes():
                def bbody(i, _):
                    wr_o(op + i, rd_o(op - off + i))
                    return 0
                jax.lax.fori_loop(0, m_n, bbody, 0)

            jax.lax.cond(
                has & (off >= 8), m_funnel,
                lambda: jax.lax.cond(
                    has & (off <= 2), m_splat,
                    lambda: jax.lax.cond(
                        has & (off >= 4), m_words, m_bytes)))
            return ip, op + m_n, bad

        ip, op, bad = jax.lax.cond(
            done, lambda ip, op, bad: (ip, op, bad), do_match, ip, op, bad)

        return ip, op, ok & jnp.logical_not(bad), done | bad

    ip, op, ok, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), clen > 0, clen <= 0))
    ok = ok & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


def _decode_dict_kernel(cw_ref, meta_ref, dw_ref, ow_ref, n_out_ref, ok_ref,
                        strict: bool = True):
    """Dictionary-window variant: meta_ref = [clen, dlen, pre_lit,
    pre_skip, pre_moff, pre_mlen, out_len]; dw_ref holds the window
    right-aligned in packed words (logical dict byte -k is physical
    byte Wd*4 - k). Match copies that reach before the block start read
    from the window (reference: LZ4_decompress_safe_usingDict,
    compress/decompress.go:127-143).

    strict=True (whole-block decode): meta's carry fields are zero and a
    sequence that would overrun out_len is corrupt (bad). strict=False
    (large-block chunk records, native lz4r_chunk_split layout): the
    prologue copies pre_lit literal bytes from the slice start, skips
    pre_skip header bytes, executes the (pre_moff, pre_mlen) carry match,
    and the main loop CLAMPS literal/match copies at out_len — a clamped
    copy ends the record; the remainder is the next record's carry. The
    record is valid iff it consumes exactly clen input and produces
    exactly out_len output (host-checked via n_out).

    Copy scheme mirrors the plain kernel: carried-word copies for literals
    and in-block matches (2 loads + 2 stores per 4 bytes), with word copies
    for the dict segment of window-reaching matches — the round-1 version
    used per-byte RMW loops here and paid ~4x the plain kernel."""
    Wc = cw_ref.shape[0]
    Wo = ow_ref.shape[0]
    Wd = dw_ref.shape[0]
    C = Wc * 4
    N = Wo * 4
    DB = Wd * 4
    clen = meta_ref[0]
    dlen = meta_ref[1]

    def rd_c(p):
        p = jnp.clip(p, 0, C - 1)
        w = cw_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def rd_o(p):
        p = jnp.clip(p, 0, N - 1)
        w = ow_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def rd_d(k):
        """Dict byte k positions before the block start (k >= 1)."""
        p = jnp.clip(DB - k, 0, DB - 1)
        w = dw_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def rd_d_word(k):
        """4 dict bytes starting k positions before the block start.

        k = 4 (a match whose dict portion ends exactly at the boundary)
        reads the FINAL dict word, p = DB - 4 with sh == 0 — a clip to
        DB - 5 shifted that read one byte early and corrupted the last
        word of every boundary-ending match (round-4 gate finding)."""
        p = jnp.clip(DB - k, 0, DB - 4)
        idx = p >> 2
        sh = (p & 3) * 8
        lo = dw_ref[idx]
        hi = dw_ref[jnp.minimum(idx + 1, Wd - 1)]
        return jnp.where(
            sh == 0, lo,
            ((lo >> sh) & ((1 << (32 - sh)) - 1)) | (hi << (32 - sh)))

    def rd_o_word(p):
        p = jnp.clip(p, 0, N - 5)
        idx = p >> 2
        sh = (p & 3) * 8
        lo = ow_ref[idx]
        hi = ow_ref[jnp.minimum(idx + 1, Wo - 1)]
        return jnp.where(
            sh == 0, lo,
            ((lo >> sh) & ((1 << (32 - sh)) - 1)) | (hi << (32 - sh)))

    def wr_o(p, v):
        p = jnp.clip(p, 0, N - 1)
        idx = p >> 2
        sh = (p & 3) * 8
        w = ow_ref[idx]
        ow_ref[idx] = (w & (jnp.int32(-1) ^ (255 << sh))) | (v << sh)

    def wr_o_word(p, v):
        p = jnp.clip(p, 0, N - 5)
        idx = p >> 2
        idx2 = jnp.minimum(idx + 1, Wo - 1)
        sh = (p & 3) * 8
        lo_mask = (1 << sh) - 1
        lo = ow_ref[idx]
        hi = ow_ref[idx2]
        ow_ref[idx] = (lo & lo_mask) | (v << sh)
        v_hi = jax.lax.shift_right_logical(v, 32 - sh) & lo_mask
        ow_ref[idx2] = (hi & (jnp.int32(-1) ^ lo_mask)) | v_hi

    def rd_c_word(p):
        p = jnp.clip(p, 0, C - 5)
        idx = p >> 2
        sh = (p & 3) * 8
        lo = cw_ref[idx]
        hi = cw_ref[jnp.minimum(idx + 1, Wc - 1)]
        return jnp.where(
            sh == 0, lo,
            ((lo >> sh) & ((1 << (32 - sh)) - 1)) | (hi << (32 - sh)))

    def read_varint(ip, base):
        def vcond(s):
            _, _, last = s
            return last == 255

        def vbody(s):
            total, p, _ = s
            b = rd_c(p)
            return total + b, p + 1, b

        total, p, _ = jax.lax.while_loop(vcond, vbody, (base, ip, 255))
        return total, p

    out_len = meta_ref[6]

    def match_copy(op, off, m_n):
        """Copy m_n match bytes to op from op-off; sources reaching before
        the block start read the window. Callers guarantee
        op + m_n <= out_len <= N; word copies need +4 wild slack within N.
        dict portion: bytes while op - off + i < 0 come from the window;
        word copies when 4 consecutive source bytes stay inside the dict."""
        dict_n = jnp.clip(off - op, 0, m_n)
        room = op + m_n + 4 <= N

        def d_words():
            def wbody(t, _):
                # k = distance before block start of source byte
                k = off - op - t * 4
                wr_o_word(op + t * 4, rd_d_word(k))
                return 0
            # only full words whose 4 source bytes are all in-dict
            jax.lax.fori_loop(0, dict_n >> 2, wbody, 0)
            # tail bytes of the dict portion (plus any straddle into
            # the block) fall through to the byte loop below

        def d_none():
            pass

        jax.lax.cond(room & (dict_n >= 4), d_words, d_none)
        tail_start = jnp.where(room, dict_n & ~jnp.int32(3), 0)

        def straddle(i, _):
            src = op - off + tail_start + i
            v = jax.lax.cond(src < 0, lambda: rd_d(-src),
                             lambda: rd_o(src))
            wr_o(op + tail_start + i, v)
            return 0

        # copy byte-wise only across the dict/block boundary region
        # (pure in-block matches skip this entirely)
        straddle_n = jnp.where(
            dict_n > 0,
            jnp.minimum(m_n - tail_start, dict_n - tail_start + 4),
            0)
        straddle_n = jnp.clip(straddle_n, 0, m_n - tail_start)
        jax.lax.fori_loop(0, straddle_n, straddle, 0)

        # in-block remainder: carried-word scheme when offset allows
        rem_start = tail_start + straddle_n
        rem_n = m_n - rem_start
        use_carried = (off >= 8) & room
        use_wordsm = (off >= 4) & room

        def m_carried():
            def wbody(t, _):
                p = op + rem_start + t * 4
                wr_o_word(p, rd_o_word(p - off))
                return 0
            jax.lax.fori_loop(0, (rem_n + 3) >> 2, wbody, 0)

        def m_bytes():
            def bbody(i, _):
                p = op + rem_start + i
                wr_o(p, rd_o(p - off))
                return 0
            jax.lax.fori_loop(0, rem_n, bbody, 0)

        jax.lax.cond(use_carried | use_wordsm, m_carried, m_bytes)

    def cond(state):
        _, _, _, done = state
        return jnp.logical_not(done)

    def body(state):
        ip, op, ok, _ = state
        bad = ip >= clen
        hw = rd_c_word(ip)
        token = hw & 255
        ip = ip + 1

        lit_len = token >> 4
        ext0 = (hw >> 8) & 255

        def lit_ext():
            return jax.lax.cond(
                ext0 == 255,
                lambda: read_varint(ip, 15),
                lambda: (15 + ext0, ip + 1))

        lit_len, ip = jax.lax.cond(lit_len == 15, lit_ext,
                                   lambda: (lit_len, ip))
        if strict:
            bad = bad | (ip + lit_len > clen) | (op + lit_len > N)
            lit_n = jnp.where(bad, 0, lit_len)
            clip_l = jnp.bool_(False)
        else:
            # record mode: clamp at out_len; a clamped copy ends the
            # record (the remainder is the next record's pre_lit carry)
            lit_n = jnp.minimum(lit_len, out_len - op)
            bad = bad | (lit_n < 0) | (ip + lit_n > clen)
            lit_n = jnp.where(bad, 0, lit_n)
            clip_l = lit_n < lit_len
        use_words = op + lit_n + 4 <= N

        def lit_words():
            def wbody(t, _):
                wr_o_word(op + t * 4, rd_c_word(ip + t * 4))
                return 0
            jax.lax.fori_loop(0, (lit_n + 3) >> 2, wbody, 0)

        def lit_bytes():
            def bbody(i, _):
                wr_o(op + i, rd_c(ip + i))
                return 0
            jax.lax.fori_loop(0, lit_n, bbody, 0)

        jax.lax.cond(use_words, lit_words, lit_bytes)
        ip = ip + lit_n
        op = op + lit_n

        done = (ip >= clen) | bad | clip_l

        def do_match(ip, op, bad):
            mw = rd_c_word(ip)
            off = mw & 0xFFFF
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlen = token & 15
            mext0 = (mw >> 16) & 255

            def m_ext():
                return jax.lax.cond(
                    mext0 == 255,
                    lambda: read_varint(ip, 15),
                    lambda: (15 + mext0, ip + 1))

            mlen, ip = jax.lax.cond(mlen == 15, m_ext, lambda: (mlen, ip))
            mlen = mlen + 4
            bad = bad | (off > op + dlen)
            if strict:
                bad = bad | (op + mlen > N)
                m_n = jnp.where(bad, 0, mlen)
                clip_m = jnp.bool_(False)
            else:
                m_n = jnp.where(bad, 0, jnp.minimum(mlen, out_len - op))
                clip_m = m_n < mlen
            match_copy(op, off, m_n)
            return ip, op + m_n, bad, clip_m

        ip, op, bad, clip_m = jax.lax.cond(
            done, lambda ip, op, bad: (ip, op, bad, jnp.bool_(False)),
            do_match, ip, op, bad)
        return ip, op, ok & jnp.logical_not(bad), done | bad | clip_m

    if strict:
        ip0 = jnp.int32(0)
        op0 = jnp.int32(0)
        ok0 = clen > 0
        done0 = clen <= 0
    else:
        # record prologue: pre_lit literal bytes from the slice start,
        # pre_skip header bytes, then the carried match
        pre_lit = meta_ref[2]
        pre_skip = meta_ref[3]
        pre_moff = meta_ref[4]
        pre_mlen = meta_ref[5]
        bad0 = ((pre_lit > clen) | (pre_lit + pre_mlen > out_len)
                | ((pre_mlen > 0) & (pre_moff > pre_lit + dlen))
                | (pre_lit < 0) | (pre_mlen < 0))
        p_lit = jnp.where(bad0, 0, pre_lit)

        def pro_words():
            def wbody(t, _):
                wr_o_word(t * 4, rd_c_word(t * 4))
                return 0
            jax.lax.fori_loop(0, (p_lit + 3) >> 2, wbody, 0)

        def pro_bytes():
            def bbody(i, _):
                wr_o(i, rd_c(i))
                return 0
            jax.lax.fori_loop(0, p_lit, bbody, 0)

        jax.lax.cond(p_lit + 4 <= N, pro_words, pro_bytes)
        p_m = jnp.where(bad0, 0, pre_mlen)
        match_copy(p_lit, pre_moff, p_m)
        ip0 = p_lit + pre_skip
        op0 = p_lit + p_m
        bad0 = bad0 | (ip0 > clen)
        ok0 = jnp.logical_not(bad0)
        done0 = bad0 | (ip0 >= clen)

    ip, op, ok, _ = jax.lax.while_loop(cond, body, (ip0, op0, ok0, done0))
    ok = ok & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


@functools.partial(jax.jit,
                   static_argnames=("out_cap", "interpret"))
def decode_block_pallas_dict(comp: jnp.ndarray, clen: jnp.ndarray,
                             dict_buf: jnp.ndarray, dlen: jnp.ndarray,
                             out_cap: int, interpret: bool = False):
    """Decode one block with a dictionary window.

    dict_buf: (D,) uint8 right-aligned window, D % 4 == 0.
    """
    C = comp.shape[0]
    D = dict_buf.shape[0]
    assert C % 4 == 0 and out_cap % 4 == 0 and D % 4 == 0
    comp = jnp.concatenate([comp, jnp.zeros((8,), dtype=comp.dtype)])
    cw = pack_words(comp)
    dw = pack_words(dict_buf)
    zero = jnp.int32(0)
    meta = jnp.stack([clen.astype(I32), dlen.astype(I32), zero, zero,
                      zero, zero, jnp.int32(out_cap)])
    ow, n_out, ok = pl.pallas_call(
        _decode_dict_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((out_cap // 4,), I32),
            jax.ShapeDtypeStruct((1,), I32),
            jax.ShapeDtypeStruct((1,), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(cw, meta, dw)
    return unpack_words(ow), n_out[0], ok[0] != 0


# ---------------------------------------------------------------------------
# Large-block decode: the frame format's block classes go to 4 MiB
# (reference: descriptor/index.go:92-125) but the SMEM kernels are
# chunk-sized, so a large block decodes as a lax.scan over <= 64 KiB-output
# records (cut at sequence boundaries by native lz4r_chunk_split) carrying
# the 64 KiB window — one dispatch per block batch, bulk bytes on device.
# ---------------------------------------------------------------------------

CHUNK = 65536  # record output span == the LZ4 match window
# (the record input-slice cap lives in parallel/large.py: CHUNK_IN)


def _decode_record(row, meta, win, interpret: bool):
    """One carry-mode record decode: row (CIN,) uint8 slice, meta (7,)
    int32 (lz4r_chunk_split layout + dlen in meta[1]), win (C,) uint8
    window (the previous record's output, right-aligned). The record
    output span equals the window size (C = CHUNK in production; tests
    use small C with offset-bounded streams).

    Fast path: the byte-wide record kernel (fast straight-line tiers,
    window-aware careful tail) whenever input + window + output fit the
    SMEM element budget — true for the production CHUNK_IN/CHUNK shapes;
    the packed-word strict=False dict kernel is the fallback."""
    CIN = row.shape[0]
    W = win.shape[0]
    if CIN + 8 + 2 * W + 16 + 8 <= 230 * 1024:
        small_g2 = int(os.environ.get("PLZ4_DEC_SMALLG2", "4"))
        if small_g2 not in (2, 4, 8):
            small_g2 = 4
        ci = jnp.concatenate(
            [row, jnp.zeros((8,), row.dtype)]).astype(I32)
        ob, n_out, ok = pl.pallas_call(
            functools.partial(_decode_kernel_bw_rec, small_g2=small_g2),
            out_shape=(
                jax.ShapeDtypeStruct((W + 16,), I32),
                jax.ShapeDtypeStruct((1,), I32),
                jax.ShapeDtypeStruct((1,), I32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.SMEM((8,), I32)],
            interpret=interpret,
        )(ci, meta, win.astype(I32))
        return ob[:W].astype(jnp.uint8), n_out[0], ok[0]
    cw = pack_words(jnp.concatenate([row, jnp.zeros((8,), row.dtype)]))
    dw = pack_words(win)
    ow, n_out, ok = pl.pallas_call(
        functools.partial(_decode_dict_kernel, strict=False),
        out_shape=(
            jax.ShapeDtypeStruct((win.shape[0] // 4,), I32),
            jax.ShapeDtypeStruct((1,), I32),
            jax.ShapeDtypeStruct((1,), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(cw, meta, dw)
    return unpack_words(ow), n_out[0], ok[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_chunks_pallas(rows, metas, win0, interpret: bool = False):
    """Decode ONE large block's chunk records sequentially in a single
    dispatch: lax.scan carries the 64 KiB window (the previous record's
    full output) through the carry-mode dict kernel.

    rows: (K, CIN) uint8 input slices (CIN % 4 == 0); metas: (K, 7) int32
    [clen, dlen, pre_lit, pre_skip, pre_moff, pre_mlen, out_len] where
    metas[0, 1] is the frame-dictionary length (0 = none) and
    metas[i>0, 1] == CHUNK; win0: (CHUNK,) uint8 right-aligned window for
    record 0. Padding records (all-zero meta) are valid no-ops. Returns
    (outs (K, CHUNK) uint8, n_outs (K,) i32, oks (K,) i32)."""

    def step(win, xs):
        row, meta = xs
        out, n, ok = _decode_record(row, meta, win, interpret)
        return out, (out, n, ok)

    _, (outs, ns, oks) = jax.lax.scan(step, win0, (rows, metas))
    return outs, ns, oks


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_chunks_batch_pallas(rows, metas, win0s, interpret: bool = False):
    """Batch of large blocks: rows (B, K, CIN), metas (B, K, 7),
    win0s (B, CHUNK). Blocks run one per lax.map step (scalar-core
    kernels; see decode_batch_pallas for why not vmap)."""
    fn = functools.partial(decode_chunks_pallas, interpret=interpret)
    return jax.lax.map(lambda args: fn(*args), (rows, metas, win0s))


def _decode_kernel_bw_rec(c_ref, meta_ref, win_ref, o_ref, n_out_ref,
                          ok_ref, wid_ref, small_g2: int = 4):
    """Byte-wide CARRY-RECORD decode (large-block record scan): the
    byte-wide kernel's two-regime structure (fast straight-line tiers +
    careful tail; see _decode_kernel_bw) extended with the record
    semantics of the packed _decode_dict_kernel strict=False mode —
    meta = [clen, dlen, pre_lit, pre_skip, pre_moff, pre_mlen, out_len],
    prologue carries, literal/match copies clamped at out_len, and
    match sources reaching before the record start read win_ref (the
    previous record's output / frame dictionary, right-aligned).

    Fast tiers additionally gate on the match offset staying in-record
    (off <= op): window-reaching matches take the careful path with a
    generalized window-aware copier. Budget: CHUNK_IN + window + output
    byte-wide = ~215 Ki elements (no vals variant)."""
    C = c_ref.shape[0]
    W = win_ref.shape[0]
    NT = o_ref.shape[0]
    clen = meta_ref[0]
    dlen = meta_ref[1]
    out_len = meta_ref[6]

    for _e, _v in enumerate((8, 8, 8, 9, 8, 10, 12, 14)):
        wid_ref[_e] = _v

    def widen(eff):
        return jnp.where(eff >= 8, eff, wid_ref[eff & 7])

    def read_varint(ip, base):
        def vc(s):
            return s[2] == 255

        def vb(s):
            t, p, _ = s
            b = c_ref[jnp.minimum(p, C - 1)]
            return t + b, p + 1, b

        t, p, _ = jax.lax.while_loop(vc, vb, (base, ip, jnp.int32(255)))
        return t, p

    def copy_match_bw(op, off, m_n):
        """Window-aware match copy: the window segment (sources before
        the record start) copies 8-wide from win_ref; the in-record
        remainder uses the serial-8 prologue + widened groups (m_fast
        scheme). Callers guarantee op + m_n <= out_len and off <= op +
        dlen when m_n > 0."""
        n_win = jnp.clip(off - op, 0, m_n)

        def from_win():
            # source byte t of the window segment = win[W - (off-op) + t]
            s0 = W - (off - op)

            def wb(t, _):
                s = s0 + t * 8
                d = op + t * 8
                # wild reads clipped at the window end (dead bytes are
                # overwritten by the in-record remainder below)
                o_ref[d] = win_ref[jnp.minimum(s, W - 1)]
                o_ref[d + 1] = win_ref[jnp.minimum(s + 1, W - 1)]
                o_ref[d + 2] = win_ref[jnp.minimum(s + 2, W - 1)]
                o_ref[d + 3] = win_ref[jnp.minimum(s + 3, W - 1)]
                o_ref[d + 4] = win_ref[jnp.minimum(s + 4, W - 1)]
                o_ref[d + 5] = win_ref[jnp.minimum(s + 5, W - 1)]
                o_ref[d + 6] = win_ref[jnp.minimum(s + 6, W - 1)]
                o_ref[d + 7] = win_ref[jnp.minimum(s + 7, W - 1)]
                return 0

            jax.lax.fori_loop(0, (n_win + 7) >> 3, wb, 0)

        jax.lax.cond(n_win > 0, from_win, lambda: None)
        rem = m_n - n_win
        op2 = op + n_win  # in-record source index starts at op2 - off >= 0

        def in_rec():
            eff = jnp.minimum(off, op2)  # off <= op2 unless rem straddles
            eff = jnp.maximum(eff, 1)
            src = op2 - eff
            for k in range(8):
                o_ref[op2 + k] = o_ref[jnp.maximum(src + k, 0)]
            s2 = op2 - widen(eff)

            def gb(t, _):
                s = jnp.maximum(s2, 0) + t * 8
                d = op2 + t * 8
                o_ref[d] = o_ref[s]
                o_ref[d + 1] = o_ref[s + 1]
                o_ref[d + 2] = o_ref[s + 2]
                o_ref[d + 3] = o_ref[s + 3]
                o_ref[d + 4] = o_ref[s + 4]
                o_ref[d + 5] = o_ref[s + 5]
                o_ref[d + 6] = o_ref[s + 6]
                o_ref[d + 7] = o_ref[s + 7]
                return 0

            jax.lax.fori_loop(
                1, 1 + ((jnp.maximum(rem - 8, 0) + 7) >> 3), gb, 0)

        # wild 8-wide writes stay under out_len + 15 < NT (16 slack);
        # off == op2 case: source index 0 (the record's first byte)
        jax.lax.cond(rem > 0, in_rec, lambda: None)

    def careful_seq(ip, op, ok):
        bad = ip >= clen
        token = c_ref[jnp.minimum(ip, C - 1)]
        ip = ip + 1
        lit = token >> 4

        def lit_ext():
            e0 = c_ref[jnp.minimum(ip, C - 1)]
            return jax.lax.cond(
                e0 == 255,
                lambda: read_varint(ip, 15),
                lambda: (15 + e0, ip + 1))

        lit, ip = jax.lax.cond(lit == 15, lit_ext, lambda: (lit, ip))
        lit_n = jnp.minimum(lit, out_len - op)
        bad = bad | (lit_n < 0) | (ip + lit_n > clen)
        lit_n = jnp.where(bad, 0, lit_n)
        clip_l = lit_n < jnp.where(bad, lit_n, lit)

        def l_fast():
            def lb(t, _):
                s = ip + t * 8
                d = op + t * 8
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                o_ref[d + 4] = c_ref[s + 4]
                o_ref[d + 5] = c_ref[s + 5]
                o_ref[d + 6] = c_ref[s + 6]
                o_ref[d + 7] = c_ref[s + 7]
                return 0

            jax.lax.fori_loop(0, (lit_n + 7) >> 3, lb, 0)

        def l_serial():
            def lcopy(i, _):
                o_ref[jnp.minimum(op + i, NT - 1)] = \
                    c_ref[jnp.minimum(ip + i, C - 1)]
                return 0

            jax.lax.fori_loop(0, lit_n, lcopy, 0)

        # 8-wide when the input has wild-read slack (output slack is
        # structural: op + lit_n <= out_len and NT = out_cap + 16)
        jax.lax.cond(ip + lit_n + 8 <= C, l_fast, l_serial)
        ip = ip + lit_n
        op = op + lit_n
        fin = (ip >= clen) | bad | clip_l

        def do_match(ip, op, bad):
            off = c_ref[jnp.minimum(ip, C - 1)] | \
                (c_ref[jnp.minimum(ip + 1, C - 1)] << 8)
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlr = token & 15

            def m_ext():
                e0 = c_ref[jnp.minimum(ip, C - 1)]
                return jax.lax.cond(
                    e0 == 255,
                    lambda: read_varint(ip, 15),
                    lambda: (15 + e0, ip + 1))

            ml, ip = jax.lax.cond(mlr == 15, m_ext, lambda: (mlr, ip))
            ml = ml + 4
            bad = bad | (off > op + dlen)
            m_n = jnp.minimum(ml, out_len - op)
            m_n = jnp.where(bad, 0, m_n)
            clip_m = m_n < jnp.where(bad, m_n, ml)
            copy_match_bw(op, jnp.where(bad, jnp.int32(1), off), m_n)
            return ip, op + m_n, bad, clip_m

        ip, op, bad, clip_m = jax.lax.cond(
            fin, lambda ip, op, bad: (ip, op, bad, jnp.bool_(False)),
            do_match, ip, op, bad)
        return (ip, op, ((ok != 0) & jnp.logical_not(bad)).astype(I32),
                (fin | bad | clip_m).astype(I32))

    def body(state):
        ip, op, ok, _ = state
        token = c_ref[jnp.minimum(ip, C - 1)]
        lit = token >> 4
        mlr = token & 15
        mp = ip + 1 + lit
        off = c_ref[jnp.minimum(mp, C - 1)] | \
            (c_ref[jnp.minimum(mp + 1, C - 1)] << 8)
        # fast tiers: identical to _decode_kernel_bw plus in-record source
        # (off <= op) and the dynamic out_len bound — a fully-gated
        # sequence can never cross the record end, so no clamping inside
        gate_small = ((ip + 20 <= clen) & (op + 32 <= out_len) & (op >= 16)
                      & (lit <= 8) & (mlr <= small_g2 + 4)
                      & (off <= op) & (off > 0))

        def fast_small():
            s0 = ip + 1
            d = op
            o_ref[d] = c_ref[s0]
            o_ref[d + 1] = c_ref[s0 + 1]
            o_ref[d + 2] = c_ref[s0 + 2]
            o_ref[d + 3] = c_ref[s0 + 3]
            o_ref[d + 4] = c_ref[s0 + 4]
            o_ref[d + 5] = c_ref[s0 + 5]
            o_ref[d + 6] = c_ref[s0 + 6]
            o_ref[d + 7] = c_ref[s0 + 7]
            opl = op + lit
            ml = mlr + 4
            src = opl - off
            for k in range(8):
                o_ref[opl + k] = o_ref[src + k]
            s2 = opl + 8 - widen(off)
            d2 = opl + 8
            o_ref[d2] = o_ref[s2]
            o_ref[d2 + 1] = o_ref[s2 + 1]
            if small_g2 >= 4:
                o_ref[d2 + 2] = o_ref[s2 + 2]
                o_ref[d2 + 3] = o_ref[s2 + 3]
            if small_g2 >= 8:
                o_ref[d2 + 4] = o_ref[s2 + 4]
                o_ref[d2 + 5] = o_ref[s2 + 5]
                o_ref[d2 + 6] = o_ref[s2 + 6]
                o_ref[d2 + 7] = o_ref[s2 + 7]
            return (mp + 2, opl + ml, ok, jnp.int32(0))

        fast_gate = ((ip + 20 <= clen) & (op + 48 <= out_len) & (op >= 16)
                     & (lit != 15) & (mlr != 15) & (mp + 2 <= clen)
                     & (off <= op) & (off > 0))

        def fast_seq():
            s0 = ip + 1
            for g in (0, 1):
                s = s0 + g * 8 if g else s0
                d = op + g * 8 if g else op
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                o_ref[d + 4] = c_ref[s + 4]
                o_ref[d + 5] = c_ref[s + 5]
                o_ref[d + 6] = c_ref[s + 6]
                o_ref[d + 7] = c_ref[s + 7]
            opl = op + lit
            ml = mlr + 4
            src = opl - off
            for k in range(8):
                o_ref[opl + k] = o_ref[src + k]
            s2 = opl - widen(off)
            for g in (1, 2):
                s = s2 + g * 8
                d = opl + g * 8
                o_ref[d] = o_ref[s]
                o_ref[d + 1] = o_ref[s + 1]
                o_ref[d + 2] = o_ref[s + 2]
                o_ref[d + 3] = o_ref[s + 3]
                o_ref[d + 4] = o_ref[s + 4]
                o_ref[d + 5] = o_ref[s + 5]
                o_ref[d + 6] = o_ref[s + 6]
                o_ref[d + 7] = o_ref[s + 7]
            return (mp + 2, opl + ml, ok, jnp.int32(0))

        return jax.lax.cond(
            gate_small, fast_small,
            lambda: jax.lax.cond(fast_gate, fast_seq,
                                 lambda: careful_seq(ip, op, ok)))

    # ---- prologue: carried literals, header skip, carried match ---------
    pre_lit = meta_ref[2]
    pre_skip = meta_ref[3]
    pre_moff = meta_ref[4]
    pre_mlen = meta_ref[5]
    bad0 = ((pre_lit > clen) | (pre_lit + pre_mlen > out_len)
            | ((pre_mlen > 0) & (pre_moff > pre_lit + dlen))
            | (pre_lit < 0) | (pre_mlen < 0))
    p_lit = jnp.where(bad0, 0, pre_lit)

    def pro_lit():
        def lb(t, _):
            s = t * 8
            o_ref[s] = c_ref[s]
            o_ref[s + 1] = c_ref[s + 1]
            o_ref[s + 2] = c_ref[s + 2]
            o_ref[s + 3] = c_ref[s + 3]
            o_ref[s + 4] = c_ref[s + 4]
            o_ref[s + 5] = c_ref[s + 5]
            o_ref[s + 6] = c_ref[s + 6]
            o_ref[s + 7] = c_ref[s + 7]
            return 0

        jax.lax.fori_loop(0, (p_lit + 7) >> 3, lb, 0)

    jax.lax.cond(p_lit > 0, pro_lit, lambda: None)
    p_m = jnp.where(bad0, 0, pre_mlen)
    copy_match_bw(p_lit, jnp.where(bad0, jnp.int32(1), pre_moff), p_m)
    ip0 = p_lit + pre_skip
    op0 = p_lit + p_m
    bad0 = bad0 | (ip0 > clen)
    ok0 = jnp.logical_not(bad0).astype(I32)
    done0 = (bad0 | (ip0 >= clen)).astype(I32)

    ip, op, ok, _ = jax.lax.while_loop(
        lambda s: s[3] == 0, body, (ip0, op0, ok0, done0))
    ok = (ok != 0) & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


def _decode_kernel_bw(*refs, vals: bool = False, small_g2: int = 4):
    """Byte-wide decode: one byte per int32 SMEM element, so byte
    loads/stores are single ops with no shift/mask RMW, and — measured on
    chip (tools/tpu_kernel_lab.py addrfold) — constant offsets from one
    dynamic base fold into the memory op (~1.1 ns per load/store), while
    incremental cursors and re-associated bases cost 2-5x.

    Two regimes in one sequence loop:
      * fast (ip/op well inside the stream, token has no length
        extensions): straight-line parse + 8-wide wild const-offset
        copies, no per-byte bounds checks — the structural gate plus the
        <=14/<=18 length caps bound every access;
      * careful (near either end, or extended lengths): byte-serial with
        clipped accesses and exact bounds — the round-1 logic.

    Output carries 16 slack elements: the fast gate keeps wild writes
    under the logical capacity, clipped careful stores land in the slack.
    (Reference analog of the regime split: LZ4_decompress_generic's
    shortcut + safe tail, clz4/lz4.c:2016.)

    vals=True adds v_ref (VPU-precomputed words, v_ref[p] = 4-byte LE
    word at byte p): the fast tiers' offset reads become one load + one
    mask instead of two loads + shift/or. Same scheme as the encode
    kernels; enabled when the extra comp-sized operand fits SMEM."""
    if vals:
        c_ref, v_ref, clen_ref, o_ref, n_out_ref, ok_ref, w_ref = refs
    else:
        c_ref, clen_ref, o_ref, n_out_ref, ok_ref, w_ref = refs
        v_ref = None
    C = c_ref.shape[0]
    NT = o_ref.shape[0]
    Nl = NT - 16
    clen = clen_ref[0]

    # widened-offset table: off2[e] = smallest multiple of e that is >= 8
    # for e in 1..7 (identity above); one lookup replaces a ~10-op
    # compare/select chain in every match copy. 8 stores, amortized over
    # the whole block.
    for _e, _v in enumerate((8, 8, 8, 9, 8, 10, 12, 14)):
        w_ref[_e] = _v

    def widen(eff):
        return jnp.where(eff >= 8, eff, w_ref[eff & 7])

    def read_varint(ip, base):
        def vc(s):
            return s[2] == 255

        def vb(s):
            t, p, _ = s
            b = c_ref[jnp.minimum(p, C - 1)]
            return t + b, p + 1, b

        t, p, _ = jax.lax.while_loop(vc, vb, (base, ip, jnp.int32(255)))
        return t, p

    def careful_seq(ip, op, ok):
        """Full-checks sequence step; returns (ip, op, ok, done) i32s."""
        bad = ip >= clen
        token = c_ref[jnp.minimum(ip, C - 1)]
        ip = ip + 1
        lit = token >> 4

        def lit_ext():
            e0 = c_ref[jnp.minimum(ip, C - 1)]
            return jax.lax.cond(
                e0 == 255,
                lambda: read_varint(ip, 15),
                lambda: (15 + e0, ip + 1))

        lit, ip = jax.lax.cond(lit == 15, lit_ext, lambda: (lit, ip))
        bad = bad | (ip + lit > clen) | (op + lit > Nl)
        lit_n = jnp.where(bad, 0, lit)

        # 8-wide when the input has tail slack for the wild read (output
        # slack is structural: op + lit_n <= Nl and NT = Nl + 16)
        def l_fast():
            def lb(t, _):
                s = ip + t * 8
                d = op + t * 8
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                o_ref[d + 4] = c_ref[s + 4]
                o_ref[d + 5] = c_ref[s + 5]
                o_ref[d + 6] = c_ref[s + 6]
                o_ref[d + 7] = c_ref[s + 7]
                return 0

            jax.lax.fori_loop(0, (lit_n + 7) >> 3, lb, 0)

        def l_serial():
            def lcopy(i, _):
                o_ref[jnp.minimum(op + i, NT - 1)] = \
                    c_ref[jnp.minimum(ip + i, C - 1)]
                return 0

            jax.lax.fori_loop(0, lit_n, lcopy, 0)

        jax.lax.cond(ip + lit_n + 8 <= C, l_fast, l_serial)
        ip = ip + lit_n
        op = op + lit_n
        fin = (ip >= clen) | bad

        def do_match(ip, op, bad):
            off = c_ref[jnp.minimum(ip, C - 1)] | \
                (c_ref[jnp.minimum(ip + 1, C - 1)] << 8)
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlr = token & 15

            def m_ext():
                e0 = c_ref[jnp.minimum(ip, C - 1)]
                return jax.lax.cond(
                    e0 == 255,
                    lambda: read_varint(ip, 15),
                    lambda: (15 + e0, ip + 1))

            ml, ip = jax.lax.cond(mlr == 15, m_ext, lambda: (mlr, ip))
            ml = ml + 4
            bad = bad | (op + ml > Nl) | (off > op)
            m_n = jnp.where(bad, 0, ml)

            # 8-wide with branchless offset widening (same scheme as the
            # fast path; RLE streams always land here via the length
            # extension). Needs op >= 8 for the widened-group reads.
            def m_fast():
                eff = jnp.where(bad, jnp.int32(8), off)
                off2 = widen(eff)
                # clamp: on corrupt input (bad, e.g. off > op with op < 8)
                # m_n is 0 so the copied bytes are dead, but the prologue
                # still executes — the base must not index below SMEM
                src = jnp.maximum(op - eff, 0)
                for k in range(8):
                    o_ref[op + k] = o_ref[src + k]
                s2 = jnp.maximum(op - off2, 0)

                def gb(t, _):
                    s = s2 + t * 8
                    d = op + t * 8
                    o_ref[d] = o_ref[s]
                    o_ref[d + 1] = o_ref[s + 1]
                    o_ref[d + 2] = o_ref[s + 2]
                    o_ref[d + 3] = o_ref[s + 3]
                    o_ref[d + 4] = o_ref[s + 4]
                    o_ref[d + 5] = o_ref[s + 5]
                    o_ref[d + 6] = o_ref[s + 6]
                    o_ref[d + 7] = o_ref[s + 7]
                    return 0

                jax.lax.fori_loop(
                    1, 1 + ((jnp.maximum(m_n - 8, 0) + 7) >> 3), gb, 0)

            def m_serial():
                def mcopy(i, _):
                    d = op + i
                    o_ref[jnp.minimum(d, NT - 1)] = \
                        o_ref[jnp.minimum(jnp.maximum(d - off, 0), NT - 1)]
                    return 0

                jax.lax.fori_loop(0, m_n, mcopy, 0)

            jax.lax.cond((off >= 8) | (op >= 16), m_fast, m_serial)
            return ip, op + m_n, bad

        ip, op, bad = jax.lax.cond(
            fin, lambda ip, op, bad: (ip, op, bad), do_match, ip, op, bad)
        # ok/done carried as i32: Mosaic rejects i1 in cond result tuples
        return (ip, op, ((ok != 0) & jnp.logical_not(bad)).astype(I32),
                (fin | bad).astype(I32))

    def body(state):
        ip, op, ok, _ = state
        # ONE branch per sequence: cond + dynamic-trip fori machinery cost
        # ~15-40 ns EACH on this core (tools/tpu_kernel_lab.py condcost),
        # an order of magnitude above the round-1 estimate — so the fast
        # path is fully straight-line: lengths are capped by the gate
        # (lit <= 14, match <= 18), every copy is a fixed set of 8-wide
        # constant-offset groups, and sub-8 match offsets are widened to a
        # period multiple off2 >= 8 branchlessly instead of special-cased.
        token = c_ref[jnp.minimum(ip, C - 1)]
        lit = token >> 4
        mlr = token & 15
        mp = ip + 1 + lit
        # Two fast tiers (on-chip ablation, tools/tpu_kernel_lab.py
        # bwablate: parse+branch = 30 ns/seq, the rest of the round-1
        # 168 ns/seq was fixed 40-element copy machinery against an
        # average need of ~10 B/seq): a SMALL tier sized for the common
        # sequence (lit <= 8, match <= 16: one literal group, prologue +
        # one match group) and the full tier (lit <= 14, match <= 18).
        # small_g2: width of the second match copy group (8/4/2). 4-wide
        # trims 4 of the 16 match copy ops on the ~92% tier at the cost
        # of shrinking its match cap to ml <= 12 (CDF: ml <= 12 covers
        # 96.2%) — measured +13.5% on chip (65.9 -> 74.8 MB/s, round 3),
        # now the default. 2-wide (ml <= 10) and 8-wide (ml <= 16) kept
        # for A/Bs via PLZ4_DEC_SMALLG2.
        gate_small = ((ip + 20 <= clen) & (op + 32 <= Nl) & (op >= 16)
                      & (lit <= 8) & (mlr <= small_g2 + 4))

        def fast_small():
            s0 = ip + 1
            d = op
            o_ref[d] = c_ref[s0]
            o_ref[d + 1] = c_ref[s0 + 1]
            o_ref[d + 2] = c_ref[s0 + 2]
            o_ref[d + 3] = c_ref[s0 + 3]
            o_ref[d + 4] = c_ref[s0 + 4]
            o_ref[d + 5] = c_ref[s0 + 5]
            o_ref[d + 6] = c_ref[s0 + 6]
            o_ref[d + 7] = c_ref[s0 + 7]
            opl = op + lit
            off = (v_ref[mp] & 0xFFFF) if vals else (
                c_ref[mp] | (c_ref[mp + 1] << 8))
            ml = mlr + 4
            bad = (off == 0) | (off > opl)
            eff = jnp.where(bad, jnp.int32(8), off)
            src = opl - eff
            for k in range(8):
                o_ref[opl + k] = o_ref[src + k]
            s2 = opl + 8 - widen(eff)
            d2 = opl + 8
            o_ref[d2] = o_ref[s2]
            o_ref[d2 + 1] = o_ref[s2 + 1]
            if small_g2 >= 4:  # covers ml <= 12
                o_ref[d2 + 2] = o_ref[s2 + 2]
                o_ref[d2 + 3] = o_ref[s2 + 3]
            if small_g2 >= 8:  # covers ml <= 16
                o_ref[d2 + 4] = o_ref[s2 + 4]
                o_ref[d2 + 5] = o_ref[s2 + 5]
                o_ref[d2 + 6] = o_ref[s2 + 6]
                o_ref[d2 + 7] = o_ref[s2 + 7]
            m_n = jnp.where(bad, 0, ml)
            return (mp + 2, opl + m_n,
                    ((ok != 0) & jnp.logical_not(bad)).astype(I32),
                    bad.astype(I32))

        fast_gate = ((ip + 20 <= clen) & (op + 48 <= Nl) & (op >= 16)
                     & (lit != 15) & (mlr != 15) & (mp + 2 <= clen))

        def fast_seq():
            s0 = ip + 1
            # literals: 2 straight 8-wide groups cover lit <= 14 (wild
            # past op+lit; overwritten by the match / later sequences)
            for g in (0, 1):
                s = s0 + g * 8 if g else s0
                d = op + g * 8 if g else op
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                o_ref[d + 4] = c_ref[s + 4]
                o_ref[d + 5] = c_ref[s + 5]
                o_ref[d + 6] = c_ref[s + 6]
                o_ref[d + 7] = c_ref[s + 7]
            opl = op + lit
            off = (v_ref[mp] & 0xFFFF) if vals else (
                c_ref[mp] | (c_ref[mp + 1] << 8))
            ml = mlr + 4
            bad = (off == 0) | (off > opl)
            # widen the offset to its smallest multiple >= 8 (same
            # repeating pattern, and off2 - off <= 8 keeps every group
            # read inside the already-materialized pattern)
            eff = jnp.where(bad, jnp.int32(8), off)
            src = opl - eff
            # serial 8-byte prologue handles any off >= 1 (in-order RMW)
            for k in range(8):
                o_ref[opl + k] = o_ref[src + k]
            # two more 8-wide groups (match <= 18) read at distance off2:
            # every source byte was written by the prologue/group above
            s2 = opl - widen(eff)
            for g in (1, 2):
                s = s2 + g * 8
                d = opl + g * 8
                o_ref[d] = o_ref[s]
                o_ref[d + 1] = o_ref[s + 1]
                o_ref[d + 2] = o_ref[s + 2]
                o_ref[d + 3] = o_ref[s + 3]
                o_ref[d + 4] = o_ref[s + 4]
                o_ref[d + 5] = o_ref[s + 5]
                o_ref[d + 6] = o_ref[s + 6]
                o_ref[d + 7] = o_ref[s + 7]
            m_n = jnp.where(bad, 0, ml)
            return (mp + 2, opl + m_n,
                    ((ok != 0) & jnp.logical_not(bad)).astype(I32),
                    bad.astype(I32))

        ip, op, ok2, done = jax.lax.cond(
            gate_small, fast_small,
            lambda: jax.lax.cond(fast_gate, fast_seq,
                                 lambda: careful_seq(ip, op, ok)))
        return ip, op, ok2, done

    ip, op, ok, _ = jax.lax.while_loop(
        lambda s: s[3] == 0, body,
        (jnp.int32(0), jnp.int32(0), (clen > 0).astype(I32),
         (clen <= 0).astype(I32)))
    ok = (ok != 0) & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


# byte-wide SMEM spends 4 bytes per byte: cap it where in+out stay within
# the measured-good SMEM range (384 KiB per operand, tools/tpu_kernel_lab.py);
# frame block sizes jump 64 KiB -> 256 KiB so this covers the same blocks
_BW_MAX_OUT = 96 * 1024


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decode_block_pallas(comp: jnp.ndarray, clen: jnp.ndarray, out_cap: int,
                        interpret: bool = False):
    """Decode one LZ4 block with the Pallas kernel.

    comp: (C,) uint8 zero-padded, C % 4 == 0; clen: scalar int32.
    Returns (out (out_cap,) uint8, n_out, ok). out_cap % 4 == 0.

    Blocks up to 128 KiB decode with the byte-wide kernel (fast); larger
    blocks use the packed-word kernel (4x less SMEM).
    """
    C = comp.shape[0]
    assert C % 4 == 0 and out_cap % 4 == 0
    if out_cap <= _BW_MAX_OUT:
        cb = comp.astype(I32)
        vals = 2 * C + out_cap + 16 <= 230 * 1024
        inputs = [cb]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if vals:
            pad = jnp.concatenate([cb, jnp.zeros((3,), I32)])
            v = (pad[:-3] | (pad[1:-2] << 8) | (pad[2:-1] << 16)
                 | (pad[3:] << 24))
            inputs.append(v)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.reshape(clen.astype(I32), (1,)))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        # A value outside {2,4,8} would let gate_small admit match lengths
        # the fixed copy groups never write (silent corruption); fall back
        # to the measured default instead.
        small_g2 = int(os.environ.get("PLZ4_DEC_SMALLG2", "4"))
        if small_g2 not in (2, 4, 8):
            small_g2 = 4
        ob, n_out, ok = pl.pallas_call(
            functools.partial(
                _decode_kernel_bw, vals=vals,
                # second match-group width (default 4-wide: measured
                # +13.5% on chip, 65.9 -> 74.8 MB/s, round-3 two-k A/B,
                # docs/perf_notes.md); PLZ4_DEC_SMALLG2=8/4/2 for A/Bs
                small_g2=small_g2),
            out_shape=(
                jax.ShapeDtypeStruct((out_cap + 16,), I32),
                jax.ShapeDtypeStruct((1,), I32),
                jax.ShapeDtypeStruct((1,), I32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.SMEM((8,), I32)],
            interpret=interpret,
        )(*inputs)
        return ob[:out_cap].astype(jnp.uint8), n_out[0], ok[0] != 0
    # tail slack so unaligned word reads near clen never hit the clip guard
    comp = jnp.concatenate([comp, jnp.zeros((8,), dtype=comp.dtype)])
    cw = pack_words(comp)
    ow, n_out, ok = pl.pallas_call(
        _decode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((out_cap // 4,), I32),
            jax.ShapeDtypeStruct((1,), I32),
            jax.ShapeDtypeStruct((1,), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(cw, jnp.reshape(clen.astype(I32), (1,)))
    return unpack_words(ow), n_out[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decode_batch_pallas(comp: jnp.ndarray, clens: jnp.ndarray, out_cap: int,
                        interpret: bool = False):
    """Batch decode: comp (B, C) uint8, clens (B,).

    lax.map (not vmap): SMEM kernels run one block per step on the scalar
    core; mapping sequentially matches the hardware and sidesteps Mosaic's
    block-shape constraints on vmapped SMEM operands.
    """
    fn = functools.partial(decode_block_pallas, out_cap=out_cap,
                           interpret=interpret)
    return jax.lax.map(lambda args: fn(*args), (comp, clens))


def decode_block_host(comp: bytes, out_cap: int,
                      interpret: bool | None = None) -> bytes:
    """Host wrapper (testing). Uses interpret mode automatically when not
    running on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = max(16, (len(comp) + 8 + 3) & ~3)
    out_cap = (out_cap + 3) & ~3
    buf = np.zeros(C, dtype=np.uint8)
    buf[: len(comp)] = np.frombuffer(comp, dtype=np.uint8)
    out, n, ok = decode_block_pallas(
        jnp.asarray(buf), jnp.int32(len(comp)), out_cap,
        interpret=interpret)
    if not bool(ok):
        from .. import errors as zerr
        raise zerr.ErrDecompress
    return np.asarray(out)[: int(n)].tobytes()
