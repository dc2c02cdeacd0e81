"""LZ4 block encode (greedy, level-1 class) as a Pallas TPU kernel —
serial hash-table scan over SMEM with byte-packed words.

The classic greedy loop (reference analog: LZ4_compress_fast hot loop,
clz4/lz4.c:930) runs on the TPU scalar core: the 64 KiB input block, the
compressed output, and a 2^14-entry hash table all fit in SMEM as packed
int32 words. Blocks parallelize across grid steps / vmap / mesh; within a
block the scan is serial — the fast shape for byte-granular work on this
hardware (docs/perf_notes.md).

Emits standard LZ4 block streams (greedy parse with backward extension and
skip acceleration); incompressible blocks surface via the `ok` flag with
total >= n so the frame layer stores them raw.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_pallas import pack_words, unpack_words

I32 = jnp.int32

HASH_LOG = 14      # 2^14 entries * 4B = 64 KiB SMEM (greedy)
MID_HASH_LOG = 13  # mid mode: 2 tables x 2^13 x 4B = 64 KiB total
HASH_MUL = np.int32(np.uint32(2654435761).astype(np.int32))
MAX_DISTANCE = 65535
SKIP_STRENGTH = 6


def _encode_kernel(dw_ref, n_ref, ow_ref, total_ref, ok_ref, tab_ref,
                   tab2_ref=None, mid: bool = False):
    # greedy mode: tab2_ref is a VALUE table (vtab[h] = the 4 input bytes
    # at position tab[h]-1) — candidate verification becomes one aligned
    # load instead of an unaligned funnel read of the candidate
    # mid mode: tab2_ref is the depth-2 position chain
    """dw_ref: (Wd,) packed words of [window | block]; ow_ref: (Wo,) packed
    output words; tab_ref: (2^HASH_LOG,) scratch hash table (position+1,
    0 = empty). n_ref = [n, base, first]: the block occupies bytes
    [base, base+n); usable window bytes are [first, base) (the linked-mode
    / dictionary prefix — reference: LZ4_compress_fast_continue semantics,
    clz4/clz4.go:224-248).

    mid=True is the HC-class variant for device levels >= 3: a second
    table (tab2_ref) keeps the PREVIOUS same-hash position (a depth-2
    chain), both candidates are length-scored, and the skip acceleration
    is disabled — a bounded-SMEM stand-in for the host chain finder
    (reference analog: LZ4HC_InsertAndGetWiderMatch, lz4hc.c:885)."""
    Wd = dw_ref.shape[0]
    Wo = ow_ref.shape[0]
    D = Wd * 4   # input byte capacity
    O = Wo * 4   # output byte capacity
    n = n_ref[0]
    base = n_ref[1]
    first = n_ref[2]
    end = base + n

    def rd_b(p):
        p = jnp.clip(p, 0, D - 1)
        w = dw_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def rd_w(p):
        """Unaligned 4-byte LE read from input."""
        p = jnp.clip(p, 0, D - 5)
        idx = p >> 2
        sh = (p & 3) * 8
        lo = dw_ref[idx]
        hi = dw_ref[jnp.minimum(idx + 1, Wd - 1)]
        lo_u = jax.lax.shift_right_logical(lo, sh)
        return jnp.where(sh == 0, lo, lo_u | (hi << (32 - sh)))

    def wr_b(p, v):
        p = jnp.clip(p, 0, O - 1)
        idx = p >> 2
        sh = (p & 3) * 8
        w = ow_ref[idx]
        ow_ref[idx] = (w & (jnp.int32(-1) ^ (255 << sh))) | ((v & 255) << sh)

    def wr_w(p, v):
        """Unaligned 4-byte write to output (wild: may clobber 3 bytes past
        the logical position — callers always overwrite forward).
        Branchless two-word RMW: sh == 0 degenerates to store + no-op."""
        p = jnp.clip(p, 0, O - 5)
        idx = p >> 2
        idx2 = jnp.minimum(idx + 1, Wo - 1)
        sh = (p & 3) * 8
        lo_mask = (1 << sh) - 1
        lo = ow_ref[idx]
        hi = ow_ref[idx2]
        ow_ref[idx] = (lo & lo_mask) | (v << sh)
        v_hi = jax.lax.shift_right_logical(v, 32 - sh) & lo_mask
        ow_ref[idx2] = (hi & (jnp.int32(-1) ^ lo_mask)) | v_hi

    HL = MID_HASH_LOG if mid else HASH_LOG

    def hash4(u32):
        return jax.lax.shift_right_logical(u32 * HASH_MUL, 32 - HL)

    def emit_len_ext(pos, value):
        """Emit a 255-run length extension for value (= len - 15)."""
        def c(s):
            v, _ = s
            return v >= 255

        def b(s):
            v, p = s
            wr_b(p, 255)
            return v - 255, p + 1

        v, p = jax.lax.while_loop(c, b, (value, pos))
        wr_b(p, v)
        return p + 1

    SRL = jax.lax.shift_right_logical

    def copy_lit_funnel(src, dst, n):
        """Literal copy with one input load + one output store per 4
        bytes (funnel-carried; the spill word wild-writes past dst+n —
        the emit slack covers it and later emits overwrite)."""
        s_idx = src >> 2
        s_sh = (src & 3) * 8
        d_idx = dst >> 2
        d_sh = (dst & 3) * 8
        nw = (n + 3) >> 2

        def sfun(lo, hi):
            return SRL(lo, s_sh) | ((hi << 1) << (31 - s_sh))

        # stores are clipped: output overflow is only DETECTED after an
        # emit (the incompressible flag discards the block), so a runaway
        # literal run must stay memory-safe
        s_lo = dw_ref[s_idx]
        s_hi = dw_ref[jnp.minimum(s_idx + 1, Wd - 1)]
        v0 = sfun(s_lo, s_hi)
        d0 = jnp.minimum(d_idx, Wo - 1)
        d_lo = ow_ref[d0]
        ow_ref[d0] = (d_lo & ((1 << d_sh) - 1)) | (v0 << d_sh)

        def wbody(t, carry):
            s_prev, v_prev = carry
            s_nxt = dw_ref[jnp.minimum(s_idx + t + 1, Wd - 1)]
            v = sfun(s_prev, s_nxt)
            ow_ref[jnp.minimum(d_idx + t, Wo - 1)] = (
                SRL(SRL(v_prev, 1), 31 - d_sh) | (v << d_sh))
            return s_nxt, v

        _, v_last = jax.lax.fori_loop(1, nw, wbody, (s_hi, v0))
        ow_ref[jnp.minimum(d_idx + nw, Wo - 1)] = SRL(SRL(v_last, 1),
                                                      31 - d_sh)

    def emit_sequence(op, anchor, ip, mpos, mlen):
        """Emit literals [anchor, ip) + match (offset ip-mpos, len mlen).
        mlen == 0 means final literals (no match part)."""
        lit = ip - anchor
        tok_pos = op
        op = op + 1
        # literal length
        op = jax.lax.cond(
            lit >= 15, lambda: emit_len_ext(op, lit - 15), lambda: op)
        jax.lax.cond(lit > 0,
                     lambda: copy_lit_funnel(anchor, op, lit),
                     lambda: None)
        op = op + lit

        def with_match():
            o = op
            off = ip - mpos
            wr_b(o, off & 255)
            wr_b(o + 1, off >> 8)
            o = o + 2
            mv = mlen - 4
            o2 = jax.lax.cond(
                mv >= 15, lambda: emit_len_ext(o, mv - 15), lambda: o)
            tok = (jnp.minimum(lit, 15) << 4) | jnp.minimum(mv, 15)
            wr_b(tok_pos, tok)
            return o2

        def literals_only():
            wr_b(tok_pos, jnp.minimum(lit, 15) << 4)
            return op

        return jax.lax.cond(mlen > 0, with_match, literals_only)

    # ---- init hash table -------------------------------------------------
    def tinit(i, _):
        tab_ref[i] = 0
        if mid:
            tab2_ref[i] = 0
        return 0
    jax.lax.fori_loop(0, tab_ref.shape[0], tinit, 0)

    # preload window positions (reference: LZ4_loadDict analog)
    def wload(p, _):
        u = rd_w(p)
        h = hash4(u)
        if mid:
            tab2_ref[h] = tab_ref[h]
        else:
            tab2_ref[h] = u
        tab_ref[h] = p + 1
        return 0
    jax.lax.fori_loop(first, base, wload, 0)

    mflimit = end - 12
    matchlimit = end - 5
    out_limit = O - 16  # stop when output approaches capacity

    # state: (ip, anchor, op, overflow)
    def cond(state):
        ip, _, op, overflow = state
        return (ip <= mflimit) & (overflow == 0)

    def body(state):
        ip, anchor, op, overflow = state

        # --- search (skip acceleration in greedy mode; depth-2 chain in
        # mid mode) --------------------------------------------------------
        if mid:
            def s_cond(s):
                sip, _, found, cpos = s
                return (found == 0) & (sip <= mflimit)

            def s_body(s):
                sip, cnt, _, _ = s
                u = rd_w(sip)
                h = hash4(u)
                candA = tab_ref[h] - 1
                candB = tab2_ref[h] - 1
                tab2_ref[h] = candA + 1
                tab_ref[h] = sip + 1

                def valid(c):
                    return ((c >= first) & (c < sip)
                            & (sip - c <= MAX_DISTANCE) & (rd_w(c) == u))

                goodA = valid(candA)
                goodB = valid(candB)

                def quick_len(c):
                    """4 + extra matching words (capped probe) to rank the
                    two candidates without the full extension loop."""
                    e1 = (rd_w(c + 4) == rd_w(sip + 4)).astype(I32)
                    e2 = ((e1 != 0)
                          & (rd_w(c + 8) == rd_w(sip + 8))).astype(I32)
                    return e1 + e2

                la = jnp.where(goodA, 1 + quick_len(candA), 0)
                lb = jnp.where(goodB, 1 + quick_len(candB), 0)
                cand = jnp.where(lb > la, candB, candA)
                good = goodA | goodB
                return (jnp.where(good, sip, sip + 1), cnt + 1,
                        good.astype(I32), cand)

            sip, _, found, cand = jax.lax.while_loop(
                s_cond, s_body,
                (ip, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        else:
            # the scan advances mostly byte-by-byte: carry the two input
            # words across iterations so reading u costs shifts (plus one
            # amortized load on word crossings) instead of a fresh
            # two-load unaligned read per position
            SRLs = jax.lax.shift_right_logical

            def s_cond(s):
                sip, _, found, cpos, _, _ = s
                return (found == 0) & (sip <= mflimit)

            def s_body(s):
                sip, cnt, _, _, w_lo, w_hi = s
                sh = (sip & 3) * 8
                u = SRLs(w_lo, sh) | ((w_hi << 1) << (31 - sh))
                h = hash4(u)
                cand = tab_ref[h] - 1
                cval = tab2_ref[h]
                tab_ref[h] = sip + 1
                tab2_ref[h] = u
                good = ((cand >= first) & (cand < sip)
                        & (sip - cand <= MAX_DISTANCE)
                        & (cval == u))
                step = SRLs(cnt, SKIP_STRENGTH)
                nsip = jnp.where(good, sip, sip + 1 + step)
                idx_old = sip >> 2
                idx_new = jnp.minimum(nsip >> 2, Wd - 2)

                def keep():
                    return w_lo, w_hi

                def shift_one():
                    return w_hi, dw_ref[idx_new + 1]

                def reload():
                    return dw_ref[idx_new], dw_ref[idx_new + 1]

                w_lo2, w_hi2 = jax.lax.cond(
                    idx_new == idx_old, keep,
                    lambda: jax.lax.cond(
                        idx_new == idx_old + 1, shift_one, reload))
                return (nsip, cnt + 1, good.astype(I32), cand, w_lo2, w_hi2)

            ip_idx = jnp.minimum(ip >> 2, Wd - 2)
            sip, _, found, cand, _, _ = jax.lax.while_loop(
                s_cond, s_body,
                (ip, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 dw_ref[ip_idx], dw_ref[ip_idx + 1]))

        def no_match():
            # overflow flag carried as i32 (Mosaic rejects i1 cond results)
            return sip, anchor, op, jnp.int32(0)

        def with_match():
            mip = sip
            mpos = cand
            # backward extension over pending literals
            def b_cond(s):
                a, b_, _ = s
                return ((a > anchor) & (b_ > first)
                        & (rd_b(a - 1) == rd_b(b_ - 1)))

            def b_body(s):
                a, b_, l = s
                return a - 1, b_ - 1, l + 1

            mip, mpos, back = jax.lax.while_loop(
                b_cond, b_body, (mip, mpos, jnp.int32(0)))

            # forward extension: words then bytes
            def w_cond(s):
                l, active = s
                return active != 0

            def w_body(s):
                l, _ = s
                room = mip + l + 4 <= matchlimit
                eq = room & (rd_w(mip + l) == rd_w(mpos + l))
                return jnp.where(eq, l + 4, l), eq.astype(I32)

            mlen, _ = jax.lax.while_loop(
                w_cond, w_body, (jnp.int32(4) + back, jnp.int32(1)))

            def by_cond(s):
                l, active = s
                return active != 0

            def by_body(s):
                l, _ = s
                room = mip + l < matchlimit
                eq = room & (rd_b(mip + l) == rd_b(mpos + l))
                return jnp.where(eq, l + 1, l), eq.astype(I32)

            mlen, _ = jax.lax.while_loop(by_cond, by_body,
                                         (mlen, jnp.int32(1)))

            op2 = emit_sequence(op, anchor, mip, mpos, mlen)
            nip = mip + mlen
            # seed one intermediate hash (reference: lz4.c inserts ip-2)
            u2 = rd_w(nip - 2)
            h2 = hash4(u2)
            if mid:
                tab2_ref[h2] = tab_ref[h2]
            else:
                tab2_ref[h2] = u2
            tab_ref[h2] = nip - 2 + 1
            return nip, nip, op2, (op2 > out_limit).astype(I32)

        ip, anchor, op, overflow = jax.lax.cond(found != 0, with_match,
                                                no_match)
        return ip, anchor, op, overflow

    ip0 = base
    state = (ip0, ip0, jnp.int32(0), (n < 0).astype(I32))
    # blocks smaller than 13 bytes cannot contain a match
    state = jax.lax.while_loop(cond, body, state)
    _, anchor, op, overflow = state

    # final literals
    def final_ok():
        return emit_sequence(op, anchor, end, jnp.int32(0), jnp.int32(0))

    op = jax.lax.cond(
        (overflow != 0)
        | (op + (end - anchor) + (end - anchor) // 255 + 16 > O),
        lambda: O,  # overflowed: signal incompressible
        final_ok)

    total_ref[0] = op
    ok_ref[0] = ((op < n) & (overflow == 0)).astype(I32)


def _encode_kernel_bw(*refs, mid: bool = False, vals: bool = False,
                      hashes: bool = False, depth4: bool = False,
                      wstride: int = 1):
    """Byte-wide encode: one byte per int32 SMEM element. Byte loads are
    single ops and constant offsets from one dynamic base fold into the
    memory op (measured: tools/tpu_kernel_lab.py addrfold), so the hash
    scan carries the current 4-byte word across positions (shift-in one
    fresh byte instead of an unaligned funnel read) and literal emits are
    8-wide wild copies. Same stream semantics as _encode_kernel
    (greedy / mid, window prefix, incompressible flag).

    vals=True adds a precomputed word table v_ref (v_ref[p] = the 4-byte
    little-endian word at byte p, built on the VPU outside the kernel):
    every u32 read in the scan collapses from 4 loads + 3 shift/ors to a
    single SMEM load. Costs one extra input-sized SMEM operand, so callers
    enable it only when the element budget allows (_bw_fits)."""
    h_ref = None
    tab3_ref = tab4_ref = None
    if depth4:  # depth-4 mid chain: two extra scratch tables at the end
        refs, tab3_ref, tab4_ref = refs[:-2], refs[-2], refs[-1]
    if vals and hashes:
        (c_ref, v_ref, h_ref, n_ref, o_ref, total_ref, ok_ref, tab_ref,
         tab2_ref) = refs
    elif vals:
        (c_ref, v_ref, n_ref, o_ref, total_ref, ok_ref, tab_ref,
         tab2_ref) = refs
    else:
        c_ref, n_ref, o_ref, total_ref, ok_ref, tab_ref, tab2_ref = refs
        v_ref = None
    DT = c_ref.shape[0]
    OT = o_ref.shape[0]
    n = n_ref[0]
    base = n_ref[1]
    first = n_ref[2]
    end = base + n

    HL = MID_HASH_LOG if mid else HASH_LOG

    def hash4(u32):
        return jax.lax.shift_right_logical(u32 * HASH_MUL, 32 - HL)

    if hashes:
        # VPU-precomputed hash table (same trick as v_ref): 1 load
        # replaces mul+shift at every scanned/inserted position
        def hash_at(p, u):
            return h_ref[p]
    else:
        def hash_at(p, u):
            return hash4(u)

    if vals:
        def rd_u32(p):
            return v_ref[p]
    else:
        def rd_u32(p):
            return (c_ref[p] | (c_ref[p + 1] << 8) | (c_ref[p + 2] << 16)
                    | (c_ref[p + 3] << 24))

    def rd_u32_clip(p):
        p = jnp.minimum(p, DT - 4)
        return rd_u32(p)

    # ---- zero tables (8-wide: stores with folded constant offsets) ------
    def tinit(t, _):
        b = t * 8
        for k in range(8):
            tab_ref[b + k] = 0
            tab2_ref[b + k] = 0
            if depth4:
                tab3_ref[b + k] = 0
                tab4_ref[b + k] = 0
        return 0

    jax.lax.fori_loop(0, (1 << HL) // 8, tinit, 0)

    # ---- window preload (reference: LZ4_loadDict analog). wstride > 1
    # seeds every wstride-th window position: the preload is the dominant
    # fixed cost of chunked large-block encode (64 Ki inserts per chunk);
    # the stride trades window candidate density for it ------------------
    def wload(t, _):
        p = first + t * wstride
        u = rd_u32(p)
        h = hash_at(p, u)
        if mid:
            if depth4:
                tab4_ref[h] = tab3_ref[h]
                tab3_ref[h] = tab2_ref[h]
            tab2_ref[h] = tab_ref[h]
        else:
            tab2_ref[h] = u
        tab_ref[h] = p + 1
        return 0

    jax.lax.fori_loop(0, (base - first + wstride - 1) // wstride, wload, 0)

    mflimit = end - 12
    matchlimit = end - 5
    out_limit = OT - 16

    def emit_len_ext(pos, value):
        def c(s):
            v, _ = s
            return v >= 255

        def b(s):
            v, p = s
            o_ref[p] = 255
            return v - 255, p + 1

        v, p = jax.lax.while_loop(c, b, (value, pos))
        o_ref[p] = v
        return p + 1

    def emit_sequence(op, anchor, ip, mpos, mlen):
        """Emit literals [anchor, ip) + match; mlen == 0 => final literals.
        All stores are wild/unclipped: the room guard reserves the whole
        sequence (worst-case extension bytes included) or skips the emit
        and forces the overflow path."""
        lit = ip - anchor
        room = op + lit + (lit >> 8) + (mlen >> 8) + 32 <= OT

        def do_emit():
            tok_pos = op
            o = op + 1
            o = jax.lax.cond(
                lit >= 15, lambda: emit_len_ext(o, lit - 15), lambda: o)

            def lbody(t, _):
                s = anchor + t * 8
                d = o + t * 8
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                o_ref[d + 4] = c_ref[s + 4]
                o_ref[d + 5] = c_ref[s + 5]
                o_ref[d + 6] = c_ref[s + 6]
                o_ref[d + 7] = c_ref[s + 7]
                return 0

            jax.lax.fori_loop(0, (lit + 7) >> 3, lbody, 0)
            o = o + lit

            def with_match():
                off = ip - mpos
                o_ref[o] = off & 255
                o_ref[o + 1] = off >> 8
                o2 = o + 2
                mv = mlen - 4
                o3 = jax.lax.cond(
                    mv >= 15, lambda: emit_len_ext(o2, mv - 15),
                    lambda: o2)
                o_ref[tok_pos] = (jnp.minimum(lit, 15) << 4) \
                    | jnp.minimum(mv, 15)
                return o3

            def literals_only():
                o_ref[tok_pos] = jnp.minimum(lit, 15) << 4
                return o

            return jax.lax.cond(mlen > 0, with_match, literals_only)

        # no room: jump past out_limit so the caller latches overflow
        return jax.lax.cond(room, do_emit, lambda: jnp.int32(OT))

    # ---- main scan ------------------------------------------------------
    def cond(state):
        ip, _, op, overflow, _ = state
        return (ip <= mflimit) & (overflow == 0)

    def body(state):
        ip, anchor, op, overflow, u0 = state

        if mid:
            def s_cond(s):
                sip, _, found, cpos, _ = s
                return (found == 0) & (sip <= mflimit)

            def s_body(s):
                sip, cnt, _, _, u = s
                h = hash_at(sip, u)
                candA = tab_ref[h] - 1
                candB = tab2_ref[h] - 1
                if depth4:
                    candC = tab3_ref[h] - 1
                    candD = tab4_ref[h] - 1
                    tab4_ref[h] = candC + 1
                    tab3_ref[h] = candB + 1
                tab2_ref[h] = candA + 1
                tab_ref[h] = sip + 1

                def valid(c):
                    return ((c >= first) & (c < sip)
                            & (sip - c <= MAX_DISTANCE)
                            & (rd_u32_clip(c) == u))

                goodA = valid(candA)
                goodB = valid(candB)

                def quick_len(c):
                    e1 = (rd_u32_clip(c + 4) == rd_u32_clip(sip + 4))
                    e2 = (e1 & (rd_u32_clip(c + 8) == rd_u32_clip(sip + 8)))
                    return e1.astype(I32) + e2.astype(I32)

                la = jnp.where(goodA, 1 + quick_len(candA), 0)
                lb = jnp.where(goodB, 1 + quick_len(candB), 0)
                cand = jnp.where(lb > la, candB, candA)
                good = goodA | goodB
                if depth4:
                    best_l = jnp.maximum(la, lb)
                    goodC = valid(candC)
                    goodD = valid(candD)
                    lc = jnp.where(goodC, 1 + quick_len(candC), 0)
                    ld = jnp.where(goodD, 1 + quick_len(candD), 0)
                    cand = jnp.where(lc > best_l, candC, cand)
                    best_l = jnp.maximum(best_l, lc)
                    cand = jnp.where(ld > best_l, candD, cand)
                    good = good | goodC | goodD
                nsip = jnp.where(good, sip, sip + 1)
                # branchless reread (nsip <= mflimit + 1 <= end - 11; the
                # data carries 8 bytes of tail slack): cheaper than a
                # per-position lax.cond
                u2 = rd_u32(nsip)
                return (nsip, cnt + 1, good.astype(I32), cand, u2)

            sip, _, found, cand, _ = jax.lax.while_loop(
                s_cond, s_body,
                (ip, jnp.int32(0), jnp.int32(0), jnp.int32(0), u0))
        else:
            def s_cond(s):
                sip, _, found, cpos, _ = s
                return (found == 0) & (sip <= mflimit)

            def s_body(s):
                sip, cnt, _, _, u = s
                h = hash_at(sip, u)
                cand = tab_ref[h] - 1
                cval = tab2_ref[h]
                tab_ref[h] = sip + 1
                tab2_ref[h] = u
                good = ((cand >= first) & (sip - cand <= MAX_DISTANCE)
                        & (cval == u))
                step = jax.lax.shift_right_logical(cnt, SKIP_STRENGTH)
                adv = jnp.where(good, 0, 1 + step)
                nsip = sip + adv
                # branchless reread (one clamp: the acceleration step can
                # overshoot mflimit on incompressible data): cheaper than
                # the previous per-position lax.cond carrying the word
                # (12-15 ns vs ~7 ns; tools/tpu_kernel_lab.py condcost)
                u2 = rd_u32_clip(nsip)
                return (nsip, cnt + 1, good.astype(I32), cand, u2)

            sip, _, found, cand, _ = jax.lax.while_loop(
                s_cond, s_body,
                (ip, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 rd_u32_clip(ip)))

        def no_match():
            return sip, anchor, op, jnp.int32(0)

        def with_match():
            mip = sip
            mpos = cand

            def b_cond(s):
                a, b_, _ = s
                return ((a > anchor) & (b_ > first)
                        & (c_ref[a - 1] == c_ref[b_ - 1]))

            def b_body(s):
                a, b_, l = s
                return a - 1, b_ - 1, l + 1

            mip, mpos, back = jax.lax.while_loop(
                b_cond, b_body, (mip, mpos, jnp.int32(0)))

            # forward extension, 2 bytes per iteration (byte loads are
            # 1 op; resolution by partial-prefix sum)
            def f_cond(s):
                _, act = s
                return act != 0

            def f_body(s):
                l, _ = s
                r0 = mip + l < matchlimit
                e0 = r0 & (c_ref[mip + l] == c_ref[mpos + l])
                r1 = mip + l + 1 < matchlimit
                e1 = e0 & r1 & (c_ref[mip + l + 1] == c_ref[mpos + l + 1])
                return (l + e0.astype(I32) + e1.astype(I32),
                        e1.astype(I32))

            mlen, _ = jax.lax.while_loop(
                f_cond, f_body, (jnp.int32(4) + back, jnp.int32(1)))

            op2 = emit_sequence(op, anchor, mip, mpos, mlen)
            nip = mip + mlen
            u2 = rd_u32_clip(nip - 2)
            h2 = hash_at(nip - 2, u2)
            if mid:
                if depth4:
                    tab4_ref[h2] = tab3_ref[h2]
                    tab3_ref[h2] = tab2_ref[h2]
                tab2_ref[h2] = tab_ref[h2]
            else:
                tab2_ref[h2] = u2
            tab_ref[h2] = nip - 2 + 1
            return nip, nip, op2, (op2 > out_limit).astype(I32)

        ip, anchor, op, overflow = jax.lax.cond(found != 0, with_match,
                                                no_match)
        return ip, anchor, op, overflow, rd_u32_clip(ip)

    ip0 = base
    state = (ip0, ip0, jnp.int32(0), (n < 0).astype(I32), rd_u32_clip(ip0))
    state = jax.lax.while_loop(cond, body, state)
    _, anchor, op, overflow, _ = state

    def final_ok():
        return emit_sequence(op, anchor, end, jnp.int32(0), jnp.int32(0))

    op = jax.lax.cond(
        (overflow != 0)
        | (op + (end - anchor) + (end - anchor) // 255 + 16 > OT),
        lambda: jnp.int32(OT),
        final_ok)

    total_ref[0] = op
    ok_ref[0] = ((op < n) & (overflow == 0)).astype(I32)


# byte-wide encode: gate on total SMEM elements (input + output + tables)
# staying inside the measured-good range (tools/tpu_kernel_lab.py)
_BW_MAX_ELEMS = 230 * 1024


def _bw_fits(n_in: int, cap: int, mid: bool, vals: bool = False,
             hashes: bool = False, depth4: bool = False) -> bool:
    n_tables = 4 if (mid and (depth4
                              or os.environ.get("PLZ4_MID_DEPTH4"))) else 2
    tables = n_tables * (1 << (MID_HASH_LOG if mid else HASH_LOG))
    per_in = 1 + (1 if vals else 0) + (1 if hashes else 0)
    return n_in * per_in + cap + tables <= _BW_MAX_ELEMS


def _encode_call_bw(combined_u8, meta, cap: int, mid: bool,
                    interpret: bool, depth4: bool = False,
                    wstride: int = 1):
    """Shared pallas_call for the byte-wide encode kernel. Enables the
    precomputed-word-table variant (1 SMEM load per u32 read in the scan
    instead of 4 loads + 3 ors) whenever the extra input-sized operand
    stays inside the SMEM element budget — true for plain <= 64 KiB
    blocks; window-prefix (linked/dict) calls at full size fall back."""
    HL = MID_HASH_LOG if mid else HASH_LOG
    ci = combined_u8.astype(I32)
    vals = _bw_fits(ci.shape[0], cap, mid, vals=True)
    # VPU-precomputed hash table: fits only when a THIRD input-sized
    # operand stays inside the SMEM budget (<= ~32 KiB blocks at greedy);
    # lab A/B switch, pending an on-chip two-k result
    hashes = (vals and bool(os.environ.get("PLZ4_ENC_HASHTAB"))
              and _bw_fits(ci.shape[0], cap, mid, vals=True, hashes=True))
    inputs = [ci]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if vals:
        pad = jnp.concatenate([ci, jnp.zeros((3,), I32)])
        v = (pad[:-3] | (pad[1:-2] << 8) | (pad[2:-1] << 16)
             | (pad[3:] << 24))
        inputs.append(v)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        if hashes:
            hmul = jnp.int32(HASH_MUL)
            inputs.append(jax.lax.shift_right_logical(v * hmul, 32 - HL))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(meta)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    # depth-4 mid chain (two extra 2^13 tables): the device ladder's
    # third quality tier (device levels >= 8, VERDICT r3 #5); the env
    # switch forces it on for lab A/Bs at any level
    depth4 = mid and (depth4 or bool(os.environ.get("PLZ4_MID_DEPTH4")))
    n_tables = 4 if depth4 else 2
    wstride = max(1, int(os.environ.get("PLZ4_ENC_WSTRIDE", "0") or 0)
                  ) if os.environ.get("PLZ4_ENC_WSTRIDE") else wstride
    ob, total, ok = pl.pallas_call(
        functools.partial(_encode_kernel_bw, mid=mid, vals=vals,
                          hashes=hashes, depth4=depth4, wstride=wstride),
        out_shape=(
            jax.ShapeDtypeStruct((cap,), I32),
            jax.ShapeDtypeStruct((1,), I32),
            jax.ShapeDtypeStruct((1,), I32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.SMEM((1 << HL,), I32)] * n_tables,
        interpret=interpret,
    )(*inputs)
    return ob.astype(jnp.uint8), total[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_block_pallas(data: jnp.ndarray, n: jnp.ndarray,
                        interpret: bool = False):
    """Encode one LZ4 block with the Pallas kernel.

    data: (N,) uint8 zero-padded, N % 4 == 0; n: scalar int32 true length.
    Returns (out (N + N//255 + 64,) uint8, total, ok). ok False =>
    incompressible (store raw).
    """
    N = data.shape[0]
    assert N % 4 == 0
    CAP = (N + N // 255 + 64 + 3) & ~3
    # 8 bytes of tail slack so unaligned word reads near n never hit the
    # clip guard
    data = jnp.concatenate([data, jnp.zeros((8,), dtype=data.dtype)])
    meta = jnp.stack([n.astype(I32), jnp.int32(0), jnp.int32(0)])
    if _bw_fits(N + 8, CAP, mid=False):
        return _encode_call_bw(data, meta, CAP, mid=False,
                               interpret=interpret)
    dw = pack_words(data)
    ow, total, ok = pl.pallas_call(
        _encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((CAP // 4,), I32),
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
        scratch_shapes=[pltpu.SMEM((1 << HASH_LOG,), I32),
                        pltpu.SMEM((1 << HASH_LOG,), I32)],
        interpret=interpret,
    )(dw, meta)
    return unpack_words(ow), total[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "wstride"))
def encode_block_pallas_dict(data: jnp.ndarray, n: jnp.ndarray,
                             dict_buf: jnp.ndarray, dlen: jnp.ndarray,
                             interpret: bool = False, wstride: int = 1):
    """Encode one block with a window prefix (linked mode / dictionary).

    dict_buf: (D,) uint8 right-aligned window, D % 4 == 0. The combined
    SMEM domain is [window | block]; match starts stay in the block but
    sources may reach the window — so linked blocks still encode fully in
    parallel with pre-snapshotted windows (reference: _genDict,
    async/writer.go:412-437).
    """
    N = data.shape[0]
    D = dict_buf.shape[0]
    assert N % 4 == 0 and D % 4 == 0
    CAP = (N + N // 255 + 64 + 3) & ~3
    combined = jnp.concatenate(
        [dict_buf, data, jnp.zeros((8,), dtype=data.dtype)])
    meta = jnp.stack([n.astype(I32), jnp.int32(D),
                      jnp.int32(D) - dlen.astype(I32)])
    if _bw_fits(D + N + 8, CAP, mid=False):
        return _encode_call_bw(combined, meta, CAP, mid=False,
                               interpret=interpret, wstride=wstride)
    dw = pack_words(combined)
    ow, total, ok = pl.pallas_call(
        _encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((CAP // 4,), I32),
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
        scratch_shapes=[pltpu.SMEM((1 << HASH_LOG,), I32),
                        pltpu.SMEM((1 << HASH_LOG,), I32)],
        interpret=interpret,
    )(dw, meta)
    return unpack_words(ow), total[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "wstride"))
def encode_batch_pallas_dict(data, lens, dicts, dlens,
                             interpret: bool = False, wstride: int = 1):
    """Batch encode with per-block windows: dicts (B, D) right-aligned.
    wstride > 1 seeds every wstride-th window position (the large-block
    chunk path's measured trade: docs/perf_notes.md round-5)."""
    fn = functools.partial(encode_block_pallas_dict, interpret=interpret,
                           wstride=wstride)
    return jax.lax.map(lambda args: fn(*args), (data, lens, dicts, dlens))


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_batch_pallas(data: jnp.ndarray, lens: jnp.ndarray,
                        interpret: bool = False):
    """Batch encode via lax.map — one block per step on the scalar core
    (see decode_batch_pallas for why not vmap)."""
    fn = functools.partial(encode_block_pallas, interpret=interpret)
    return jax.lax.map(lambda args: fn(*args), (data, lens))


@functools.partial(jax.jit, static_argnames=("interpret", "depth4"))
def encode_block_pallas_mid(data: jnp.ndarray, n: jnp.ndarray,
                            interpret: bool = False,
                            depth4: bool = False):
    """HC-class device encode: device levels 3-7 route here with the
    depth-2 chain, levels >= 8 with depth4=True (two extra candidate
    tables; measured -19% speed for -0.6..-7.5% size) instead of the
    ~2 MB/s XLA array path. depth4 needs the byte-wide variant's SMEM
    budget; oversized blocks fall back to the depth-2 packed kernel."""
    N = data.shape[0]
    assert N % 4 == 0
    CAP = (N + N // 255 + 64 + 3) & ~3
    data = jnp.concatenate([data, jnp.zeros((8,), dtype=data.dtype)])
    meta = jnp.stack([n.astype(I32), jnp.int32(0), jnp.int32(0)])
    if _bw_fits(N + 8, CAP, mid=True, depth4=depth4):
        return _encode_call_bw(data, meta, CAP, mid=True,
                               interpret=interpret, depth4=depth4)
    dw = pack_words(data)
    ow, total, ok = pl.pallas_call(
        functools.partial(_encode_kernel, mid=True),
        out_shape=(
            jax.ShapeDtypeStruct((CAP // 4,), I32),
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
        scratch_shapes=[pltpu.SMEM((1 << MID_HASH_LOG,), I32),
                        pltpu.SMEM((1 << MID_HASH_LOG,), I32)],
        interpret=interpret,
    )(dw, meta)
    return unpack_words(ow), total[0], ok[0] != 0


@functools.partial(jax.jit,
                   static_argnames=("interpret", "depth4", "wstride"))
def encode_block_pallas_mid_dict(data: jnp.ndarray, n: jnp.ndarray,
                                 dict_buf: jnp.ndarray, dlen: jnp.ndarray,
                                 interpret: bool = False,
                                 depth4: bool = False, wstride: int = 1):
    """Mid-mode encode with a window prefix (linked/dict device levels >= 3)."""
    N = data.shape[0]
    D = dict_buf.shape[0]
    assert N % 4 == 0 and D % 4 == 0
    CAP = (N + N // 255 + 64 + 3) & ~3
    combined = jnp.concatenate(
        [dict_buf, data, jnp.zeros((8,), dtype=data.dtype)])
    meta = jnp.stack([n.astype(I32), jnp.int32(D),
                      jnp.int32(D) - dlen.astype(I32)])
    if _bw_fits(D + N + 8, CAP, mid=True, depth4=depth4):
        return _encode_call_bw(combined, meta, CAP, mid=True,
                               interpret=interpret, depth4=depth4,
                               wstride=wstride)
    dw = pack_words(combined)
    ow, total, ok = pl.pallas_call(
        functools.partial(_encode_kernel, mid=True),
        out_shape=(
            jax.ShapeDtypeStruct((CAP // 4,), I32),
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
        scratch_shapes=[pltpu.SMEM((1 << MID_HASH_LOG,), I32),
                        pltpu.SMEM((1 << MID_HASH_LOG,), I32)],
        interpret=interpret,
    )(dw, meta)
    return unpack_words(ow), total[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "depth4"))
def encode_batch_pallas_mid(data, lens, interpret: bool = False,
                            depth4: bool = False):
    fn = functools.partial(encode_block_pallas_mid, interpret=interpret,
                           depth4=depth4)
    return jax.lax.map(lambda args: fn(*args), (data, lens))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "depth4", "wstride"))
def encode_batch_pallas_mid_dict(data, lens, dicts, dlens,
                                 interpret: bool = False,
                                 depth4: bool = False, wstride: int = 1):
    fn = functools.partial(encode_block_pallas_mid_dict,
                           interpret=interpret, depth4=depth4,
                           wstride=wstride)
    return jax.lax.map(lambda args: fn(*args), (data, lens, dicts, dlens))


DEEP_HASH_LOG = 15      # deep tier: 2^15 head buckets + a full chain array
DEEP_HASH_LOG_U16 = 14  # u16-delta-chain variant (full-window dict calls)


def _deep_fits(n_in: int, cap: int) -> bool:
    """Deep tier SMEM budget: input + chain (one link per input byte) +
    output + head table must stay inside the measured-good element range.
    True for plain 64 KiB blocks (229,772 of 235,520); window-prefix calls
    at the device's 64 KiB window do NOT fit — they take the u16-delta
    chain variant below (half window) or fall back to depth-4."""
    return 2 * n_in + cap + (1 << DEEP_HASH_LOG) <= _BW_MAX_ELEMS


def _deep_fits_u16(n_in: int, cap: int) -> bool:
    """u16-delta-chain budget: two links per i32 element + 2^14 head.
    True for a 32 KiB window + 64 KiB block (229,708 of 235,520)."""
    return (n_in + (n_in + 1) // 2 + cap
            + (1 << DEEP_HASH_LOG_U16) <= _BW_MAX_ELEMS)


def _encode_kernel_deep(c_ref, n_ref, o_ref, total_ref, ok_ref,
                        head_ref, chain_ref, tries: int = 16,
                        suff: int = 0, lazy_cap: int = 0,
                        ins_step: int = 1, probe2: bool = False,
                        u16chain: bool = False, hash_log: int = 0):
    """HC-class chain-finder encode (device levels >= 10): byte-wide SMEM
    layout with a real hash-chain match finder — head_ref[h] holds the most
    recent position+1 for bucket h and chain_ref[p] the previous same-bucket
    position+1 — walked up to `tries` links per search with a byte-probe
    early exit at the current best length, full re-extension on probe hits,
    one-step-iterated lazy matching, and every covered position inserted
    (reference analog: LZ4HC_InsertAndGetWiderMatch + the lazy overlap loop
    of LZ4HC_compress_hashChain, clz4/lz4hc.c:885,1100 — rebuilt here on
    this kernel family's scan/emit skeleton; the walk's probe-then-extend
    step is the measured-cheap shape on the scalar core: ~15 ops/link when
    the probe misses, a zero-trip extension loop instead of a lax.cond).
    Same stream semantics as _encode_kernel_bw (window prefix via n_ref,
    incompressible flag, wild emits with room guards).

    u16chain=True is the SMEM-compressed variant for full-window
    linked/dict calls (VERDICT r4 next-#5): the chain stores u16 DELTAS
    to the previous same-bucket position, two per i32 element (halving
    the array that kept the 64 KiB-window call out of budget), with a
    2^14 head. Delta 0 terminates a chain (distances beyond 65535 are
    outside the LZ4 window anyway). Costs ~2 extra ops per link read and
    per insert (RMW packing)."""
    DT = c_ref.shape[0]
    OT = o_ref.shape[0]
    n = n_ref[0]
    base = n_ref[1]
    first = n_ref[2]
    end = base + n

    HL = hash_log or (DEEP_HASH_LOG_U16 if u16chain else DEEP_HASH_LOG)

    def hash4(u32):
        return jax.lax.shift_right_logical(u32 * HASH_MUL, 32 - HL)

    def rd_u32(p):
        return (c_ref[p] | (c_ref[p + 1] << 8) | (c_ref[p + 2] << 16)
                | (c_ref[p + 3] << 24))

    # ---- zero the head table (chain links are written before read) ------
    def tinit(t, _):
        b = t * 8
        for k in range(8):
            head_ref[b + k] = 0
        return 0

    jax.lax.fori_loop(0, (1 << HL) // 8, tinit, 0)

    if u16chain:
        def chain_next(p):
            """Previous same-bucket position, or a sentinel < any valid
            position when the chain ends (delta 0)."""
            d = (jax.lax.shift_right_logical(chain_ref[p >> 1],
                                             (p & 1) * 16)) & 0xFFFF
            return p - jnp.where(d == 0, jnp.int32(1 << 20), d)

        def insert_u(p, u):
            h = hash4(u)
            prev = head_ref[h] - 1
            d = p - prev
            d = jnp.where((prev < 0) | (d > 0xFFFF), 0, d)
            idx = p >> 1
            sh = (p & 1) * 16
            w = chain_ref[idx]
            chain_ref[idx] = (w & (jnp.int32(-1) ^ (0xFFFF << sh))) \
                | (d << sh)
            head_ref[h] = p + 1
    else:
        def chain_next(p):
            return chain_ref[p] - 1

        def insert_u(p, u):
            h = hash4(u)
            chain_ref[p] = head_ref[h]
            head_ref[h] = p + 1

    def insert(p):
        insert_u(p, rd_u32(p))

    # ---- window preload (linked/dict prefix) -----------------------------
    def wload(p, _):
        insert(p)
        return 0

    jax.lax.fori_loop(first, base, wload, 0)

    mflimit = end - 12
    matchlimit = end - 5
    out_limit = OT - 16

    def walk(p, min_len):
        """Walk p's chain (already inserted) for the longest match of
        length > min_len ending before matchlimit. Returns (best_len,
        best_pos); best_len == min_len means none found. Each link costs a
        clipped byte probe at best_len; the extension while_loop re-verifies
        from byte 0 on probe hits (zero iterations otherwise), so no
        separate first-word check is needed."""
        lo = jnp.maximum(first, p - MAX_DISTANCE)

        def w_cond(s):
            cand, bl, _, t = s
            ok = (cand >= lo) & (t < tries)
            if suff:  # good-enough valve (lab knob; upstream targetLength)
                ok = ok & (bl < suff)
            return ok

        def w_body(s):
            cand, bl, bp, t = s
            hit = (c_ref[cand + bl] == c_ref[p + bl])
            if probe2:  # lab knob: second probe byte (stronger filter)
                hit = hit & (c_ref[cand + bl - 1] == c_ref[p + bl - 1])

            def e_cond(es):
                _, act = es
                return act != 0

            def e_body(es):
                l, _ = es
                r0 = p + l < matchlimit
                e0 = r0 & (c_ref[cand + l] == c_ref[p + l])
                r1 = p + l + 1 < matchlimit
                e1 = e0 & r1 & (c_ref[cand + l + 1] == c_ref[p + l + 1])
                return (l + e0.astype(I32) + e1.astype(I32),
                        e1.astype(I32))

            l, _ = jax.lax.while_loop(e_cond, e_body,
                                      (jnp.int32(0), hit.astype(I32)))
            bp2 = jnp.where(l > bl, cand, bp)
            bl2 = jnp.maximum(bl, l)
            return chain_next(cand), bl2, bp2, t + 1

        _, bl, bp, _ = jax.lax.while_loop(
            w_cond, w_body,
            (chain_next(p), min_len, jnp.int32(-1), jnp.int32(0)))
        return bl, bp

    def emit_len_ext(pos, value):
        def c(s):
            v, _ = s
            return v >= 255

        def b(s):
            v, p = s
            o_ref[p] = 255
            return v - 255, p + 1

        v, p = jax.lax.while_loop(c, b, (value, pos))
        o_ref[p] = v
        return p + 1

    def emit_sequence(op, anchor, ip, mpos, mlen):
        lit = ip - anchor
        room = op + lit + (lit >> 8) + (mlen >> 8) + 32 <= OT

        def do_emit():
            tok_pos = op
            o = op + 1
            o = jax.lax.cond(
                lit >= 15, lambda: emit_len_ext(o, lit - 15), lambda: o)

            def lbody(t, _):
                s = anchor + t * 8
                d = o + t * 8
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                o_ref[d + 4] = c_ref[s + 4]
                o_ref[d + 5] = c_ref[s + 5]
                o_ref[d + 6] = c_ref[s + 6]
                o_ref[d + 7] = c_ref[s + 7]
                return 0

            jax.lax.fori_loop(0, (lit + 7) >> 3, lbody, 0)
            o = o + lit

            def with_match():
                off = ip - mpos
                o_ref[o] = off & 255
                o_ref[o + 1] = off >> 8
                o2 = o + 2
                mv = mlen - 4
                o3 = jax.lax.cond(
                    mv >= 15, lambda: emit_len_ext(o2, mv - 15),
                    lambda: o2)
                o_ref[tok_pos] = (jnp.minimum(lit, 15) << 4) \
                    | jnp.minimum(mv, 15)
                return o3

            def literals_only():
                o_ref[tok_pos] = jnp.minimum(lit, 15) << 4
                return o

            return jax.lax.cond(mlen > 0, with_match, literals_only)

        return jax.lax.cond(room, do_emit, lambda: jnp.int32(OT))

    # ---- main parse -------------------------------------------------------
    def cond(state):
        ip, _, op, overflow = state
        return (ip <= mflimit) & (overflow == 0)

    def body(state):
        ip, anchor, op, overflow = state

        # scan: insert every visited position, stop at the first >= 4 match.
        # The current 4-byte word is loop-carried (shift in one fresh byte
        # per advance: 1 load + 3 ops vs the 7-op rd_u32 rebuild).
        def s_cond(s):
            sip, _, found, _, _ = s
            return (found == 0) & (sip <= mflimit)

        def s_body(s):
            sip, _, _, _, u = s
            insert_u(sip, u)
            bl, bp = walk(sip, jnp.int32(3))
            found = (bl >= 4).astype(I32)
            u2 = jax.lax.shift_right_logical(u, 8) | (c_ref[sip + 4] << 24)
            return sip + 1 - found, bl, found, bp, u2

        sip, blen, found, bpos, _ = jax.lax.while_loop(
            s_cond, s_body,
            (ip, jnp.int32(3), jnp.int32(0), jnp.int32(0), rd_u32(ip)))

        def no_match():
            return sip, anchor, op, jnp.int32(0)

        def with_match():
            # lazy overlap: while the NEXT position holds a strictly longer
            # match, absorb this byte into the pending literals and move on
            def l_cond(s):
                mip, bl, _, go, _ = s
                ok = (go != 0) & (mip + 1 <= mflimit)
                if lazy_cap:  # skip lazy probes on long matches (lab knob)
                    ok = ok & (bl < lazy_cap)
                return ok

            def l_body(s):
                mip, bl, bp, _, _ = s
                p2 = mip + 1
                insert(p2)
                l2, q2 = walk(p2, bl)
                better = l2 > bl
                return (jnp.where(better, p2, mip), jnp.maximum(bl, l2),
                        jnp.where(better, q2, bp), better.astype(I32),
                        p2 + 1)

            mip, mlen, mpos, _, hi = jax.lax.while_loop(
                l_cond, l_body, (sip, blen, bpos, jnp.int32(1), sip + 1))

            # backward extension over pending literals
            def b_cond(s):
                a, b_, _ = s
                return ((a > anchor) & (b_ > first)
                        & (c_ref[a - 1] == c_ref[b_ - 1]))

            def b_body(s):
                a, b_, l = s
                return a - 1, b_ - 1, l + 1

            mip, mpos, back = jax.lax.while_loop(
                b_cond, b_body, (mip, mpos, jnp.int32(0)))
            mlen = mlen + back

            op2 = emit_sequence(op, anchor, mip, mpos, mlen)
            nip = mip + mlen

            # insert the positions the match covers (a real HC finder keys
            # every position; sources past mflimit are unreachable starts).
            # Sequential positions: carry the word here too.
            ins_lim = jnp.minimum(nip, mflimit + 1)
            if ins_step == 1:
                def ins(p, u):
                    insert_u(p, u)
                    return (jax.lax.shift_right_logical(u, 8)
                            | (c_ref[p + 4] << 24))

                jax.lax.fori_loop(hi, ins_lim, ins, rd_u32(hi))
            else:  # strided insertion (lab knob: trade chain density)
                def ins(t, _):
                    insert(hi + t * ins_step)
                    return 0

                jax.lax.fori_loop(
                    0, (ins_lim - hi + ins_step - 1) // ins_step, ins, 0)
            return nip, nip, op2, (op2 > out_limit).astype(I32)

        ip, anchor, op, overflow = jax.lax.cond(found != 0, with_match,
                                                no_match)
        return ip, anchor, op, overflow

    ip0 = base
    state = (ip0, ip0, jnp.int32(0), (n < 0).astype(I32))
    state = jax.lax.while_loop(cond, body, state)
    _, anchor, op, overflow = state

    def final_ok():
        return emit_sequence(op, anchor, end, jnp.int32(0), jnp.int32(0))

    op = jax.lax.cond(
        (overflow != 0)
        | (op + (end - anchor) + (end - anchor) // 255 + 16 > OT),
        lambda: jnp.int32(OT),
        final_ok)

    total_ref[0] = op
    ok_ref[0] = ((op < n) & (overflow == 0)).astype(I32)


def _encode_call_deep(combined_u8, meta, cap: int, tries: int,
                      interpret: bool, u16chain: bool = False,
                      hash_log: int = 0):
    # lab knobs (trace-time env reads, fresh process per config — the
    # PLZ4_MID_DEPTH4 pattern): good-enough valve / lazy cap / insert
    # stride, for the on-chip deep-tier sweep (docs/perf_notes.md).
    # lazy_cap defaults ON at 64: measured size-free on text AND
    # runs-heavy corpora, +5-6% speed on runs-heavy, bounds the
    # adversarial every-probe-hits walk; 0 disables.
    suff = int(os.environ.get("PLZ4_DEEP_SUFF", "0") or 0)
    lazy_cap = int(os.environ.get("PLZ4_DEEP_LAZYCAP", "64") or 0)
    ins_step = max(1, int(os.environ.get("PLZ4_DEEP_INSSTEP", "1") or 1))
    probe2 = bool(os.environ.get("PLZ4_DEEP_PROBE2"))
    ci = combined_u8.astype(I32)
    hl = hash_log or (DEEP_HASH_LOG_U16 if u16chain else DEEP_HASH_LOG)
    chain_elems = (ci.shape[0] + 1) // 2 if u16chain else ci.shape[0]
    ob, total, ok = pl.pallas_call(
        functools.partial(_encode_kernel_deep, tries=tries, suff=suff,
                          lazy_cap=lazy_cap, ins_step=ins_step,
                          probe2=probe2, u16chain=u16chain, hash_log=hl),
        out_shape=(
            jax.ShapeDtypeStruct((cap,), I32),
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
        scratch_shapes=[pltpu.SMEM((1 << hl,), I32),
                        pltpu.SMEM((chain_elems,), I32)],
        interpret=interpret,
    )(ci, meta)
    return ob.astype(jnp.uint8), total[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "tries"))
def encode_block_pallas_deep(data: jnp.ndarray, n: jnp.ndarray,
                             interpret: bool = False, tries: int = 16):
    """Deep-tier device encode (levels >= 10): hash-chain finder with a
    `tries`-link walk budget + lazy matching. Blocks too large for the
    chain array's SMEM budget fall back to the depth-4 candidate tables."""
    N = data.shape[0]
    assert N % 4 == 0
    CAP = (N + N // 255 + 64 + 3) & ~3
    if not _deep_fits(N + 8, CAP):
        return encode_block_pallas_mid(data, n, interpret=interpret,
                                       depth4=True)
    data = jnp.concatenate([data, jnp.zeros((8,), dtype=data.dtype)])
    meta = jnp.stack([n.astype(I32), jnp.int32(0), jnp.int32(0)])
    return _encode_call_deep(data, meta, CAP, tries, interpret)


@functools.partial(jax.jit, static_argnames=("interpret", "tries"))
def encode_block_pallas_deep_dict(data: jnp.ndarray, n: jnp.ndarray,
                                  dict_buf: jnp.ndarray, dlen: jnp.ndarray,
                                  interpret: bool = False, tries: int = 16):
    """Deep-tier encode with a window prefix. Small windows run the full
    i32-chain kernel; the device's standard 64 KiB window + 64 KiB block
    exceeds that budget and runs the u16-delta-chain variant with the
    window truncated to its last 32 KiB (VERDICT r4 next-#5: the real
    hash-chain finder instead of the old depth-4 fallback — full chain
    depth, half cross-block reach; reference: LZ4HC_InsertAndGetWiderMatch
    searches its dict ctx the same way, clz4/lz4hc.c:885). Only calls that
    exceed even that budget fall back to depth-4."""
    N = data.shape[0]
    D = dict_buf.shape[0]
    assert N % 4 == 0 and D % 4 == 0
    CAP = (N + N // 255 + 64 + 3) & ~3
    if not _deep_fits(D + N + 8, CAP):
        DU = 32768
        if D > DU:
            dict_u = jax.lax.slice_in_dim(dict_buf, D - DU, D)
            dlen_u = jnp.minimum(dlen.astype(I32), DU)
        else:
            dict_u, dlen_u = dict_buf, dlen
        DUeff = dict_u.shape[0]
        if _deep_fits_u16(DUeff + N + 8, CAP):
            combined = jnp.concatenate(
                [dict_u, data, jnp.zeros((8,), dtype=data.dtype)])
            meta = jnp.stack([n.astype(I32), jnp.int32(DUeff),
                              jnp.int32(DUeff) - dlen_u.astype(I32)])
            return _encode_call_deep(combined, meta, CAP, tries, interpret,
                                     u16chain=True)
        return encode_block_pallas_mid_dict(data, n, dict_buf, dlen,
                                            interpret=interpret,
                                            depth4=True)
    combined = jnp.concatenate(
        [dict_buf, data, jnp.zeros((8,), dtype=data.dtype)])
    meta = jnp.stack([n.astype(I32), jnp.int32(D),
                      jnp.int32(D) - dlen.astype(I32)])
    return _encode_call_deep(combined, meta, CAP, tries, interpret)


@functools.partial(jax.jit, static_argnames=("interpret", "tries"))
def encode_batch_pallas_deep(data, lens, interpret: bool = False,
                             tries: int = 16):
    fn = functools.partial(encode_block_pallas_deep, interpret=interpret,
                           tries=tries)
    return jax.lax.map(lambda args: fn(*args), (data, lens))


@functools.partial(jax.jit, static_argnames=("interpret", "tries"))
def encode_batch_pallas_deep_dict(data, lens, dicts, dlens,
                                  interpret: bool = False, tries: int = 16):
    fn = functools.partial(encode_block_pallas_deep_dict,
                           interpret=interpret, tries=tries)
    return jax.lax.map(lambda args: fn(*args), (data, lens, dicts, dlens))


def encode_block_host(data: bytes, interpret: bool | None = None):
    """Host wrapper (testing); returns compressed bytes or None when the
    block is incompressible."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = max(16, (len(data) + 3) & ~3)
    buf = np.zeros(N, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    out, total, ok = encode_block_pallas(
        jnp.asarray(buf), jnp.int32(len(data)), interpret=interpret)
    if len(data) > 0 and not bool(ok):
        return None
    if len(data) == 0:
        return b"\x00"
    return np.asarray(out)[: int(total)].tobytes()
