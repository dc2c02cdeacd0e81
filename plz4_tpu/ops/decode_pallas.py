"""LZ4 block decode as a Pallas TPU kernel — serial per-block sequence loop
in VMEM.

Motivation (docs/perf_notes.md): on TPU, random gathers cost ~5-10 ns per
element, so the O(log n)-depth array-program decoder (decode_jax.py) is
gather-bound at a few MB/s per chip. A 64 KiB block plus its window and
output fit easily in VMEM, where the classic serial LZ4 loop (reference
analog: LZ4_decompress_generic, clz4/lz4.c:2016) runs on the scalar core at
cycles-per-byte rates — 1-2 orders of magnitude faster for this workload.
Blocks still parallelize across cores/chips via the grid and mesh.

Data is staged as int32 (one byte per element) to sidestep sub-word tiling
constraints; conversion to/from uint8 happens outside the kernel at VPU
speed. Each grid step decodes one block.

This v1 kernel is byte-at-a-time (correctness-first); vectorized wild
copies are the planned follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

I32 = jnp.int32


def _decode_kernel(comp_ref, clen_ref, out_ref, n_out_ref, ok_ref):
    """Decode one block: comp_ref (C,) int32 bytes; out_ref (N,) int32."""
    C = comp_ref.shape[0]
    N = out_ref.shape[0]
    clen = clen_ref[0]

    # state: (ip, op, ok, done)
    def cond(state):
        _, _, _, done = state
        return jnp.logical_not(done)

    def read_byte(ip):
        return comp_ref[ip]

    def read_varint(ip, base):
        """255-run length extension starting at ip; returns (value, ip)."""
        def vcond(s):
            _, _, last = s
            return last == 255

        def vbody(s):
            total, p, _ = s
            b = read_byte(jnp.minimum(p, C - 1))
            return total + b, p + 1, b

        total, p, _ = jax.lax.while_loop(vcond, vbody, (base, ip, 255))
        return total, p

    def body(state):
        ip, op, ok, _ = state
        bad = ip >= clen
        token = read_byte(jnp.minimum(ip, C - 1))
        ip = ip + 1

        # --- literal length ---
        lit_len = token >> 4
        lit_len, ip = jax.lax.cond(
            lit_len == 15,
            lambda: read_varint(ip, 15),
            lambda: (lit_len, ip))
        bad = bad | (ip + lit_len > clen) | (op + lit_len > N)

        # --- copy literals (byte loop) ---
        def lit_copy(i, _):
            out_ref[jnp.minimum(op + i, N - 1)] = read_byte(
                jnp.minimum(ip + i, C - 1))
            return 0

        safe_lit = jnp.where(bad, 0, lit_len)
        jax.lax.fori_loop(0, safe_lit, lit_copy, 0)
        ip = ip + lit_len
        op = op + lit_len

        # --- end of block: last sequence is literals-only ---
        done = (ip >= clen) | bad

        def do_match(ip, op, bad):
            off = (read_byte(jnp.minimum(ip, C - 1))
                   | (read_byte(jnp.minimum(ip + 1, C - 1)) << 8))
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlen = token & 15
            mlen, ip = jax.lax.cond(
                mlen == 15,
                lambda: read_varint(ip, 15),
                lambda: (mlen, ip))
            mlen = mlen + 4
            bad = bad | (op + mlen > N) | (off > op)

            def mcopy(i, _):
                src = jnp.maximum(op - off + i, 0)
                out_ref[jnp.minimum(op + i, N - 1)] = out_ref[
                    jnp.minimum(src, N - 1)]
                return 0

            safe_m = jnp.where(bad, 0, mlen)
            jax.lax.fori_loop(0, safe_m, mcopy, 0)
            return ip, op + jnp.where(bad, 0, mlen), bad

        ip, op, bad = jax.lax.cond(
            done,
            lambda ip, op, bad: (ip, op, bad),
            do_match,
            ip, op, bad)

        return ip, op, ok & jnp.logical_not(bad), done | bad

    # handle empty input: token 0x00 only, or clen == 0 invalid
    ip0 = jnp.int32(0)
    op0 = jnp.int32(0)
    ok0 = clen > 0
    done0 = clen <= 0
    ip, op, ok, _ = jax.lax.while_loop(cond, body, (ip0, op0, ok0, done0))
    # a well-formed block consumes exactly clen bytes
    ok = ok & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decode_block_pallas(comp: jnp.ndarray, clen: jnp.ndarray, out_cap: int,
                        interpret: bool = False):
    """Decode one LZ4 block with the Pallas kernel.

    comp: (C,) uint8 zero-padded; clen: scalar int32.
    Returns (out (out_cap,) uint8, n_out, ok).
    """
    C = comp.shape[0]
    out, n_out, ok = pl.pallas_call(
        _decode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((out_cap,), I32),
            jax.ShapeDtypeStruct((1,), I32),
            jax.ShapeDtypeStruct((1,), I32),
        ),
        interpret=interpret,
    )(comp.astype(I32), jnp.reshape(clen.astype(I32), (1,)))
    return out.astype(jnp.uint8), n_out[0], ok[0] != 0


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decode_batch_pallas(comp: jnp.ndarray, clens: jnp.ndarray, out_cap: int,
                        interpret: bool = False):
    """Batch decode: comp (B, C) uint8, clens (B,)."""
    fn = functools.partial(decode_block_pallas, out_cap=out_cap,
                           interpret=interpret)
    return jax.vmap(fn)(comp, clens)


def decode_block_host(comp: bytes, out_cap: int,
                      interpret: bool | None = None) -> bytes:
    """Host wrapper (testing). Uses interpret mode automatically when not
    running on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = max(16, len(comp) + 8)
    buf = np.zeros(C, dtype=np.uint8)
    buf[: len(comp)] = np.frombuffer(comp, dtype=np.uint8)
    out, n, ok = decode_block_pallas(
        jnp.asarray(buf), jnp.int32(len(comp)), out_cap,
        interpret=interpret)
    if not bool(ok):
        from .. import errors as zerr
        raise zerr.ErrDecompress
    return np.asarray(out)[: int(n)].tobytes()
