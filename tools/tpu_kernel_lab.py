"""On-chip kernel experiments — run when the axon tunnel is alive.

Measures, with the single-dispatch k-loop methodology from
docs/perf_notes.md (data variation against hoisting, scalar device_get as
the only true barrier, overhead subtraction):

  1. baseline: current pallas decode / encode / mid-encode throughput
  2. decode cost split: parse-only kernel (copies ablated) vs full
  3. batching: lax.map vs grid-based pallas_call
  4. DMA issue overhead: pltpu.make_async_copy on VMEM refs

Usage:  python tools/tpu_kernel_lab.py [experiment ...]
        (default: all; each prints one line per measurement)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

if os.environ.get("PLZ4_LAB_CPU"):
    # The env var JAX_PLATFORMS alone does NOT displace the preset axon
    # platform (see CLAUDE.md); the config update does.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import plz4_tpu  # noqa: E402
from plz4_tpu import native  # noqa: E402
from plz4_tpu.ops import decode_pallas, encode_pallas  # noqa: E402

I32 = jnp.int32
BLOCK = 65536
B = 16  # blocks per batch


def corpus_blocks():
    rng = np.random.default_rng(1234)
    vocab = [bytes(rng.integers(97, 123, int(rng.integers(2, 12)),
                                dtype=np.uint8)) + b" " for _ in range(512)]
    out = bytearray()
    while len(out) < B * BLOCK:
        out += vocab[int(rng.integers(len(vocab)))]
    data = bytes(out[: B * BLOCK])
    return [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]


_NULL = None


def _null_dispatch():
    """Measure bare dispatch latency with a trivial jitted scalar."""
    global _NULL
    if _NULL is None:
        _NULL = jax.jit(lambda x: x + 1)
        int(_NULL(jnp.int32(1)))
    t0 = time.perf_counter()
    int(_NULL(jnp.int32(2)))
    return time.perf_counter() - t0


def timed_kloop(make_fn, k, payload_bytes, label, reps=3):
    """make_fn(vary) -> jitted zero-arg callable returning a scalar.
    XLA does not hoist loop-invariant pallas calls out of fori_loop in
    this stack, so the 'hoistable' variant is useless as an overhead
    probe; subtract the bare dispatch latency instead."""
    f_vary = make_fn(True)
    int(f_vary())  # compile
    ovh = min(_null_dispatch() for _ in range(reps))
    t = min(_t(f_vary) for _ in range(reps))
    eff = max(t - ovh, 1e-9)
    print(f"{label}: {payload_bytes / 1e6 / eff:8.1f} MB/s "
          f"(t {t:.3f}s, dispatch {ovh:.3f}s, k={k})")
    return payload_bytes / eff


def _t(f):
    t0 = time.perf_counter()
    int(f())
    return time.perf_counter() - t0


def exp_addrfold():
    """Does a constant-offset SMEM access (ref[d + k]) cost an ALU add, or
    does Mosaic fold it into the memory op? Compare an 8-wide copy loop
    with constant offsets vs one whole-loop-carried incremental cursor,
    and measure the raw cost of an 8-byte byte-wide copy step."""

    M = 8192

    def mk_kernel(n_iter, kind):
        def kern(x_ref, o_ref):
            def cond(s):
                return s[0] < n_iter

            def body(s):
                i, d = s
                # source/dest base cycle through a small region
                b = d & (M - 1 - 16)
                if kind == "const8":
                    for k in range(8):
                        o_ref[b + k] = x_ref[b + k]
                elif kind == "incr8":
                    # explicit serial increments (defeats folding)
                    p = b
                    for k in range(8):
                        o_ref[p] = x_ref[p]
                        p = p + 1
                elif kind == "mul4":
                    # 2 iterations of the 4x pattern used by prod kernels
                    for t in range(2):
                        sb = b + t * 4
                        for k in range(4):
                            o_ref[sb + k] = x_ref[sb + k]
                return i + 1, d + 13
            out = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[0]))
            o_ref[0] = out[1]
        return kern

    def run_case(n_iter, kind, reps=3):
        kern = mk_kernel(n_iter, kind)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M,), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(x)

        x = jnp.arange(M, dtype=I32) % 251
        int(f(x)[0])
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            int(f(x + r)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for kind in ("const8", "incr8", "mul4"):
        t_lo = run_case(1 << 14, kind)
        t_hi = run_case(1 << 17, kind)
        per_it = (t_hi - t_lo) / ((1 << 17) - (1 << 14))
        print(f"copy8 {kind}: {per_it * 1e9:6.1f} ns/iter "
              f"({per_it * 1e9 / 8:5.2f} ns/byte)")


def exp_condcost():
    """Real cost of lax.cond and dynamic-trip fori_loop inside a kernel
    loop — round-1 notes claimed ~2.4 ns/cond; the decode kernel's
    per-sequence cost suggests branch machinery is ~10x that."""

    def mk_kernel(n_iter, n_conds, n_loops, trip):
        def kern(x_ref, o_ref):
            def cond(s):
                return s[0] < n_iter

            def body(s):
                i, a = s
                for c in range(n_conds):
                    a = jax.lax.cond(
                        (a & 1) == 0, lambda: a + i, lambda: a - i)
                for l in range(n_loops):
                    t = (a & 3) + trip  # dynamic trip count

                    def lb(k, acc):
                        return acc + k

                    a = a + jax.lax.fori_loop(0, t, lb, jnp.int32(0))
                return i + 1, a & 0x7FFFFFF
            out = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[0]))
            o_ref[0] = out[1]
        return kern

    def run_case(n_iter, n_conds, n_loops, trip, reps=3):
        kern = mk_kernel(n_iter, n_conds, n_loops, trip)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8,), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(x)

        x = jnp.arange(8, dtype=I32)
        int(f(x)[0])
        return min(_t_first(f, x, r) for r in range(reps))

    def _t_first(f, x, r):
        t0 = time.perf_counter()
        int(f(x + r)[0])
        return time.perf_counter() - t0

    base = {}
    for conds, loops, trip in [(0, 0, 0), (4, 0, 0), (0, 4, 4)]:
        t_lo = run_case(1 << 13, conds, loops, trip)
        t_hi = run_case(1 << 16, conds, loops, trip)
        per_it = (t_hi - t_lo) / ((1 << 16) - (1 << 13))
        if (conds, loops, trip) == (0, 0, 0):
            base["it"] = per_it
        extra = per_it - base["it"]
        n = max(conds + loops, 1)
        print(f"cond/loop conds={conds} loops={loops} trip={trip}: "
              f"{per_it * 1e9:7.1f} ns/iter (+{extra * 1e9:6.1f}, "
              f"{extra * 1e9 / n:5.1f} ns each)")


def exp_callcost():
    """Per-call floor of the lax.map harness: no-op kernels with the same
    operand shapes as the real decode, byte-wide vs packed — separates
    pallas_call launch + SMEM operand staging from kernel compute."""
    B_, C = B, BLOCK + 24

    def nop_kern(c_ref, l_ref, o_ref, n_ref, k_ref):
        n_ref[0] = l_ref[0]
        k_ref[0] = c_ref[0]
        o_ref[0] = jnp.int32(1)

    def mk_case(label, in_elems, out_elems):
        @jax.jit
        def one(c, l):
            return pl.pallas_call(
                nop_kern,
                out_shape=(
                    jax.ShapeDtypeStruct((out_elems,), I32),
                    jax.ShapeDtypeStruct((1,), I32),
                    jax.ShapeDtypeStruct((1,), I32),
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                           pl.BlockSpec(memory_space=pltpu.SMEM),
                           pl.BlockSpec(memory_space=pltpu.SMEM)),
            )(c, l)

        carr = jnp.zeros((B_, in_elems), I32)
        lens = jnp.zeros((B_, 1), I32)
        K = 48

        def mk(vary):
            @jax.jit
            def f():
                def body(i, acc):
                    c = carr.at[:, -1].set(i) if vary else carr

                    def o(args):
                        w, l = args
                        _, n, _ = o2 = one(w, l)
                        return o2[1][0]

                    ns = jax.lax.map(o, (c, lens))
                    return acc + jnp.sum(ns)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return f

        f = mk(True)
        int(f())
        ovh = min(_null_dispatch() for _ in range(3))
        t = min(_t(f) for _ in range(3))
        eff = max(t - ovh, 1e-9)
        per_call = eff / (K * B_) * 1e6
        print(f"no-op {label}: {per_call:7.1f} us/call "
              f"(floor {B_ * BLOCK * K / 1e6 / eff:7.1f} MB/s equiv)")

    mk_case("bytewide shapes", C, BLOCK + 16)
    mk_case("packed shapes", C // 4, BLOCK // 4)
    mk_case("tiny shapes", 8, 8)


def exp_baseline():
    blocks = corpus_blocks()
    data = jnp.asarray(np.stack(
        [np.frombuffer(b, np.uint8) for b in blocks]))
    lens = jnp.full((B,), BLOCK, dtype=I32)
    comp_np = [native.compress(b) for b in blocks]
    C = BLOCK + 16
    carr = np.zeros((B, C), np.uint8)
    clens = np.zeros((B,), np.int32)
    for i, c in enumerate(comp_np):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    comp = jnp.asarray(carr)
    clens = jnp.asarray(clens)

    K = 48

    def mk_dec(vary):
        @jax.jit
        def f():
            def body(i, acc):
                c = comp.at[:, -1].set((i & 255).astype(jnp.uint8)) \
                    if vary else comp
                out, n, ok = decode_pallas.decode_batch_pallas(
                    c, clens, out_cap=BLOCK)
                return acc + jnp.sum(n)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    def mk_enc(vary):
        @jax.jit
        def f():
            def body(i, acc):
                d = data ^ (i % 7).astype(jnp.uint8) if vary else data
                out, tot, ok = encode_pallas.encode_batch_pallas(d, lens)
                return acc + jnp.sum(tot)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    def mk_mid(vary):
        @jax.jit
        def f():
            def body(i, acc):
                d = data ^ (i % 7).astype(jnp.uint8) if vary else data
                out, tot, ok = encode_pallas.encode_batch_pallas_mid(d, lens)
                return acc + jnp.sum(tot)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    nbytes = B * BLOCK * K
    timed_kloop(mk_dec, K, nbytes, "decode  (batch 16x64K)")
    timed_kloop(mk_enc, K, nbytes, "encode  (batch 16x64K)")
    timed_kloop(mk_mid, K, nbytes, "mid-enc (batch 16x64K)")


def _parse_only_kernel(cw_ref, clen_ref, n_out_ref, ok_ref):
    """Decode parse WITHOUT any output writes: measures the parse share of
    the sequence loop (copies ablated)."""
    Wc = cw_ref.shape[0]
    C = Wc * 4
    clen = clen_ref[0]

    def rd_c(p):
        p = jnp.clip(p, 0, C - 1)
        w = cw_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

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

    def cond(state):
        _, _, done = state
        return jnp.logical_not(done)

    def body(state):
        ip, op, _ = state
        hw = rd_c_word(ip)
        token = hw & 255
        ip = ip + 1
        lit_len = token >> 4
        ext0 = (hw >> 8) & 255
        lit_len, ip = jax.lax.cond(
            lit_len == 15,
            lambda: jax.lax.cond(ext0 == 255,
                                 lambda: read_varint(ip, 15),
                                 lambda: (15 + ext0, ip + 1)),
            lambda: (lit_len, ip))
        ip = ip + lit_len
        op = op + lit_len
        done = ip >= clen

        def do_match(ip, op):
            mw = rd_c_word(ip)
            ip = ip + 2
            mlen = token & 15
            mext0 = (mw >> 16) & 255
            mlen, ip = jax.lax.cond(
                mlen == 15,
                lambda: jax.lax.cond(mext0 == 255,
                                     lambda: read_varint(ip, 15),
                                     lambda: (15 + mext0, ip + 1)),
                lambda: (mlen, ip))
            return ip, op + mlen + 4

        ip, op = jax.lax.cond(done, lambda a, b: (a, b), do_match, ip, op)
        return ip, op, done | (ip >= clen)

    ip, op, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), clen <= 0))
    n_out_ref[0] = op
    ok_ref[0] = jnp.int32(1)


@functools.partial(jax.jit)
def _parse_only(comp, clen):
    return pl.pallas_call(
        _parse_only_kernel,
        out_shape=(jax.ShapeDtypeStruct((1,), I32),
                   jax.ShapeDtypeStruct((1,), I32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
    )(comp, jnp.reshape(clen, (1,)))


def exp_parse_split():
    blocks = corpus_blocks()
    comp_np = [native.compress(b) for b in blocks]
    C = BLOCK + 24
    carr = np.zeros((B, C), np.uint8)
    clens = np.zeros((B,), np.int32)
    for i, c in enumerate(comp_np):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    cw = jnp.asarray(decode_pallas.pack_words(jnp.asarray(carr)))
    clens = jnp.asarray(clens)
    K = 16

    def mk(vary):
        @jax.jit
        def f():
            def body(i, acc):
                # perturb the final (padding) word so the loop body cannot
                # be hoisted; the parser never reads past clen
                c = cw.at[:, -1].set(i) if vary else cw

                def one(args):
                    w, l = args
                    n, ok = _parse_only(w, l)
                    return n[0]

                ns = jax.lax.map(one, (c, clens))
                return acc + jnp.sum(ns)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    nbytes = B * BLOCK * K
    timed_kloop(mk, K, nbytes, "parse-only decode")


def exp_dma_overhead():
    """Issue N small VMEM->VMEM async copies from a kernel; per-copy cost."""
    N_COPIES = 256

    def kern(src_ref, dst_ref, sem):
        def body(i, _):
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(i * 128, 128)],
                dst_ref.at[pl.ds(i * 128, 128)],
                sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, N_COPIES, body, 0)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N_COPIES * 128,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(x)

    x = jnp.arange(N_COPIES * 128, dtype=jnp.float32)
    y = run(x)
    assert jnp.allclose(y, x), "DMA copy mismatch"
    K = 50

    @jax.jit
    def loop(x):
        def body(i, acc):
            y = run(x + i.astype(jnp.float32))
            return acc + y[0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    t = time.perf_counter() - t0
    per_copy = t / (K * N_COPIES)
    print(f"DMA 128-float VMEM copy: {per_copy * 1e9:.0f} ns/copy "
          f"(incl. loop overhead)")


def exp_grid():
    """Grid-batched decode: ONE pallas_call with grid=(B,) instead of a
    lax.map of B separate calls — measures per-block dispatch overhead
    and whether Mosaic accepts SMEM operands under a grid."""
    from plz4_tpu.ops.decode_pallas import _decode_kernel, pack_words

    blocks = corpus_blocks()
    comp_np = [native.compress(b) for b in blocks]
    C = BLOCK + 24
    carr = np.zeros((B, C), np.uint8)
    clens = np.zeros((B, 1), np.int32)
    for i, c in enumerate(comp_np):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i, 0] = len(c)
    cw = np.asarray(pack_words(jnp.asarray(carr)))
    Wc = C // 4
    Wo = BLOCK // 4

    @jax.jit
    def run(cw, clens):
        return pl.pallas_call(
            _decode_kernel,
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, Wo), I32),
                jax.ShapeDtypeStruct((B, 1), I32),
                jax.ShapeDtypeStruct((B, 1), I32),
            ),
            in_specs=[
                pl.BlockSpec((None, Wc), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((None, Wo), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ),
        )(jnp.asarray(cw), jnp.asarray(clens))

    try:
        ow, n, ok = run(cw, clens)
        n = np.asarray(n)
        print("grid decode lowered; n_out:", n[:4].ravel().tolist())
    except Exception as e:
        print(f"grid decode failed to lower: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return
    K = 8

    def mk(vary):
        @jax.jit
        def f():
            def body(i, acc):
                c = jnp.asarray(cw).at[:, -1].set(i) if vary                     else jnp.asarray(cw)
                _, n, _ = run(c, jnp.asarray(clens))
                return acc + jnp.sum(n)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    timed_kloop(mk, K, B * BLOCK * K, "grid decode (16x64K)")


def main():
    which = sys.argv[1:] or ["baseline", "parse", "dma"]
    plz4_tpu.enable_compile_cache()
    print("backend:", jax.default_backend())
    if "baseline" in which:
        exp_baseline()
    if "parse" in which:
        exp_parse_split()
    if "dma" in which:
        exp_dma_overhead()
    if "grid" in which:
        exp_grid()
    if "loopcost" in which:
        exp_loopcost()
    if "smem" in which:
        exp_smem_chains()
    if "bytewide" in which:
        exp_bytewide()
    if "addrfold" in which:
        exp_addrfold()
    if "callcost" in which:
        exp_callcost()
    if "condcost" in which:
        exp_condcost()
    if "bwablate" in which:
        exp_bwablate()
    if "vprims" in which:
        exp_vprims()
    if "vcopy" in which:
        exp_vcopy()




def _count_sequences(comp: bytes) -> int:
    """Host walk of an lz4 block stream: number of sequences."""
    ip, n, nseq = 0, len(comp), 0
    while ip < n:
        token = comp[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = comp[ip]
                ip += 1
                lit += b
                if b != 255:
                    break
        ip += lit
        nseq += 1
        if ip >= n:
            break
        ip += 2
        ml = token & 15
        if ml == 15:
            while True:
                b = comp[ip]
                ip += 1
                if b != 255:
                    break
    return nseq


def exp_bwablate():
    """Split the byte-wide decode kernel's per-sequence cost into parse,
    copies and branch machinery: full kernel vs parse-only (same loop +
    cond structure, copies ablated) vs cond-free branchless parse."""
    dev = jax.devices()[0]
    print("device:", dev.device_kind,
          "num_cores:", getattr(dev, "num_cores", "?"),
          "local devices:", jax.local_device_count())

    blocks = corpus_blocks()
    comp_np = [native.compress(b) for b in blocks]
    C = BLOCK + 16
    carr = np.zeros((B, C), np.int32)
    clens = np.zeros((B,), np.int32)
    for i, c in enumerate(comp_np):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    comp = jnp.asarray(carr)
    clens_j = jnp.asarray(clens)
    nseq = sum(_count_sequences(c) for c in comp_np)
    print(f"corpus: {B} x {BLOCK} blocks, {nseq} sequences "
          f"({B * BLOCK / nseq:.1f} B/seq)")

    def parse_kernel(c_ref, clen_ref, out_ref):
        Ck = c_ref.shape[0]
        clen = clen_ref[0]

        def read_varint(ip, base):
            def vc(s):
                return s[2] == 255

            def vb(s):
                t, p, _ = s
                b = c_ref[jnp.minimum(p, Ck - 1)]
                return t + b, p + 1, b

            t, p, _ = jax.lax.while_loop(vc, vb, (base, ip, jnp.int32(255)))
            return t, p

        def careful(ip, op, acc):
            token = c_ref[jnp.minimum(ip, Ck - 1)]
            ip = ip + 1
            lit = token >> 4

            def lit_ext():
                e0 = c_ref[jnp.minimum(ip, Ck - 1)]
                return jax.lax.cond(
                    e0 == 255, lambda: read_varint(ip, 15),
                    lambda: (15 + e0, ip + 1))

            lit, ip = jax.lax.cond(lit == 15, lit_ext, lambda: (lit, ip))
            ip = ip + lit
            op = op + lit
            fin = ip >= clen

            def dm(ip, op):
                off = c_ref[jnp.minimum(ip, Ck - 1)] | \
                    (c_ref[jnp.minimum(ip + 1, Ck - 1)] << 8)
                ip = ip + 2
                mlr = token & 15

                def m_ext():
                    e0 = c_ref[jnp.minimum(ip, Ck - 1)]
                    return jax.lax.cond(
                        e0 == 255, lambda: read_varint(ip, 15),
                        lambda: (15 + e0, ip + 1))

                ml, ip = jax.lax.cond(mlr == 15, m_ext, lambda: (mlr, ip))
                return ip, op + ml + 4, off

            ip, op, off = jax.lax.cond(
                fin, lambda a, b: (a, b, jnp.int32(0)), dm, ip, op)
            return (ip, op, acc + token + off,
                    (fin | (ip >= clen)).astype(I32))

        def body(s):
            ip, op, acc, _ = s
            token = c_ref[jnp.minimum(ip, Ck - 1)]
            lit = token >> 4
            mlr = token & 15
            mp = ip + 1 + lit
            fast_gate = ((ip + 20 <= clen) & (lit != 15) & (mlr != 15)
                         & (mp + 2 <= clen))

            def fast():
                off = c_ref[mp] | (c_ref[mp + 1] << 8)
                return (mp + 2, op + lit + mlr + 4, acc + token + off,
                        jnp.int32(0))

            ip, op, acc, done = jax.lax.cond(
                fast_gate, fast, lambda: careful(ip, op, acc))
            return ip, op, acc, done | (ip >= clen).astype(I32)

        ip, op, acc, _ = jax.lax.while_loop(
            lambda s: s[3] == 0, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0),
             (clen <= 0).astype(I32)))
        out_ref[0] = op
        out_ref[1] = acc

    def nocond_kernel(c_ref, clen_ref, out_ref):
        Ck = c_ref.shape[0]
        clen = clen_ref[0]

        def body(s):
            ip, op, acc = s
            token = c_ref[jnp.minimum(ip, Ck - 1)]
            lit = token >> 4
            mlr = token & 15
            mp = jnp.minimum(ip + 1 + lit, Ck - 2)
            off = c_ref[mp] | (c_ref[mp + 1] << 8)
            return mp + 2, op + lit + mlr + 4, acc + token + off

        ip, op, acc = jax.lax.while_loop(
            lambda s: s[0] < clen, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        out_ref[0] = op
        out_ref[1] = acc

    def mk(kern):
        @functools.partial(jax.jit)
        def one(args):
            c, cl = args
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8,), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(c, jnp.reshape(cl, (1,)))

        def make_fn(vary):
            K = 48

            @jax.jit
            def f():
                def kbody(i, a):
                    c = comp.at[:, C - 1].set(i & 255) if vary else comp
                    r = jax.lax.map(one, (c, clens_j))
                    return a + jnp.sum(r[:, 0])
                return jax.lax.fori_loop(0, K, kbody, jnp.int32(0))
            return f
        return make_fn

    K = 48
    nbytes = B * BLOCK * K
    for label, kern in (("parse+cond", parse_kernel),
                        ("parse-nocond", nocond_kernel)):
        tput = timed_kloop(mk(kern), K, nbytes, f"decode {label:13s}")
        ns_per_seq = (B * BLOCK / tput) / nseq * 1e9
        print(f"    -> {ns_per_seq:.1f} ns/seq")


def exp_loopcost():
    """Settle the control-flow cost contradiction: while_loop iteration cost
    as a function of body size and of INDEPENDENT work chains in the body.
    If the per-iteration floor dominates, interleaving blocks in one loop
    amortizes it."""

    def mk_kernel(n_iter, n_chains, ops_per_chain):
        def kern(x_ref, o_ref):
            def cond(s):
                return s[0] < n_iter

            def body(s):
                i = s[0]
                accs = list(s[1:])
                for c in range(n_chains):
                    a = accs[c]
                    for _ in range(ops_per_chain):
                        a = (a * 5 + i) & 0x7FFFFFF
                    accs[c] = a
                return (i + 1, *accs)

            init = (x_ref[0],) + tuple(
                x_ref[c + 1] for c in range(n_chains))
            out = jax.lax.while_loop(cond, body, init)
            acc = out[1]
            for c in range(1, n_chains):
                acc = acc + out[c + 1]
            o_ref[0] = acc
        return kern

    def run_case(n_iter, n_chains, ops_per_chain, reps=3):
        kern = mk_kernel(n_iter, n_chains, ops_per_chain)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1,), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(x)

        x = jnp.arange(1 + n_chains, dtype=I32)
        int(f(x)[0])
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            int(f(x + r)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # two-point slope to cancel dispatch overhead
    for chains, ops in [(1, 1), (1, 8), (1, 32), (2, 8), (4, 8), (8, 8),
                        (4, 32)]:
        t_lo = run_case(1 << 14, chains, ops)
        t_hi = run_case(1 << 17, chains, ops)
        per_it = (t_hi - t_lo) / ((1 << 17) - (1 << 14))
        total_ops = chains * ops
        print(f"while_loop chains={chains} ops/chain={ops}: "
              f"{per_it * 1e9:7.1f} ns/iter  "
              f"({per_it * 1e9 / total_ops:5.2f} ns/op)")


def exp_smem_chains():
    """Dependent vs independent SMEM load chains inside one loop body."""

    def mk_kernel(n_iter, n_chains, loads_per_chain, dependent):
        def kern(x_ref, o_ref):
            M = 4096

            def cond(s):
                return s[0] < n_iter

            def body(s):
                i = s[0]
                accs = list(s[1:])
                for c in range(n_chains):
                    a = accs[c]
                    for _ in range(loads_per_chain):
                        if dependent:
                            a = x_ref[(a + i) & (M - 1)]
                        else:
                            a = a + x_ref[(i + c * 7) & (M - 1)]
                    accs[c] = a
                return (i + 1, *accs)

            init = (jnp.int32(0),) + tuple(
                jnp.int32(c) for c in range(n_chains))
            out = jax.lax.while_loop(cond, body, init)
            acc = out[1]
            for c in range(1, n_chains):
                acc = acc + out[c + 1]
            o_ref[0] = acc
        return kern

    def run_case(n_iter, n_chains, loads, dependent, reps=3):
        kern = mk_kernel(n_iter, n_chains, loads, dependent)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1,), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(x)

        x = jnp.arange(4096, dtype=I32) % 4096
        int(f(x)[0])
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            int(f(x)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for chains, loads, dep in [(1, 4, True), (1, 4, False), (2, 4, True),
                               (4, 4, True), (8, 4, True), (4, 4, False)]:
        t_lo = run_case(1 << 13, chains, loads, dep)
        t_hi = run_case(1 << 16, chains, loads, dep)
        per_it = (t_hi - t_lo) / ((1 << 16) - (1 << 13))
        total = chains * loads
        print(f"smem chains={chains} loads/chain={loads} dep={int(dep)}: "
              f"{per_it * 1e9:7.1f} ns/iter ({per_it * 1e9 / total:5.2f} "
              f"ns/load)")

def _decode_bytewide_kernel(c_ref, clen_ref, o_ref, n_out_ref, ok_ref):
    """Byte-wide layout prototype: one byte per int32 element in SMEM.
    Byte loads/stores are 1 op (no shift/mask RMW), match copies are
    branchless on offset (byte-serial handles overlap naturally)."""
    C = c_ref.shape[0]
    N = o_ref.shape[0]
    clen = clen_ref[0]

    def read_varint(ip, base):
        def vcond(s):
            _, _, last = s
            return last == 255

        def vbody(s):
            total, p, _ = s
            b = c_ref[jnp.minimum(p, C - 1)]
            return total + b, p + 1, b

        total, p, _ = jax.lax.while_loop(vcond, vbody, (base, ip, 255))
        return total, p

    def cond(state):
        return jnp.logical_not(state[3])

    def body(state):
        ip, op, ok, _ = state
        bad = ip >= clen
        token = c_ref[jnp.minimum(ip, C - 1)]
        ip = ip + 1
        lit_len = token >> 4

        def lit_ext():
            e0 = c_ref[jnp.minimum(ip, C - 1)]
            return jax.lax.cond(
                e0 == 255,
                lambda: read_varint(ip, 15),
                lambda: (15 + e0, ip + 1))

        lit_len, ip = jax.lax.cond(lit_len == 15, lit_ext,
                                   lambda: (lit_len, ip))
        bad = bad | (ip + lit_len > clen) | (op + lit_len > N)
        lit_n = jnp.where(bad, 0, lit_len)

        # wild 4x-unrolled literal copy (slack: pads overwritten later)
        wild_ok = (op + lit_n + 4 <= N) & (ip + lit_n + 4 <= C)

        def lit_wild():
            def wbody(t, _):
                s = ip + t * 4
                d = op + t * 4
                o_ref[d] = c_ref[s]
                o_ref[d + 1] = c_ref[s + 1]
                o_ref[d + 2] = c_ref[s + 2]
                o_ref[d + 3] = c_ref[s + 3]
                return 0
            jax.lax.fori_loop(0, (lit_n + 3) >> 2, wbody, 0)

        def lit_safe():
            def bbody(i, _):
                o_ref[jnp.minimum(op + i, N - 1)] = \
                    c_ref[jnp.minimum(ip + i, C - 1)]
                return 0
            jax.lax.fori_loop(0, lit_n, bbody, 0)

        jax.lax.cond(wild_ok, lit_wild, lit_safe)
        ip = ip + lit_len
        op = op + lit_len
        done = (ip >= clen) | bad

        def do_match(ip, op, bad):
            off = c_ref[jnp.minimum(ip, C - 1)] | \
                (c_ref[jnp.minimum(ip + 1, C - 1)] << 8)
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlen = token & 15

            def m_ext():
                e0 = c_ref[jnp.minimum(ip, C - 1)]
                return jax.lax.cond(
                    e0 == 255,
                    lambda: read_varint(ip, 15),
                    lambda: (15 + e0, ip + 1))

            mlen, ip = jax.lax.cond(mlen == 15, m_ext, lambda: (mlen, ip))
            mlen = mlen + 4
            bad = bad | (op + mlen > N) | (off > op)
            m_n = jnp.where(bad, 0, mlen)
            src = op - off
            # off >= 4: wild 4x unroll is overlap-safe (reads trail writes
            # by >= 4). off < 4: byte-serial (handles overlap naturally).
            wild = (off >= 4) & (op + m_n + 4 <= N)

            def m_wild():
                def wbody(t, _):
                    s = src + t * 4
                    d = op + t * 4
                    o_ref[d] = o_ref[s]
                    o_ref[d + 1] = o_ref[s + 1]
                    o_ref[d + 2] = o_ref[s + 2]
                    o_ref[d + 3] = o_ref[s + 3]
                    return 0
                jax.lax.fori_loop(0, (m_n + 3) >> 2, wbody, 0)

            def m_serial():
                def bbody(i, _):
                    o_ref[jnp.minimum(op + i, N - 1)] = \
                        o_ref[jnp.minimum(jnp.maximum(src + i, 0), N - 1)]
                    return 0
                jax.lax.fori_loop(0, m_n, bbody, 0)

            jax.lax.cond(wild, m_wild, m_serial)
            return ip, op + m_n, bad

        ip, op, bad = jax.lax.cond(
            done, lambda ip, op, bad: (ip, op, bad), do_match, ip, op, bad)
        return ip, op, ok & jnp.logical_not(bad), done | bad

    ip, op, ok, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), clen > 0, clen <= 0))
    ok = ok & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


def exp_bytewide():
    """Byte-wide decode prototype vs the packed-word production kernel."""
    from plz4_tpu.ops import decode_pallas

    blocks = corpus_blocks()
    comp_np = [native.compress(b) for b in blocks]
    C = BLOCK + 24
    carr = np.zeros((B, C), np.uint8)
    clens = np.zeros((B,), np.int32)
    for i, c in enumerate(comp_np):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)

    @jax.jit
    def dec_one(c_u8, clen):
        c = c_u8.astype(I32)
        return pl.pallas_call(
            _decode_bytewide_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((BLOCK,), I32),
                jax.ShapeDtypeStruct((1,), I32),
                jax.ShapeDtypeStruct((1,), I32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
        )(c, jnp.reshape(clen, (1,)))

    # correctness first
    o, n, ok = dec_one(jnp.asarray(carr[0]), jnp.int32(clens[0]))
    out = np.asarray(o[: int(n[0])]).astype(np.uint8).tobytes()
    assert int(ok[0]) == 1 and out == blocks[0], "bytewide decode mismatch"
    print("bytewide decode: correct on block 0")

    comp = jnp.asarray(carr)
    cl = jnp.asarray(clens)
    K = 48

    def mk(vary):
        @jax.jit
        def f():
            def body(i, acc):
                c = comp.at[:, -1].set((i & 255).astype(jnp.uint8)) \
                    if vary else comp

                def one(args):
                    w, l = args
                    _, n, _ = dec_one(w, l)
                    return n[0]

                ns = jax.lax.map(one, (c, cl))
                return acc + jnp.sum(ns)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    timed_kloop(mk, K, B * BLOCK * K, "bytewide decode (16x64K)")




def exp_vprims():
    """Lowering + cost probes for the seq-table/VPU-literal-placement
    decode idea (perf_notes 'Remaining per-chip headroom'): does Mosaic
    support (a) pltpu.roll with a DYNAMIC shift, (b) dynamic-offset vector
    loads/stores on VMEM refs, (c) a vector op inside the scalar
    sequence loop without wrecking the scalar pipeline? Each probe is
    try/except — an unsupported lowering is a RESULT (it kills the
    scheme), not an error."""
    M = 4096  # i32 words (16 KiB)

    def run_case(label, kern, n_iter_lo, n_iter_hi, per_what):
        def build(n_iter):
            @jax.jit
            def f(x):
                return pl.pallas_call(
                    functools.partial(kern, n_iter=n_iter),
                    out_shape=jax.ShapeDtypeStruct((M,), I32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x)
            return f

        try:
            x = jnp.arange(M, dtype=I32) % 251
            f_lo, f_hi = build(n_iter_lo), build(n_iter_hi)
            int(jnp.sum(f_lo(x)))  # compile+run
            int(jnp.sum(f_hi(x)))
            tl = min(_t(lambda: int(jnp.sum(f_lo(x + r))))
                     for r in range(3))
            th = min(_t(lambda: int(jnp.sum(f_hi(x + r))))
                     for r in range(3))
            per = (th - tl) / (n_iter_hi - n_iter_lo)
            print(f"vprims {label}: {per * 1e9:8.1f} ns/{per_what}")
        except Exception as e:  # noqa: BLE001 - lowering failures are data
            msg = str(e).replace("\n", " ")[:160]
            print(f"vprims {label}: LOWERING/RUN FAILED: {msg}")

    # (a) dynamic-shift roll on a vector register value
    def k_roll(x_ref, o_ref, *, n_iter):
        def body(s):
            i, v = s
            v = pltpu.roll(v, i & 127, 0)
            return i + 1, v
        _, v = jax.lax.while_loop(lambda s: s[0] < n_iter, body,
                                  (jnp.int32(0), x_ref[:128]))
        o_ref[:128] = v

    run_case("dyn-roll(128xi32)", k_roll, 1 << 10, 1 << 13, "roll")

    # (b) dynamic-offset vector load + store (128-lane slice of VMEM)
    def k_dynvec(x_ref, o_ref, *, n_iter):
        def body(s):
            i, acc = s
            d = (i * 89) & (M - 1 - 128)
            v = x_ref[pl.ds(d, 128)]
            o_ref[pl.ds((i * 53) & (M - 1 - 128), 128)] = v + acc
            return i + 1, acc + 1
        _, acc = jax.lax.while_loop(lambda s: s[0] < n_iter, body,
                                    (jnp.int32(0), jnp.int32(0)))
        o_ref[pl.ds(0, 128)] = x_ref[pl.ds(0, 128)] + acc

    run_case("dyn-vec-load+store(128xi32)", k_dynvec, 1 << 10, 1 << 13,
             "copy128")

    # (c) scalar SMEM loop with one vector VMEM op mixed in per iteration:
    # marginal cost of the vector op inside a scalar-core loop
    def mk_mixed(with_vec):
        def k(xs_ref, xv_ref, o_ref, ov_ref, *, n_iter):
            def body(s):
                i, acc = s
                acc = acc + xs_ref[i & 1023]          # scalar SMEM work
                if with_vec:
                    d = (i * 89) & (M - 1 - 128)
                    ov_ref[pl.ds(d, 128)] = xv_ref[pl.ds(d, 128)] + i
                return i + 1, acc
            _, acc = jax.lax.while_loop(lambda s: s[0] < n_iter, body,
                                        (jnp.int32(0), jnp.int32(0)))
            o_ref[0] = acc
        return k

    def run_mixed(label, with_vec, n_lo, n_hi):
        def build(n_iter):
            @jax.jit
            def f(xs, xv):
                return pl.pallas_call(
                    functools.partial(mk_mixed(with_vec), n_iter=n_iter),
                    out_shape=(jax.ShapeDtypeStruct((4,), I32),
                               jax.ShapeDtypeStruct((M,), I32)),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                               pl.BlockSpec(memory_space=pltpu.VMEM)),
                )(xs, xv)
            return f

        try:
            xs = jnp.arange(1024, dtype=I32) % 17
            xv = jnp.arange(M, dtype=I32) % 251
            f_lo, f_hi = build(n_lo), build(n_hi)
            int(f_lo(xs, xv)[0][0])
            int(f_hi(xs, xv)[0][0])
            tl = min(_t(lambda: int(f_lo(xs + r, xv)[0][0]))
                     for r in range(3))
            th = min(_t(lambda: int(f_hi(xs + r, xv)[0][0]))
                     for r in range(3))
            per = (th - tl) / (n_hi - n_lo)
            print(f"vprims {label}: {per * 1e9:8.1f} ns/iter")
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:160]
            print(f"vprims {label}: LOWERING/RUN FAILED: {msg}")

    run_mixed("scalar-loop-alone", False, 1 << 12, 1 << 15)
    run_mixed("scalar-loop+vec-copy", True, 1 << 12, 1 << 15)


VLANE = 128


def _decode_vcopy_kernel(c_ref, clen_ref, cv_ref, o_ref, n_out_ref,
                         ok_ref):
    """Vector-copy decode prototype (the perf_notes '~2x decode' lever,
    realized with dynamic-offset vector slices instead of rolls): the
    scalar core parses sequences from SMEM, and EVERY output byte is
    written by a 128-lane dynamic-offset VMEM store — wild stores are
    safe because the output cursor advances monotonically, so clobbered
    tail lanes are rewritten by later sequences (buffers carry +128 lane
    padding). Literal pulls read a VMEM copy of the compressed stream
    (vector ops cannot touch SMEM). Matches: the head chunk is one
    128-lane copy from op-off (its first min(off, mlen) lanes are
    valid); small offsets then pattern-double (store at op+p reading
    from op: stored lane i is o[op+i], correct while i < p since p is a
    multiple of off) in log2 steps, and long matches continue chunked
    at distance p >= 128."""
    C = c_ref.shape[0]
    CV = cv_ref.shape[0]
    N = o_ref.shape[0]
    NP = N - VLANE  # highest legal vector-store start
    clen = clen_ref[0]

    def read_varint(ip, base):
        def vcond(s):
            return s[2] == 255

        def vbody(s):
            total, p, _ = s
            b = c_ref[jnp.minimum(p, C - 1)]
            return total + b, p + 1, b

        total, p, _ = jax.lax.while_loop(vcond, vbody, (base, ip, 255))
        return total, p

    def cond(state):
        return state[3] == 0

    def body(state):
        ip, op, ok, _ = state
        bad = ip >= clen
        token = c_ref[jnp.minimum(ip, C - 1)]
        ip = ip + 1
        lit_len = token >> 4

        def lit_ext():
            e0 = c_ref[jnp.minimum(ip, C - 1)]
            return jax.lax.cond(
                e0 == 255,
                lambda: read_varint(ip, 15),
                lambda: (15 + e0, ip + 1))

        lit_len, ip = jax.lax.cond(lit_len == 15, lit_ext,
                                   lambda: (lit_len, ip))
        bad = bad | (ip + lit_len > clen) | (op + lit_len > NP)
        lit_n = jnp.where(bad, 0, lit_len)

        def lit_copy(_):
            def wbody(t, _):
                s = jnp.minimum(ip + t * VLANE, CV - VLANE)
                d = jnp.minimum(op + t * VLANE, NP)
                o_ref[pl.ds(d, VLANE)] = cv_ref[pl.ds(s, VLANE)]
                return 0
            jax.lax.fori_loop(0, (lit_n + VLANE - 1) // VLANE, wbody, 0)
            return 0

        jax.lax.cond(lit_n > 0, lit_copy, lambda _: 0, 0)
        ip = ip + lit_len
        op = op + lit_len
        done = (ip >= clen) | bad

        def do_match(ip, op, bad):
            off = c_ref[jnp.minimum(ip, C - 1)] | \
                (c_ref[jnp.minimum(ip + 1, C - 1)] << 8)
            ip = ip + 2
            bad = bad | (ip > clen) | (off == 0)
            mlen = token & 15

            def m_ext():
                e0 = c_ref[jnp.minimum(ip, C - 1)]
                return jax.lax.cond(
                    e0 == 255,
                    lambda: read_varint(ip, 15),
                    lambda: (15 + e0, ip + 1))

            mlen, ip = jax.lax.cond(mlen == 15, m_ext, lambda: (mlen, ip))
            mlen = mlen + 4
            bad = bad | (op + mlen > NP) | (off > op)
            m_n = jnp.where(bad, 0, mlen)

            def m_copy(_):
                # head chunk: first min(off, m_n) lanes valid
                s0 = jnp.maximum(op - off, 0)
                o_ref[pl.ds(jnp.minimum(op, NP), VLANE)] = \
                    o_ref[pl.ds(jnp.minimum(s0, NP), VLANE)]

                # pattern-double the valid period to p >= min(m_n, 128)
                def dcond(p):
                    return (p < VLANE) & (p < m_n)

                def dbody(p):
                    d = jnp.minimum(op + p, NP)
                    o_ref[pl.ds(d, VLANE)] = \
                        o_ref[pl.ds(jnp.minimum(op, NP), VLANE)]
                    return p * 2

                p0 = jnp.where((off >= VLANE) | (m_n <= off),
                               jnp.maximum(off, VLANE), off)
                p = jax.lax.while_loop(dcond, dbody, p0)

                # chunked continuation at distance p (>= 128 here)
                def wbody(t, _):
                    d = jnp.minimum(op + p + t * VLANE, NP)
                    o_ref[pl.ds(d, VLANE)] = \
                        o_ref[pl.ds(jnp.maximum(d - p, 0), VLANE)]
                    return 0

                rem = jnp.maximum(m_n - p, 0)
                jax.lax.fori_loop(0, (rem + VLANE - 1) // VLANE, wbody, 0)
                return 0

            jax.lax.cond(m_n > 0, m_copy, lambda _: 0, 0)
            return ip, op + m_n, bad.astype(I32)

        # i1 in cond/while carry tuples trips the Mosaic verifier — carry
        # every flag as i32 (CLAUDE.md hazard note).
        ip, op, badi = jax.lax.cond(
            done, lambda ip, op, badi: (ip, op, badi),
            lambda ip, op, badi: do_match(ip, op, badi != 0),
            ip, op, bad.astype(I32))
        ok = jnp.where(badi != 0, 0, ok)
        return ip, op, ok, (done | (badi != 0)).astype(I32)

    ip, op, ok, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0),
                     (clen > 0).astype(I32), (clen <= 0).astype(I32)))
    ok = (ok != 0) & (ip == clen)
    n_out_ref[0] = op
    ok_ref[0] = ok.astype(I32)


def exp_vcopy():
    """Vector-copy decode prototype vs the byte-wide scalar kernel.
    Correctness on corpus blocks first (small slices in interpret mode
    off-TPU), then the two-k timing on chip."""
    interp = jax.default_backend() != "tpu"
    blocks = corpus_blocks()
    if interp:
        # interpret mode emulates every while iteration in Python —
        # validate semantics on small slices (incl. RLE + short-cycle
        # ones for the pattern-doubling path), not the 16x64K corpus
        blocks = [blocks[0][:4096],
                  (b"\x00" * 700 + blocks[1][:80]) * 3,
                  b"ab" * 500 + b"xyz" * 200 + bytes(range(256)),
                  blocks[2][:97]]
    comp_np = [native.compress(b) for b in blocks]
    C = BLOCK + 24
    CPAD = ((C + VLANE + VLANE - 1) // VLANE) * VLANE
    NPAD = BLOCK + 2 * VLANE
    nb = len(blocks)
    carr = np.zeros((nb, CPAD), np.uint8)
    clens = np.zeros((nb,), np.int32)
    for i, c in enumerate(comp_np):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)

    @jax.jit
    def dec_one(c_u8, clen):
        c = c_u8.astype(I32)
        return pl.pallas_call(
            _decode_vcopy_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((NPAD,), I32),
                jax.ShapeDtypeStruct((1,), I32),
                jax.ShapeDtypeStruct((1,), I32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            interpret=interp,
        )(c[:C], jnp.reshape(clen, (1,)), c)

    nbad = 0
    for i in range(nb):
        try:
            o, n, ok = dec_one(jnp.asarray(carr[i]), jnp.int32(clens[i]))
            out = np.asarray(o[: int(n[0])]).astype(np.uint8).tobytes()
            good = int(ok[0]) == 1 and out == blocks[i]
        except Exception as e:  # noqa: BLE001 - lowering failure is data
            print(f"vcopy decode: LOWERING/RUN FAILED: {str(e)[:200]}")
            return
        if not good:
            nbad += 1
            print(f"vcopy decode: block {i} MISMATCH "
                  f"(n={int(n[0])}, want {len(blocks[i])}, ok={int(ok[0])})")
    print(f"vcopy decode: {nb - nbad}/{nb} blocks correct "
          f"(interpret={interp})")
    if nbad or interp:
        return

    comp = jnp.asarray(carr)
    cl = jnp.asarray(clens)
    K = 48

    def mk(vary):
        @jax.jit
        def f():
            def body(i, acc):
                c = comp.at[:, -1].set((i & 255).astype(jnp.uint8)) \
                    if vary else comp

                def one(args):
                    w, l = args
                    _, n, _ = dec_one(w, l)
                    return n[0]

                ns = jax.lax.map(one, (c, cl))
                return acc + jnp.sum(ns)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return f

    timed_kloop(mk, K, B * BLOCK * K, "vcopy decode (16x64K)")


if __name__ == "__main__":
    main()
