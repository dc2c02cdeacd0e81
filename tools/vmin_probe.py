"""Minimal Mosaic lowering probes for the vector-copy decode scheme.

The round-3 on-chip session showed every kernel containing a
dynamic-offset vector slice (pl.ds with a traced start) or a
dynamic-shift pltpu.roll crashes the axon remote compile helper with an
opaque HTTP 500 (tpu_compile_helper subprocess exit 1) — no Mosaic
diagnostic survives the tunnel. This script ascends construct by
construct to find the exact killer:

  s0  static-offset vector load+store       (control — must pass)
  s1  loop-carried vector value             (control)
  d0  dynamic-offset vector LOAD, static store
  d1  static load, dynamic-offset vector STORE
  d2  dynamic load + dynamic store
  r0  pltpu.roll static shift
  r1  pltpu.roll dynamic shift

Each case is try/except: a crash is a RESULT. Run on chip:
    python tools/vmin_probe.py
"""
import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
M = 4096


def run(label, kern, shape=(M,)):
    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    try:
        x = (jnp.arange(M, dtype=I32) % 251).reshape(shape)
        r = int(jnp.sum(f(x)))
        print(f"{label}: OK (sum={r})")
    except Exception as e:  # noqa: BLE001 - lowering failure is data
        print(f"{label}: FAILED: {str(e)[:150]}".replace("\n", " "))


def k_s0(x_ref, o_ref):
    def body(i, _):
        o_ref[pl.ds(0, 128)] = x_ref[pl.ds(0, 128)] + i
        return 0
    jax.lax.fori_loop(0, 4, body, 0)


def k_s1(x_ref, o_ref):
    def body(i, v):
        return v + x_ref[pl.ds(128, 128)]
    o_ref[pl.ds(0, 128)] = jax.lax.fori_loop(
        0, 4, body, x_ref[pl.ds(0, 128)])


def mk_dyn(dload, dstore, width=128):
    # Mosaic tiles 1-D memrefs at (1024): slice SHAPES must be multiples
    # of 1024 (measured: width=128 in VMEM hangs the remote compiler;
    # via async_copy it errors "must be aligned to tiling (1024)").
    def k(x_ref, o_ref):
        def body(i, _):
            s = (i * width) & (M - 1 - width) if dload else 0
            d = ((i + 1) * width) & (M - 1 - width) if dstore else 0
            o_ref[pl.ds(d, width)] = x_ref[pl.ds(s, width)] + i
            return 0
        jax.lax.fori_loop(0, 2, body, 0)
    return k


def mk_roll(dyn):
    def k(x_ref, o_ref):
        def body(i, v):
            return pltpu.roll(v, (i & 127) if dyn else 7, 0)
        o_ref[pl.ds(0, 128)] = jax.lax.fori_loop(
            0, 4, body, x_ref[pl.ds(0, 128)])
    return k


def k_row(x_ref, o_ref):
    # 2-D refs (rows of 128 lanes): dynamic ROW index, (1,128) slice —
    # the chunked-output formulation's required primitive.
    def body(i, _):
        r = (i * 7) & (M // 128 - 1)
        o_ref[pl.ds(r, 1), :] = x_ref[pl.ds(r, 1), :] + i
        return 0
    jax.lax.fori_loop(0, 2, body, 0)


def k_row8(x_ref, o_ref):
    # 3-D refs ((rows, 8, 128)): dynamic index on the leading UNTILED
    # dim, full (8,128) tile slice — must be legal per the tiling rule.
    def body(i, _):
        r = (i * 3) & (M // 1024 - 1)
        o_ref[pl.ds(r, 1), :, :] = x_ref[pl.ds(r, 1), :, :] + i
        return 0
    jax.lax.fori_loop(0, 2, body, 0)


def main():
    which = sys.argv[1:] or ["s0", "s1", "d1024", "row", "r0", "r1"]
    print("backend:", jax.default_backend())
    if "s0" in which:
        run("s0 static ds load+store", k_s0)
    if "s1" in which:
        run("s1 loop-carried vector", k_s1)
    if "d128" in which:  # known: hangs the remote compiler — opt-in
        run("d128 dyn 128-elt load", mk_dyn(True, False))
    if "d1024" in which:
        run("d1024 dyn 1024-elt load+store", mk_dyn(True, True, 1024))
    if "row" in which:
        run("row dyn (1,128) 2-D slice", k_row, (M // 128, 128))
        run("row8 dyn (1,8,128) 3-D slice", k_row8, (M // 1024, 8, 128))
    if "r0" in which:
        run("r0 roll static shift", mk_roll(False))
    if "r1" in which:
        run("r1 roll dynamic shift", mk_roll(True))


if __name__ == "__main__":
    main()
