"""Probe Mosaic lowering support for per-lane gathers inside pallas TPU
kernels. Each probe compiles (and runs once) a tiny kernel; failures are
caught and reported. This gates the SIMD-across-blocks decoder design:
one LZ4 block per lane needs, per step, a per-lane load at a per-lane
byte cursor (a gather along the sublane/row axis of a VMEM-resident
(rows, lanes) tile).
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import plz4_tpu  # noqa: F401  (compile cache)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

plz4_tpu.enable_compile_cache()


def probe(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {np.asarray(out).ravel()[:4].tolist()}")
    except Exception as e:
        msg = str(e).replace(chr(10), " ")[:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


R, L = 256, 128


def mk_inputs():
    x = jnp.arange(R * L, dtype=jnp.int32).reshape(R, L)
    idx = (jnp.arange(L, dtype=jnp.int32)[None, :] * 7 + 3) % R
    idx = jnp.broadcast_to(idx, (8, L))
    return x, idx


def p_take_sublane():
    """gather along axis 0 (sublanes): out[i, l] = x[idx[i, l], l]."""
    x, idx = mk_inputs()

    def k(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
    )(x, idx)


def p_take_lane():
    """gather along axis 1 (lanes): out[r, j] = x[r, idx[r, j]]."""
    x, _ = mk_inputs()
    idx = (jnp.arange(L, dtype=jnp.int32)[None, :] * 5 + 1) % L
    idx = jnp.broadcast_to(idx, (R, L))

    def k(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
    )(x, idx)


def p_dyn_roll():
    """roll by a traced (dynamic) amount."""
    x, _ = mk_inputs()

    def k(x_ref, o_ref):
        amt = x_ref[0, 0] & 7
        o_ref[...] = pltpu.roll(x_ref[...], amt, 1)

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
    )(x)


def p_one_hot_matmul():
    """gather via one-hot matmul on the MXU (fallback universal gather):
    out[i, l] = sum_r onehot[i, r] * x[r, l]."""
    x, idx = mk_inputs()

    def k(x_ref, i_ref, o_ref):
        oh = (i_ref[...][:, :, None] ==
              jnp.arange(R, dtype=jnp.int32)[None, None, :])
        # (8, L, R) x (R, L) -> contract r per lane: einsum 'ilr,rl->il'
        o_ref[...] = jnp.einsum(
            "ilr,rl->il", oh.astype(jnp.float32),
            x_ref[...].astype(jnp.float32)).astype(jnp.int32)

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
    )(x, idx)


def p_scatter_lane():
    """per-lane scatter: o[idx[i,l], l] = x[i, l] via .at[].set."""
    x, idx = mk_inputs()

    def k(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.zeros((R, L), jnp.int32).at[
            i_ref[...], jnp.broadcast_to(jnp.arange(L), (8, L))
        ].set(x_ref[:8, :])

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
    )(x, idx)


def main():
    print("backend:", jax.default_backend(), "jax", jax.__version__)
    probe("take_along_axis sublane (8,128 idx into 256,128)", p_take_sublane)
    probe("take_along_axis lane", p_take_lane)
    probe("dynamic roll amount", p_dyn_roll)
    probe("one-hot matmul gather", p_one_hot_matmul)
    probe("per-lane scatter .at[].set", p_scatter_lane)


if __name__ == "__main__":
    main()
