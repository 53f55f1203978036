"""Pallas lane-gather kernels — the crossbar primitive of the Clos-routed
unstructured SpMV path (sparse/routing.py, sparse/routed.py).

The TPU VPU supports a *lane-wise dynamic gather*: permuting each 128-lane
row of a tile by per-row indices (``jnp.take_along_axis(..., axis=1)``)
lowers to a single Mosaic op measured at ~49 G elem/s on v5e
(tools/probe_gather2.py case B). Per-element movement across sublanes does
NOT exist as a primitive — axis-0 gathers are rejected by Mosaic and the
XLA fallback runs 3 orders slower. The routed SpMV pipeline therefore
expresses ALL data movement as lane gathers, with the cross-window wirings
done by XLA transposes (dedicated transpose unit, HBM bandwidth).

The reference has no counterpart: its unstructured SpMV is delegation to
SparseArrays CSC mul! (reference: src/constructors.jl:25-27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lane_gather", "lane_gather_mul"]


def _tile_rows(m: int) -> int:
    """Largest power-of-two row-tile (≤ 2048) dividing m."""
    for r in (2048, 1024, 512, 256, 128):
        if m % r == 0:
            return r
    return 0


def _gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...].astype(jnp.int32), axis=1)


def _gather_mul_kernel(x_ref, idx_ref, v_ref, o_ref):
    g = jnp.take_along_axis(x_ref[...], idx_ref[...].astype(jnp.int32), axis=1)
    o_ref[...] = (v_ref[...] * g).astype(o_ref.dtype)


def _specs(r):
    return pl.BlockSpec((r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_gather(a, idx, interpret: bool = False):
    """out[i, l] = a[i, idx[i, l]] for (m, 128) tiles, idx in [0, 128)."""
    m = a.shape[0]
    r = _tile_rows(m)
    if r == 0 or a.shape[1] != 128:
        return jnp.take_along_axis(a, idx.astype(jnp.int32), axis=1)
    return pl.pallas_call(
        _gather_kernel,
        grid=(m // r,),
        in_specs=[_specs(r), _specs(r)],
        out_specs=_specs(r),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=interpret,
    )(a, idx)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_gather_mul(xw, idx, vals, interpret: bool = False):
    """out[i, l] = vals[i, l] * xw[i, idx[i, l]] — the phase-1 fused
    gather+multiply (xw = per-window x blocks, idx = col % 128)."""
    m = xw.shape[0]
    out_dtype = jnp.result_type(vals.dtype, xw.dtype)
    r = _tile_rows(m)
    if r == 0 or xw.shape[1] != 128:
        g = jnp.take_along_axis(xw, idx.astype(jnp.int32), axis=1)
        return (vals * g).astype(out_dtype)
    return pl.pallas_call(
        _gather_mul_kernel,
        grid=(m // r,),
        in_specs=[_specs(r), _specs(r), _specs(r)],
        out_specs=_specs(r),
        out_shape=jax.ShapeDtypeStruct(xw.shape, out_dtype),
        interpret=interpret,
    )(xw, idx, vals)
