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

__all__ = ["lane_gather", "lane_gather_mul", "lane_gather_sum",
           "tiled_combine"]


def _tile_rows(m: int) -> int:
    """Largest power-of-two row-tile (≤ 4096) dividing m. At r=4096 f32
    the 3-input kernels carry in+idx(int8)+vals+out = 6.5 MB per program,
    ~13 MB double-buffered — near the 16 MB v5e VMEM bound, so any new
    kernel input must shrink r (measured faster than r=2048 on-chip)."""
    for r in (4096, 2048, 1024, 512, 256, 128):
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


_TILED_SEG = 2048  # lanes per in-kernel select segment (bounds VMEM)


_TILES_PER_PROGRAM = 8  # Mosaic needs block sublane counts divisible by 8


def _tiled_combine_kernel(q_ref, rid_ref, o_ref):
    """Per-row-tile combine: o[t, i] = Σ_k q[t, k]·[rid[t, k] == i] for 8
    tiles of 128 rows each. rid is the row-within-tile of each sub-row
    slot (-1 = trash); slots of a tile are contiguous by construction
    (sparse/routed.py pack), so this replaces a scatter with an exact
    one-hot MXU contraction (measured faster than the VPU compare-select
    form: 35 vs 44 µs at the bench shape)."""
    K = q_ref.shape[1]
    for g in range(_TILES_PER_PROGRAM):
        acc = jnp.zeros((128, 1), q_ref.dtype)
        for s in range(0, K, _TILED_SEG):
            e = min(s + _TILED_SEG, K)
            rid = rid_ref[g:g + 1, s:e].astype(jnp.int32)    # (1, seg)
            sel = (rid == jax.lax.broadcasted_iota(jnp.int32, (128, e - s), 0)
                   ).astype(q_ref.dtype)
            acc = acc + jax.lax.dot_general(
                sel, q_ref[g:g + 1, s:e], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=q_ref.dtype)
        o_ref[g * 128:(g + 1) * 128, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def tiled_combine(q, rowid, interpret: bool = False):
    """Sub-row partials -> per-row sums over 128-row tiles.

    q: (T·K,) partials, tile t owning slots [t·K, (t+1)·K); rowid: (T, K)
    int8 row-within-tile per slot (-1 = trash), T a multiple of 8 (pack
    pads with trash tiles). Returns (T·128,) row sums. An XLA segment_sum
    here measures ~0.1 G elem/s (sorted scatter); this kernel is a
    compare-select reduction at VPU rate."""
    T, K = rowid.shape
    G = _TILES_PER_PROGRAM
    return pl.pallas_call(
        _tiled_combine_kernel,
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((G, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * 128, 1), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * 128, 1), q.dtype),
        interpret=interpret,
    )(q.reshape(T, K), rowid).reshape(-1)


def _gather_sum_kernel(w, x_ref, idx_ref, o_ref):
    a = jnp.take_along_axis(x_ref[...], idx_ref[...].astype(jnp.int32), axis=1)
    # lane-group sum via an exact one-hot MXU contraction (no relayout):
    # S[l, j] = 1 iff l // w == j; out = a · S
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128 // w), 0) // w
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128 // w), 1)
    ).astype(a.dtype)
    o_ref[...] = jax.lax.dot_general(
        a, sel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def lane_gather_sum(a, idx, w: int, interpret: bool = False):
    """Fused final crossbar + width-w slot reduction: gathers lanes by idx
    then sums consecutive lane groups of w — writes 1/w of the bytes.
    Returns (m, 128 // w)."""
    m = a.shape[0]
    r = _tile_rows(m)
    if r == 0 or a.shape[1] != 128 or 128 % w:
        g = jnp.take_along_axis(a, idx.astype(jnp.int32), axis=1)
        return g.reshape(m, 128 // w, w).sum(axis=2)
    return pl.pallas_call(
        functools.partial(_gather_sum_kernel, w),
        grid=(m // r,),
        in_specs=[_specs(r), _specs(r)],
        out_specs=pl.BlockSpec((r, 128 // w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128 // w), a.dtype),
        interpret=interpret,
    )(a, idx)


def _gather_mul_t_kernel(x_ref, idx_ref, v_ref, o_ref):
    g = jnp.take_along_axis(x_ref[...], idx_ref[...].astype(jnp.int32), axis=1)
    o_ref[...] = (v_ref[...] * g).astype(o_ref.dtype).T


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_gather_mul_t(xw, idx, vals, interpret: bool = False):
    """Phase-1 fused gather·multiply with TRANSPOSED output (128, m):
    the W1 wiring of the 5-stage route is then a free reshape
    ((128, m).reshape(128·B, 128) is the same flat layout), saving one
    full-array XLA transpose per apply."""
    m = xw.shape[0]
    out_dtype = jnp.result_type(vals.dtype, xw.dtype)
    r = _tile_rows(m)
    if r == 0 or xw.shape[1] != 128:
        g = jnp.take_along_axis(xw, idx.astype(jnp.int32), axis=1)
        return (vals * g).astype(out_dtype).T
    return pl.pallas_call(
        _gather_mul_t_kernel,
        grid=(m // r,),
        in_specs=[_specs(r), _specs(r), _specs(r)],
        out_specs=pl.BlockSpec((128, r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, m), out_dtype),
        interpret=interpret,
    )(xw, idx, vals)


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
