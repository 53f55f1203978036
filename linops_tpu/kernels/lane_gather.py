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
           "tiled_combine", "lane_segsum", "lane_gather_mul_segsum",
           "lane_gather_mul_t_batched"]


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


def _rep_specs(r, blocks):
    """(shared_spec, repeated_spec) for rep-grid kernels: the grid is
    (rep, blocks); shared operands (indices, values, boundaries) are
    addressed by the block coordinate alone — ONE HBM copy serves every
    repeat (RHS column) — while repeated operands stack rep-outer."""
    shared = pl.BlockSpec((r, 128), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    repeated = pl.BlockSpec((r, 128), lambda j, i: (j * blocks + i, 0),
                            memory_space=pltpu.VMEM)
    return shared, repeated


@functools.partial(jax.jit, static_argnames=("rep", "interpret"))
def lane_gather(a, idx, rep: int = 1, interpret: bool = False):
    """out[i, l] = a[i, idx[i % R0, l]] for (rep·R0, 128) tiles over a
    shared (R0, 128) idx (rep-outer layout), idx in [0, 128)."""
    m = idx.shape[0]
    r = _tile_rows(m)
    if r == 0 or a.shape[1] != 128:
        if rep == 1:
            return jnp.take_along_axis(a, idx.astype(jnp.int32), axis=1)
        return jnp.take_along_axis(
            a.reshape(rep, m, 128), idx.astype(jnp.int32)[None], axis=2
        ).reshape(rep * m, 128)
    shared, repeated = _rep_specs(r, m // r)
    return pl.pallas_call(
        _gather_kernel,
        grid=(rep, m // r),
        in_specs=[repeated, shared],
        out_specs=repeated,
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


@functools.partial(jax.jit, static_argnames=("w", "rep", "interpret"))
def lane_gather_sum(a, idx, w: int, rep: int = 1, interpret: bool = False):
    """Fused final crossbar + width-w slot reduction: gathers lanes by idx
    then sums consecutive lane groups of w — writes 1/w of the bytes.
    a: (rep·R0, 128) rep-outer over a shared (R0, 128) idx.
    Returns (rep·R0, 128 // w)."""
    m = idx.shape[0]
    r = _tile_rows(m)
    if r == 0 or a.shape[1] != 128 or 128 % w:
        g = (jnp.take_along_axis(a, idx.astype(jnp.int32), axis=1) if rep == 1
             else jnp.take_along_axis(a.reshape(rep, m, 128),
                                      idx.astype(jnp.int32)[None],
                                      axis=2).reshape(rep * m, 128))
        return g.reshape(rep * m, 128 // w, w).sum(axis=2)
    blocks = m // r
    shared, repeated = _rep_specs(r, blocks)
    return pl.pallas_call(
        functools.partial(_gather_sum_kernel, w),
        grid=(rep, blocks),
        in_specs=[repeated, shared],
        out_specs=pl.BlockSpec((r, 128 // w), lambda j, i: (j * blocks + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rep * m, 128 // w), a.dtype),
        interpret=interpret,
    )(a, idx)


def _segsum_from_z(z, lo, hi, use_dot=True):
    """Per-window segmented lane sums via the MXU-cumsum boundary trick.

    z: (r, 128) addends whose equal-segment entries are CONTIGUOUS within
    each 128-lane window. lo/hi: (r, 128) int8 per OUTPUT lane c — the
    inclusive-prefix boundary lanes of segment c in that window:
    ``S[i, c] = cs[i, hi] - cs[i, lo]`` with cs the inclusive lane prefix
    sum; lo = (first lane of the run) - 1 or -1 when the run starts at
    lane 0; hi = last lane of the run or -1 for an empty run (-1 terms
    read as 0). Replaces a per-window one-hot selector (whose build cost
    is 128× the data) with ONE exact 0/1 MXU contraction + two lane
    gathers: the prefix matrix L[l, j] = [l <= j] is window-independent.

    Summation order differs from a direct per-segment sum (prefix then
    difference): the f32 error is bounded by the prefix magnitudes, i.e.
    ~eps·Σ|window| instead of ~eps·Σ|segment| — acceptable for the f32
    routed path (the bench matrices measure ~1e-7 rel err, same order as
    the XLA path) and sidestepped entirely on the f64 CPU reference path
    (which uses the XLA fallback in sparse/routed.py, not this kernel).
    """
    if use_dot:
        L = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ).astype(z.dtype)
        cs = jax.lax.dot_general(
            z, L, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=z.dtype)  # inclusive prefix along lanes
    else:  # XLA fallback (CPU f64 reference path); supports leading dims
        cs = jnp.cumsum(z, axis=-1)
    lo_i = lo.astype(jnp.int32)
    hi_i = hi.astype(jnp.int32)
    bcast = jnp.broadcast_shapes(cs.shape, lo_i.shape)
    cs = jnp.broadcast_to(cs, bcast)
    hi_g = jnp.take_along_axis(cs, jnp.broadcast_to(jnp.maximum(hi_i, 0),
                                                    bcast), axis=-1)
    lo_g = jnp.take_along_axis(cs, jnp.broadcast_to(jnp.maximum(lo_i, 0),
                                                    bcast), axis=-1)
    zero = jnp.zeros((), z.dtype)
    return jnp.where(hi_i >= 0, hi_g, zero) - jnp.where(lo_i >= 0, lo_g, zero)


def _segsum_kernel(q_ref, lo_ref, hi_ref, o_ref):
    o_ref[...] = _segsum_from_z(q_ref[...], lo_ref[...], hi_ref[...])


@functools.partial(jax.jit, static_argnames=("rep", "interpret"))
def lane_segsum(q, lo, hi, rep: int = 1, interpret: bool = False):
    """S[i, c] = sum of the c-th contiguous lane segment of window i.

    q: (rep·R0, 128) addends, rep-outer over shared (R0, 128) int8
    boundary arrays (see ``_segsum_from_z``). Returns (rep·R0, 128)."""
    m = lo.shape[0]
    r = min(_tile_rows(m), 2048)
    if r == 0 or q.shape[1] != 128:
        if rep == 1:
            return _segsum_from_z(q, lo, hi, use_dot=False)
        S = _segsum_from_z(q.reshape(rep, m, 128), lo[None], hi[None],
                           use_dot=False)
        return S.reshape(rep * m, 128)
    shared, repeated = _rep_specs(r, m // r)
    return pl.pallas_call(
        _segsum_kernel,
        grid=(rep, m // r),
        in_specs=[repeated, shared, shared],
        out_specs=repeated,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, lo, hi)


def _gather_mul_segsum_kernel(a_ref, idx_ref, v_ref, lo_ref, hi_ref, o_ref):
    g = jnp.take_along_axis(a_ref[...], idx_ref[...].astype(jnp.int32), axis=1)
    z = (v_ref[...] * g).astype(o_ref.dtype)
    o_ref[...] = _segsum_from_z(z, lo_ref[...], hi_ref[...])


@functools.partial(jax.jit, static_argnames=("rep", "interpret"))
def lane_gather_mul_segsum(a, idx, vals, lo, hi, rep: int = 1,
                           interpret: bool = False):
    """Fused final stage of the DERIVED-TRANSPOSE routed pipeline:
    z = a gathered by idx (the G1 inverse) times vals (pre-G1 values),
    then per-window contiguous-segment sums (per local column). a is
    rep-outer over the shared idx/vals/lo/hi. Returns (rep·R0, 128).
    Five VMEM inputs → row tile capped at 1024 so the double-buffered
    program stays within the pipeline budget."""
    m = idx.shape[0]
    out_dtype = jnp.result_type(vals.dtype, a.dtype)
    r = min(_tile_rows(m), 1024)
    if r == 0 or a.shape[1] != 128:
        if rep == 1:
            g = jnp.take_along_axis(a, idx.astype(jnp.int32), axis=1)
            return _segsum_from_z((vals * g).astype(out_dtype), lo, hi,
                                  use_dot=False)
        g = jnp.take_along_axis(a.reshape(rep, m, 128),
                                idx.astype(jnp.int32)[None], axis=2)
        S = _segsum_from_z((vals[None] * g).astype(out_dtype), lo[None],
                           hi[None], use_dot=False)
        return S.reshape(rep * m, 128)
    shared, repeated = _rep_specs(r, m // r)
    return pl.pallas_call(
        _gather_mul_segsum_kernel,
        grid=(rep, m // r),
        in_specs=[repeated, shared, shared, shared, shared],
        out_specs=repeated,
        out_shape=jax.ShapeDtypeStruct((rep * m, 128), out_dtype),
        interpret=interpret,
    )(a, idx, vals.astype(out_dtype), lo, hi)


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


@functools.partial(jax.jit, static_argnames=("C", "m", "rep", "interpret"))
def lane_gather_mul_t_batched(xw, idx, vals, C: int, m: int, rep: int = 1,
                              interpret: bool = False):
    """Batched-over-chunks phase-1 with per-chunk TRANSPOSED output.

    idx/vals: (C·m, 128) flat stacked chunks (shared); xw: (rep·C·m, 128)
    rep-outer (one repeat per RHS column). Returns (rep·C·128, m) where
    rows [(j·C + c)·128, ...) hold repeat j / chunk c's (128, m)
    transposed products — the W1 wiring of each chunk's 5-stage route is
    then a free reshape. One kernel call covers ALL chunks and repeats
    (grid = (rep, C, m//r)), so multi-chunk/multi-RHS applies keep
    single-chunk program-switch economics."""
    out_dtype = jnp.result_type(vals.dtype, xw.dtype)
    r = _tile_rows(m)
    if r == 0 or xw.shape[1] != 128:
        if rep == 1:
            g = jnp.take_along_axis(xw, idx.astype(jnp.int32), axis=1)
            z = (vals * g).astype(out_dtype)
        else:
            g = jnp.take_along_axis(xw.reshape(rep, C * m, 128),
                                    idx.astype(jnp.int32)[None], axis=2)
            z = (vals[None] * g).astype(out_dtype)
        return z.reshape(rep * C, m, 128).transpose(0, 2, 1).reshape(
            rep * C * 128, m)
    blocks = m // r
    return pl.pallas_call(
        _gather_mul_t_kernel,
        grid=(rep, C, blocks),
        in_specs=[
            pl.BlockSpec((r, 128),
                         lambda j, c, i: ((j * C + c) * blocks + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 128), lambda j, c, i: (c * blocks + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 128), lambda j, c, i: (c * blocks + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, r), lambda j, c, i: (j * C + c, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rep * C * 128, m), out_dtype),
        interpret=interpret,
    )(xw, idx, vals)


@functools.partial(jax.jit, static_argnames=("rep", "interpret"))
def lane_gather_mul(xw, idx, vals, rep: int = 1, interpret: bool = False):
    """out[i, l] = vals[i % R0, l] * xw[i, idx[i % R0, l]] — the phase-1
    fused gather+multiply (xw = per-window x blocks, rep-outer over the
    shared idx/vals; idx = col % 128)."""
    m = idx.shape[0]
    out_dtype = jnp.result_type(vals.dtype, xw.dtype)
    r = _tile_rows(m)
    if r == 0 or xw.shape[1] != 128:
        if rep == 1:
            g = jnp.take_along_axis(xw, idx.astype(jnp.int32), axis=1)
            return (vals * g).astype(out_dtype)
        g = jnp.take_along_axis(xw.reshape(rep, m, 128),
                                idx.astype(jnp.int32)[None], axis=2)
        return (vals[None] * g).astype(out_dtype).reshape(rep * m, 128)
    shared, repeated = _rep_specs(r, m // r)
    return pl.pallas_call(
        _gather_mul_kernel,
        grid=(rep, m // r),
        in_specs=[repeated, shared, shared],
        out_specs=repeated,
        out_shape=jax.ShapeDtypeStruct(xw.shape, out_dtype),
        interpret=interpret,
    )(xw, idx, vals)
