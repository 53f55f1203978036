"""Pallas TPU kernels: BSR SpMV (block-sparse matrix · vector), fwd + transpose.

The XLA fallback (sparse/ops.py) lowers ``x[block_cols]`` + einsum; for
small blocks (8×128) the fine-grained gather caps it at ~0.70 of the HBM
roofline (round-1 bench). These kernels keep x fully VMEM-resident and
stream only the block values from HBM — the speed-of-light traffic for
SpMV (BASELINE.md: ≥80% roofline nnz/s).

Design (v4; earlier iterations documented for the record — v1's per-block
scalar-indexed MXU dots ran ~20× slower than XLA; v2/v3's in-kernel
relayout reshapes crashed the Mosaic compiler):

- Grid over groups of R block-rows; each step streams one ~1 MB tile of
  blocks through the Pallas pipeline (auto double-buffered DMA). Inputs
  are pre-flattened HOST-side to ``(nbrow·kmax, bm, bn)`` /
  ``(nbrow·kmax, 1)`` so the kernel body needs NO reshapes (Mosaic's
  sublane↔lane relayout reshapes are the crash trigger).
- The x gather is VECTORIZED as a one-hot contraction: build
  ``sel[(r,k), c] = (block_cols[r,k] == c)`` with broadcasted_iota and
  contract it with the VMEM-resident x on the MXU — zero scalar loads,
  zero dynamic slices. The 0/1 selector is exact in one bf16 pass, so a
  manual hi/mid/lo split of x gives f32-exactness in 3 DEFAULT passes
  (half the MXU cost of uniform HIGHEST): measured 707 GB/s f32-exact at
  the bench shape, rel err 1.2e-7 vs an f64 oracle (the XLA f32 path
  itself sits at 2.2e-7).
- The block contraction is elementwise multiply + lane reduction on the
  VPU (native f32 — no MXU truncation); the per-row k-sum is a SECOND
  exact 0/1 selector dot (``group[r, (r',k)] = (r' == r)``), again
  avoiding any reshape.
- bf16 block storage halves the stored bytes, but with bm < 16 each
  (bm, 128) slab occupies only half of the native bf16 (16, 128) Mosaic
  tile, so the DMA sees no byte savings (measured: 8×128 bf16 runs at
  f32 speed). Use bm ≥ 16 blocks to realize the 2× from bf16.
- For larger x (one-hot width is O(nbcol) per tile) a "loop" variant
  gathers x rows by scalar index instead; beyond the VMEM bound callers
  fall back to the XLA path.
- Transpose mode scatters per-block contributions back through a
  pre-oriented ``(nbcol, RK)`` one-hot selector (standard matmul dims —
  contracting dim 0 of the forward-oriented selector crashes Mosaic at
  nbcol ≳ 512), accumulating into a VMEM-resident output across
  sequential grid steps. The pre-orientation makes the forward 3-pass
  split legal here too, but the kernel is DMA-bound and HIGHEST measured
  marginally faster at the bench shape (689 vs 678 GB/s), so HIGHEST is
  kept for f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "bsr_matvec_pallas",
    "bsr_matvec_pallas_windowed",
    "bsr_rmatvec_pallas",
    "bsr_rmatvec_pallas_windowed",
    "bsr_matvec_pallas_multiwin",
    "bsr_rmatvec_pallas_multiwin",
    "bsr_window_plan",
    "bsr_window_plan_multi",
    "bsr_window_plan_multi_t",
    "bsr_pallas_rows_per_program",
    "BSR_PALLAS_MAX_X_ELEMS",
    "BSR_PALLAS_MAX_WINDOW_BLOCKS",
    "BSR_PALLAS_ONEHOT_MAX_NBCOL",
]

BSR_PALLAS_MAX_X_ELEMS = 2_000_000  # x must be VMEM-resident (~8 MB f32)
# One-hot gather cost scales with nbcol (3*RK*nbcol*bn madds per tile at
# HIGHEST): at R=128/kmax=8 the selector dot stays hidden under the block
# DMA up to nbcol ~1024; beyond that the XLA gather path wins again.
BSR_PALLAS_ONEHOT_MAX_NBCOL = 1024
# Per-step block-tile byte target: R is chosen so one (R·kmax, bm, bn)
# tile is ~4 MB (measured on v5e at the bench shape, kmax=8/bm=8/bn=128:
# R=32 -> 574, R=64 -> 653, R=128 -> 688 GB/s values-only; the kernel is
# DMA-bound from R=64 up). Larger kmax/blocks get proportionally fewer
# rows per step so the double-buffered tiles stay within VMEM.
_TILE_BYTES_TARGET = 4 * 1024 * 1024

# f32 x side must not be truncated on the MXU; the 0/1 selector side is
# exact in any split. (Mosaic rejects per-operand precision.)
_GATHER_PRECISION = jax.lax.Precision.HIGHEST


def bsr_pallas_rows_per_program(bm: int, kmax: int = 8, bn: int = 128,
                                itemsize: int = 4) -> int:
    """Block-rows per grid step (callers pad nbrow to a multiple): the
    largest multiple of 8 in [8, 128] keeping one block tile near the
    ~4 MB pipeline target — snapped to a multiple of
    ``lcm(8, 128/gcd(kmax, 128))`` so the lane-major (1, R·kmax) cols
    block is 128-lane divisible. Mosaic REJECTS specs whose last dim is
    neither 128-divisible nor the full array dim (caught on-chip,
    tools/tpu_r5_batch16.py — interpret mode does not enforce it), and
    every grid with more than one step hits that rule."""
    import math

    per_row = max(kmax * bm * bn * itemsize, 1)
    r = _TILE_BYTES_TARGET // per_row
    m = 128 // math.gcd(int(kmax), 128)
    m = (8 * m) // math.gcd(8, m)  # lcm(8, m): sublane rule too
    r = int(max(8, min(128, (r // 8) * 8)))
    return int(max(m, (r // m) * m))


def _onehot_gather_offset(cols_ref, x_ref, out_dtype, fast: bool,
                          col_offset):
    """One-hot gather against a WINDOW of x: matches block-cols in
    [col_offset, col_offset + window); out-of-window cols contribute
    nothing (their selector rows are all-zero), so summing the gathers of
    adjacent windows reconstructs the full-x gather exactly.

    ``cols_ref`` may be (RK, 1) or LANE-MAJOR (1, RK): a (RK, 1) int32
    array is 128×-lane-padded in HBM (TPU tiled layout pads the minor
    dim), streaming ~0.5 MB of padding per grid step at the windowed
    bench shape; lane-major storage pads only 8× in sublanes and the
    in-kernel transpose is a ~4 KB relayout (bit-identical, measured
    tools/tpu_r4_batch4.py)."""
    c = cols_ref[...]
    if c.shape[0] == 1:
        c = c.T
    RK = c.shape[0]
    wb = x_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (RK, wb), 1) + col_offset
    sel = (ids == c).astype(x_ref.dtype)

    def dot(m):
        return jax.lax.dot_general(
            sel, m, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=out_dtype,
        )

    x = x_ref[...]
    x_hi = x.astype(jnp.bfloat16).astype(x.dtype)
    r1 = x - x_hi
    x_mid = r1.astype(jnp.bfloat16).astype(x.dtype)
    out = dot(x_hi) + dot(x_mid)
    if fast:
        return out
    x_lo = r1 - x_mid
    return out + dot(x_lo)


def _onehot_gather(cols_ref, x_ref, out_dtype, fast: bool):
    """xg[(r,k), :] = x[block_cols[r,k], :] as a one-hot MXU contraction.

    The 0/1 selector is exact in a SINGLE bf16 pass, so only the x operand
    needs splitting — a manual bf16 hi/mid/lo decomposition (24 mantissa
    bits = 3×8) reconstructs x f32-exactly in THREE DEFAULT passes, half
    the MXU cost of uniform HIGHEST (which splits both operands).

    ``fast=True`` drops the lo term (TWO passes, ~16 mantissa bits ≈ 1e-5
    relative) — at the bench shape both variants are DMA-bound, the fast
    one with a little more headroom.
    """
    return _onehot_gather_offset(cols_ref, x_ref, out_dtype, fast, 0)


def _group_ksum(z, kmax, out_dtype):
    """Per-row k-sum of a (RK, bm) block-contribution tile via a second
    exact 0/1 selector: group[r, (r',k)] = (r' == r)."""
    RK = z.shape[0]
    R = RK // kmax
    row_of = jax.lax.broadcasted_iota(jnp.int32, (R, RK), 1) // kmax
    group = (row_of == jax.lax.broadcasted_iota(jnp.int32, (R, RK), 0)).astype(
        z.dtype
    )
    return jax.lax.dot_general(
        group, z, (((1,), (0,)), ((), ())),
        precision=_GATHER_PRECISION,
        preferred_element_type=out_dtype,
    )  # (R, bm)


def _fwd_kernel_onehot(kmax: int, fast: bool, t_out: bool, cols_ref, x_ref,
                       blocks_ref, y_ref):
    RK, bm, bn = blocks_ref.shape  # RK = R*kmax, flattened host-side
    # accumulators are ALWAYS f32: Mosaic rejects bf16 matmul
    # accumulators ('matmul acc must be 32-bit'); a bf16 y_ref gets one
    # cast at the store
    xg = _onehot_gather(cols_ref, x_ref, jnp.float32, fast)  # (RK, bn)
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)  # (RK, bm), VPU
    y = _group_ksum(z, kmax, jnp.float32).astype(y_ref.dtype)
    y_ref[...] = y.T if t_out else y


def _fwd_kernel_loop(kmax: int, cols_ref, x_ref, blocks_ref, y_ref):
    RK, bm, bn = blocks_ref.shape
    R = RK // kmax

    def row(r, _):
        acc = blocks_ref[r * kmax] * x_ref[cols_ref[r * kmax, 0]]
        for k in range(1, kmax):  # kmax is static
            acc = acc + blocks_ref[r * kmax + k] * x_ref[cols_ref[r * kmax + k, 0]]
        y_ref[r, :] = jnp.sum(acc, axis=1)  # (bm,)
        return 0

    jax.lax.fori_loop(0, R, row, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "variant", "t_out"))
def bsr_matvec_pallas(blocks, block_cols, x_blocks, *, interpret=False,
                      variant="auto", t_out=False):
    """y_blocks (nbrow, bm) = BSR @ x_blocks (nbcol, bn).

    ``blocks``: (nbrow, kmax, bm, bn) in natural storage layout; nbrow must
    be a multiple of ``bsr_pallas_rows_per_program(bm)`` (callers pad).
    ``x_blocks`` must fit VMEM (≤ ``BSR_PALLAS_MAX_X_ELEMS`` entries) —
    callers fall back to the XLA path beyond that.

    ``t_out=True`` returns y TRANSPOSED as (bm, nbrow): a (nbrow, bm<16)
    f32 out array is 128/bm-lane-padded in HBM, so the padded write plus
    the host relayout to a flat vector cost more than the whole kernel
    saves at small kmax (measured 443 vs 626 GB/s at the windowed bench
    shape); the transposed form is fully packed and the host-side
    ``out.T.reshape(-1)`` is one packed XLA transpose. In-kernel
    cross-lane ``reshape`` does NOT compile in Mosaic — ``.T`` does
    (tools/tpu_r4_batch6/7.py).
    """
    nbrow, kmax, bm, bn = blocks.shape
    nbcol = x_blocks.shape[0]
    R = bsr_pallas_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize)
    if nbrow % R != 0:
        raise ValueError(f"nbrow={nbrow} must be a multiple of {R} (pad the BSR)")
    dtype = jnp.result_type(blocks.dtype, x_blocks.dtype)
    if variant == "auto":
        variant = "onehot" if nbcol <= BSR_PALLAS_ONEHOT_MAX_NBCOL else "loop"
    if variant in ("onehot", "onehot_fast"):
        kernel = functools.partial(_fwd_kernel_onehot, kmax,
                                   variant == "onehot_fast", t_out)
    else:
        if t_out:
            raise ValueError("t_out is not supported by the loop variant")
        kernel = functools.partial(_fwd_kernel_loop, kmax)

    # flatten HOST-side (free, contiguous) so the kernel needs no reshapes;
    # blocks keep their storage dtype (upcasting bf16 would double the
    # streamed bytes — the VPU multiply promotes per element instead).
    # cols are LANE-MAJOR (1, RK) for the one-hot variants (see
    # _onehot_gather_offset); the scalar loop keeps (RK, 1) — its per-row
    # read is a sublane index.
    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    lane_major = variant in ("onehot", "onehot_fast")
    cols_flat = (block_cols.reshape(1, nbrow * kmax) if lane_major
                 else block_cols.reshape(nbrow * kmax, 1))
    cols_spec = (pl.BlockSpec((1, R * kmax), lambda i: (0, i),
                              memory_space=pltpu.VMEM) if lane_major else
                 pl.BlockSpec((R * kmax, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM))

    out_specs = (pl.BlockSpec((bm, R), lambda i: (0, i),
                              memory_space=pltpu.VMEM) if t_out else
                 # (R, bm) is legal: bm equals the full trailing array dim
                 pl.BlockSpec((R, bm), lambda i: (i, 0),
                              memory_space=pltpu.VMEM))
    out_shape = jax.ShapeDtypeStruct(
        (bm, nbrow) if t_out else (nbrow, bm), dtype)
    out = pl.pallas_call(
        kernel,
        grid=(nbrow // R,),
        in_specs=[
            cols_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident in VMEM
            pl.BlockSpec(
                (R * kmax, bm, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * blocks.size,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + x_blocks.size * x_blocks.dtype.itemsize,
            transcendentals=0,
        ),
    )(cols_flat, x_blocks.astype(dtype), blocks_flat)
    return out


# ----------------------------------------------------------------------------
# Windowed forward kernel: x beyond VMEM residency (VERDICT r2 item 3)
# ----------------------------------------------------------------------------

# Each of the two sliding x windows is a (wb, bn) VMEM block; 4096×128 f32
# = 2 MB per window keeps both + the block tile inside the pipeline budget.
BSR_PALLAS_MAX_WINDOW_BLOCKS = 4096


def bsr_windowed_rows_per_program(bm: int, kmax: int, bn: int, itemsize: int,
                                  nbrow: int) -> int:
    """Row group for the WINDOWED kernel: unlike the resident-x kernel
    (whose one-hot selector cost scales with R·nbcol, capping R at 128),
    the windowed selector is only R·2wb wide — so small-kmax operators can
    take bigger groups to keep the block tile near the DMA pipeline
    target (measured 430 GB/s at 1 MB tiles vs ~700 at 4 MB)."""
    base = bsr_pallas_rows_per_program(bm, kmax, bn, itemsize)
    r = base
    # the doubled tile must stay within the pipeline target: Pallas
    # double-buffers input tiles, so tiles beyond ~4 MB overflow the
    # 16 MB VMEM once the two x windows and the output join them
    while ((r * 2) * kmax * bm * bn * itemsize <= _TILE_BYTES_TARGET
           and nbrow % (r * 2) == 0):
        r *= 2
    return r


def _validated_real_slots(cols, blocks):
    """Real-slot mask shared by the window planners.

    k-slot padding carries block-col 0 after the sorted real cols
    (native/bsr_pack.cpp) and its all-zero blocks nullify any gather, so
    only slot 0 is unconditionally treated as real. A hand-built BSR could
    carry a REAL block at block-col 0 in a later slot, which the mask would
    treat as padding (and a plan built on it would drop its contribution).
    The ambiguity is resolved by the ground truth: padding blocks are
    all-zero. Returns the mask, or None unless every nonzero-valued slot is
    marked real (one device reduction over the suspicious slots only)."""
    kmax = cols.shape[1]
    real = np.ones_like(cols, dtype=bool)
    real[:, 1:] = cols[:, 1:] != 0
    if kmax > 1 and (~real).any():
        if blocks is None:
            return None
        import jax.numpy as _jnp

        # one construction-time device pass over the blocks (per-block
        # any-nonzero, then masked any over the suspicious slots) plus one
        # scalar fetch — pads are spread across all rows, so any exact
        # validation must read them all once
        blk_nonzero = _jnp.any(_jnp.asarray(blocks) != 0, axis=(2, 3))
        if bool(_jnp.any(blk_nonzero & _jnp.asarray(~real))):
            return None  # a "pad" slot holds a real block
    return real


def bsr_window_plan(block_cols, R: int, nbcol: int,
                    wb_max: int = BSR_PALLAS_MAX_WINDOW_BLOCKS,
                    blocks=None):
    """Host-side sliding-window plan for operators whose x exceeds VMEM.

    For each group of R block-rows, find the block-column span its REAL
    blocks touch (k-slot padding carries block-col 0 after the sorted real
    cols — native/bsr_pack.cpp — and its all-zero blocks nullify any
    gather, so only slot 0 is unconditionally treated as real). If every
    span fits one window width wb, the apply can stream x as two adjacent
    (wb, bn) windows selected per group by scalar prefetch.

    Returns (win_q int32 (ngroups,), cols_local int32 (nbrow, kmax),
    wb, x_pad_blocks) or None when the pattern is not banded enough.
    """
    cols = np.asarray(block_cols)
    nbrow, kmax = cols.shape
    if nbrow % R:
        return None
    ngroups = nbrow // R
    real = _validated_real_slots(cols, blocks)
    if real is None:
        return None
    # banded plan additionally needs real cols nondecreasing (local
    # offsets below assume sorted-within-row storage)
    if kmax > 1:
        d_ok = (cols[:, 1:] >= cols[:, :-1]) | ~real[:, 1:]
        if not bool(d_ok.all()):
            return None
    cg = cols.reshape(ngroups, -1)
    rg = real.reshape(ngroups, -1)
    mn = np.where(rg, cg, np.iinfo(np.int32).max).min(axis=1)
    mx = np.where(rg, cg, -1).max(axis=1)
    empty = mx < 0
    mn[empty] = 0
    mx[empty] = 0
    span = int((mx - mn).max(initial=0)) + 1
    wb = max(-(-span // 8) * 8, 8)
    if wb > wb_max:
        return None
    q = (mn // wb).astype(np.int64)
    # keep q monotone so transpose-side revisiting stays well-ordered and
    # empty groups inherit their predecessor's window
    q = np.maximum.accumulate(np.where(empty, 0, q) +
                              np.where(empty, -(1 << 30), 0))
    q = np.maximum(q, 0)
    cols_local = np.where(real, cols - q.repeat(R)[:, None] * wb, 0)
    if cols_local.min(initial=0) < 0 or cols_local.max(initial=0) >= 2 * wb:
        return None
    # the x array must hold every addressed window AND a whole number of
    # window blocks (blocked BlockSpec indexing)
    x_pad_blocks = int(max((q.max(initial=0) + 2) * wb,
                           -(-nbcol // wb) * wb))
    return (q.astype(np.int32), cols_local.astype(np.int32), int(wb),
            x_pad_blocks)


# A mostly-banded pattern (e.g. RCM-reordered SuiteSparse) may need more
# than one contiguous window per row group; up to 4 independently
# addressed windows keep the Pallas path (VERDICT r3 item 4).
BSR_PALLAS_MAX_WINDOWS = 4


def bsr_window_plan_multi(block_cols, R: int, nbcol: int,
                          wb_max: int = BSR_PALLAS_MAX_WINDOW_BLOCKS,
                          blocks=None,
                          max_windows: int = BSR_PALLAS_MAX_WINDOWS):
    """Generalized window plan: up to ``max_windows`` INDEPENDENTLY
    addressed (wb, bn) x-windows per R-row group (the banded plan's two
    windows are forced adjacent). Covers "mostly banded after RCM"
    patterns — a band plus a few far-off column clusters per group.

    Picks the (wb, W) pair minimizing per-step window traffic W·wb over
    power-of-two widths whose per-group distinct-window count fits
    ``max_windows``. Groups touching fewer than W windows point their
    spare lanes at a DUMP window past every real column (its selector
    matches nothing, so duplicates cannot double-count).

    Returns (win_q int32 (W, ngroups), wb, x_pad_blocks) or None. The
    apply kernel (``bsr_matvec_pallas_multiwin``) matches GLOBAL block
    cols against q·wb offsets, so no local-column array is needed.
    """
    cols = np.asarray(block_cols)
    nbrow, kmax = cols.shape
    if nbrow % R:
        return None
    ngroups = nbrow // R
    real = _validated_real_slots(cols, blocks)
    if real is None:
        return None
    # sort cols once: x // wb is monotone in x, so every per-wb window
    # array below is already sorted (the -1 pad sentinel sorts first and
    # floor-divides to itself)
    base = np.sort(np.where(real, cols, -1).reshape(ngroups, -1)
                   .astype(np.int64), axis=1)
    best = None
    wb = 8
    while wb <= wb_max:
        ws = base // wb
        distinct = ((ws[:, 1:] != ws[:, :-1]) & (ws[:, 1:] >= 0)).sum(axis=1)
        distinct += ws[:, 0] >= 0  # first element counts unless sentinel
        W = int(distinct.max(initial=1))
        if 1 <= W <= max_windows and W * wb <= 2 * BSR_PALLAS_MAX_WINDOW_BLOCKS:
            cost = W * wb
            if best is None or cost < best[0]:
                best = (cost, wb, W)
        wb *= 2
    if best is None:
        return None
    _, wb, W = best
    W = max(W, 1)
    ws = base // wb
    # dump window: one past every real column (and past nbcol, so padded-x
    # content is irrelevant — its selector can never match a real col)
    pad_win = max(int(ws.max(initial=-1)), (nbcol - 1) // wb) + 1
    win_q = np.full((W, ngroups), pad_win, np.int64)
    is_new = np.ones_like(ws, bool)
    is_new[:, 1:] = ws[:, 1:] != ws[:, :-1]
    is_new &= ws >= 0
    pos = np.cumsum(is_new, axis=1) - 1
    gi, si = np.nonzero(is_new)
    win_q[pos[gi, si], gi] = ws[gi, si]
    x_pad_blocks = (pad_win + 1) * wb
    return win_q.astype(np.int32), int(wb), int(x_pad_blocks)


def _fwd_kernel_onehot_win(kmax: int, fast: bool, t_out: bool, q_ref,
                           cols_ref, xlo_ref, xhi_ref, blocks_ref, y_ref):
    RK, bm, bn = blocks_ref.shape
    wb = xlo_ref.shape[0]
    xg = _onehot_gather_offset(cols_ref, xlo_ref, jnp.float32, fast, 0)
    xg = xg + _onehot_gather_offset(cols_ref, xhi_ref, jnp.float32, fast, wb)
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)  # (RK, bm)
    y = _group_ksum(z, kmax, jnp.float32).astype(y_ref.dtype)
    y_ref[...] = y.T if t_out else y


@functools.partial(jax.jit, static_argnames=("wb", "x_pad_blocks",
                                             "interpret", "fast", "t_out"))
def bsr_matvec_pallas_windowed(blocks, cols_local, win_q, x_blocks, *,
                               wb: int, x_pad_blocks: int,
                               interpret=False, fast=False, t_out=False):
    """Forward BSR SpMV with x streamed as two scalar-prefetch-selected
    (wb, bn) windows per R-row group — lifts the VMEM x-residency bound
    for banded (e.g. RCM-reordered) patterns; plan: ``bsr_window_plan``.

    ``t_out=True`` returns (bm, nbrow) — packed HBM layout, see
    ``bsr_matvec_pallas``."""
    nbrow, kmax, bm, bn = blocks.shape
    R = bsr_windowed_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize,
                                      nbrow)
    dtype = jnp.result_type(blocks.dtype, x_blocks.dtype)
    if x_blocks.shape[0] < x_pad_blocks:
        x_blocks = jnp.pad(
            x_blocks, ((0, x_pad_blocks - x_blocks.shape[0]), (0, 0)))
    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    cols_flat = cols_local.reshape(1, nbrow * kmax)  # lane-major, see above
    xb = x_blocks.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i, q: (0, i)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i], 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i] + 1, 0)),
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((bm, R), lambda i, q: (0, i)) if t_out else
                   pl.BlockSpec((R, bm), lambda i, q: (i, 0))),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_onehot_win, kmax, fast, t_out),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bm, nbrow) if t_out else (nbrow, bm), dtype),
        interpret=interpret,
    )(win_q, cols_flat, xb, xb, blocks_flat)


def _fwd_kernel_onehot_multiwin(kmax: int, fast: bool, t_out: bool, wb: int,
                                nwin: int, q_ref, cols_ref, *refs):
    """Forward gather against ``nwin`` independently addressed x windows:
    window w covers global block-cols [q[w,i]·wb, (q[w,i]+1)·wb), so the
    selector compares GLOBAL cols against a traced offset. Dump-window
    lanes (plan) match nothing — summing the window gathers reconstructs
    the full-x gather exactly."""
    xs, blocks_ref, y_ref = refs[:nwin], refs[-2], refs[-1]
    i = pl.program_id(0)
    xg = None
    for w, xr in enumerate(xs):
        g = _onehot_gather_offset(cols_ref, xr, jnp.float32, fast,
                                  q_ref[w, i] * wb)
        xg = g if xg is None else xg + g
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)  # (RK, bm)
    y = _group_ksum(z, kmax, jnp.float32).astype(y_ref.dtype)
    y_ref[...] = y.T if t_out else y


@functools.partial(jax.jit, static_argnames=("wb", "x_pad_blocks",
                                             "interpret", "fast", "t_out"))
def bsr_matvec_pallas_multiwin(blocks, block_cols, win_q, x_blocks, *,
                               wb: int, x_pad_blocks: int,
                               interpret=False, fast=False, t_out=False):
    """Forward BSR SpMV with x streamed as W scalar-prefetch-selected
    (wb, bn) windows per R-row group — the mostly-banded generalization of
    ``bsr_matvec_pallas_windowed``; plan: ``bsr_window_plan_multi``.

    ``t_out=True`` returns (bm, nbrow) — packed HBM layout, see
    ``bsr_matvec_pallas``."""
    nbrow, kmax, bm, bn = blocks.shape
    W = win_q.shape[0]
    R = bsr_windowed_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize,
                                      nbrow)
    dtype = jnp.result_type(blocks.dtype, x_blocks.dtype)
    if x_blocks.shape[0] < x_pad_blocks:
        x_blocks = jnp.pad(
            x_blocks, ((0, x_pad_blocks - x_blocks.shape[0]), (0, 0)))
    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    cols_flat = block_cols.reshape(1, nbrow * kmax)  # lane-major
    xb = x_blocks.astype(dtype)

    def win_spec(w):
        return pl.BlockSpec((wb, bn), lambda i, q, w=w: (q[w, i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i, q: (0, i)),
            *[win_spec(w) for w in range(W)],
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((bm, R), lambda i, q: (0, i)) if t_out else
                   pl.BlockSpec((R, bm), lambda i, q: (i, 0))),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_onehot_multiwin, kmax, fast, t_out,
                          wb, W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bm, nbrow) if t_out else (nbrow, bm), dtype),
        interpret=interpret,
    )(win_q, cols_flat, *([xb] * W), blocks_flat)


def _t_kernel_onehot(kmax: int, t_in: bool, cols_t_ref, u_ref, blocks_ref,
                     out_ref):
    RK, bm, bn = blocks_ref.shape
    R = RK // kmax
    nbcol = out_ref.shape[0]
    # expand u (R, bm) to per-block rows via the exact group selector.
    # t_in: u arrives TRANSPOSED (bm, R) — packed HBM layout, see
    # bsr_matvec_pallas t_out — and is flipped back by a tiny relayout.
    u = u_ref[...].T if t_in else u_ref[...]
    row_of = jax.lax.broadcasted_iota(jnp.int32, (RK, R), 0) // kmax
    expand = (row_of == jax.lax.broadcasted_iota(jnp.int32, (RK, R), 1)).astype(
        u.dtype
    )
    u_rk = jax.lax.dot_general(
        expand,
        u,
        (((1,), (0,)), ((), ())),
        precision=_GATHER_PRECISION,
        preferred_element_type=jnp.float32,
    )  # (RK, bm)
    # contrib[(r,k), :] = sum_m blocks[(r,k),m,:]*u[r,m]  (VPU, exact f32)
    contrib = jnp.sum(blocks_ref[...] * u_rk[:, :, None], axis=1)  # (RK, bn)

    # scatter-add as a STANDARD matmul: the selector is built directly in
    # (nbcol, RK) orientation from the host-side (1, RK) cols layout.
    # Contracting dim0 of a (RK, nbcol) selector instead ("transposed
    # contraction") crashes Mosaic once nbcol ≳ 512 (measured: 64 ok, 512
    # HTTP-500 at any grid size; tools/probe_transpose_split.py). The
    # pre-oriented selector also admits the forward kernel's 3-pass bf16
    # split, but the kernel is DMA-bound here so the MXU saving does not
    # pay (A/B at the bench shape: split3 678 vs HIGHEST 689 GB/s) —
    # single HIGHEST pass kept for f32, single DEFAULT pass for bf16
    # (0/1 selector and bf16 contrib are both MXU-exact there).
    ids = jax.lax.broadcasted_iota(jnp.int32, (nbcol, RK), 0)
    selT = (ids == cols_t_ref[...]).astype(out_ref.dtype)  # (nbcol, RK)
    upd = jax.lax.dot_general(
        selT,
        contrib,
        (((1,), (0,)), ((), ())),
        precision=(_GATHER_PRECISION if contrib.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)  # (nbcol, bn)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] = out_ref[...] + upd


@functools.partial(jax.jit, static_argnames=("nbcol", "interpret", "t_in"))
def bsr_rmatvec_pallas(blocks, block_cols, u_blocks, nbcol: int, *,
                       interpret=False, t_in=False):
    """Transpose-mode apply: out (nbcol, bn) = Σ_{r,k} blocksᵀ[r,k] · u[r]
    scattered to block-column ``block_cols[r,k]``. The (nbcol, bn) output
    accumulates in VMEM across sequential grid steps (same VMEM bound as
    forward x).

    ``t_in=True``: u_blocks arrives TRANSPOSED (bm, nbrow) — the packed
    HBM layout (a (nbrow, bm<16) array is 128/bm-lane-padded; see
    ``bsr_matvec_pallas`` t_out).

    Note: padding blocks are all-zero, so their scatter to column 0
    contributes exactly nothing.
    """
    nbrow, kmax, bm, bn = blocks.shape
    R = bsr_pallas_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize)
    if nbrow % R != 0:
        raise ValueError(f"nbrow={nbrow} must be a multiple of {R} (pad the BSR)")
    dtype = jnp.result_type(blocks.dtype, u_blocks.dtype)
    kernel = functools.partial(_t_kernel_onehot, kmax, t_in)

    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    # (1, RK) layout so the kernel can build the selector pre-oriented as
    # (nbcol, RK) without any in-kernel transpose (see _t_kernel_onehot)
    cols_flat = block_cols.reshape(1, nbrow * kmax)

    return pl.pallas_call(
        kernel,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i: (0, i), memory_space=pltpu.VMEM),
            (pl.BlockSpec((bm, R), lambda i: (0, i),
                          memory_space=pltpu.VMEM) if t_in else
             # u in the natural (nbrow, bm) layout, like the forward output
             pl.BlockSpec((R, bm), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec(
                (R * kmax, bm, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # full, accumulated
        out_shape=jax.ShapeDtypeStruct((nbcol, bn), dtype),
        interpret=interpret,
        # headroom above the 16 MB scoped-VMEM default (the selector +
        # accumulator sit near it at bench scale; the A/B-verified
        # configuration compiled under this cap)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * blocks.size,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + nbcol * bn * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(cols_flat, u_blocks.astype(dtype), blocks_flat)


# ----------------------------------------------------------------------------
# Windowed TRANSPOSE kernel: output beyond VMEM residency (VERDICT r3 item 3)
# ----------------------------------------------------------------------------

_T_WIN_SEG = 512  # selector rows per in-kernel segment (bounds VMEM + MXU)


def _t_kernel_onehot_win(kmax: int, t_in: bool, q_ref, cols_ref, u_ref,
                         blocks_ref, olo_ref, ohi_ref):
    """Transpose scatter into TWO sliding output windows.

    The window plan (``bsr_window_plan``) is symmetric information: group
    i's blocks touch block-cols within [q_i·wb, q_i·wb + 2wb), so the
    scatter-add lands in the same two windows the forward kernel fetches
    x from. Each window accumulates in VMEM while q is unchanged; on a q
    change the block is freshly OVERWRITTEN (monotone q ⇒ no
    revisit-after-leave). Blocks never visited stay undefined — the
    caller masks them with a static where() (see
    ``bsr_rmatvec_pallas_windowed``)."""
    RK, bm, bn = blocks_ref.shape
    wb = olo_ref.shape[0]
    R = RK // kmax
    # expand u (R, bm) to per-block rows via the exact group selector;
    # t_in: u arrives TRANSPOSED (bm, R) — packed HBM layout
    u = u_ref[...].T if t_in else u_ref[...]
    row_of = jax.lax.broadcasted_iota(jnp.int32, (RK, R), 0) // kmax
    expand = (row_of == jax.lax.broadcasted_iota(jnp.int32, (RK, R), 1)
              ).astype(u.dtype)
    u_rk = jax.lax.dot_general(
        expand, u, (((1,), (0,)), ((), ())),
        precision=_GATHER_PRECISION,
        preferred_element_type=jnp.float32)  # (RK, bm)
    contrib = jnp.sum(blocks_ref[...] * u_rk[:, :, None], axis=1)  # (RK, bn)

    i = pl.program_id(0)
    q_now = q_ref[i]
    q_prev = jnp.where(i > 0, q_ref[jnp.maximum(i - 1, 0)], -1)
    new = q_now != q_prev
    prec = (_GATHER_PRECISION if contrib.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    for base, ref in ((0, olo_ref), (wb, ohi_ref)):
        for s in range(0, wb, _T_WIN_SEG):
            e = min(s + _T_WIN_SEG, wb)
            ids = jax.lax.broadcasted_iota(jnp.int32, (e - s, RK), 0) + (
                base + s)
            sel = (ids == cols_ref[...]).astype(contrib.dtype)
            upd = jax.lax.dot_general(
                sel, contrib, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32).astype(ref.dtype)

            @pl.when(new)
            def _(u=upd, r=ref, s=s, e=e):
                r[s:e, :] = u

            @pl.when(jnp.logical_not(new))
            def _(u=upd, r=ref, s=s, e=e):
                r[s:e, :] = r[s:e, :] + u


@functools.partial(jax.jit, static_argnames=("wb", "x_pad_blocks", "nbcol",
                                             "interpret", "t_in"))
def bsr_rmatvec_pallas_windowed(blocks, cols_local, win_q, u_blocks, *,
                                wb: int, x_pad_blocks: int, nbcol: int,
                                interpret=False, t_in=False):
    """Transpose BSR SpMV with the OUTPUT streamed as two sliding
    (wb, bn) windows — lifts the VMEM output-residency bound for banded
    patterns (the large-n adjoint previously fell to the ~0.45-of-ceiling
    XLA scatter path). Same plan as the forward windowed kernel."""
    nbrow, kmax, bm, bn = blocks.shape
    R = bsr_windowed_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize,
                                      nbrow)
    dtype = jnp.result_type(blocks.dtype, u_blocks.dtype)
    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    cols_flat = cols_local.reshape(1, nbrow * kmax)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i, q: (0, i)),
            (pl.BlockSpec((bm, R), lambda i, q: (0, i)) if t_in else
             pl.BlockSpec((R, bm), lambda i, q: (i, 0))),
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((wb, bn), lambda i, q: (q[i], 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i] + 1, 0)),
        ],
    )
    olo, ohi = pl.pallas_call(
        functools.partial(_t_kernel_onehot_win, kmax, t_in),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((x_pad_blocks, bn), dtype)] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(win_q, cols_flat, u_blocks.astype(dtype), blocks_flat)

    # static visit masks: unvisited window blocks hold undefined data —
    # where() (not multiply) so even NaN garbage cannot leak through
    nwin = x_pad_blocks // wb
    mlo = jnp.zeros((nwin,), bool).at[win_q].set(True)
    mhi = jnp.zeros((nwin,), bool).at[win_q + 1].set(True)
    zero = jnp.zeros((), dtype)
    out = (jnp.where(jnp.repeat(mlo, wb)[:, None], olo, zero)
           + jnp.where(jnp.repeat(mhi, wb)[:, None], ohi, zero))
    return out[:nbcol]


# ----------------------------------------------------------------------------
# Multi-window TRANSPOSE: mostly-banded patterns (VERDICT r4 missing #1)
# ----------------------------------------------------------------------------


def bsr_window_plan_multi_t(block_cols, R: int, nbcol: int, wb: int, W: int,
                            blocks=None):
    """Monotone-lane transpose plan over the forward multi plan's (wb, W).

    The sliding-output-window kernel overwrites a window block on lane
    window change and accumulates while it is unchanged, so a lane may
    NEVER return to a window it left. This planner assigns each group's
    distinct real windows to W lanes such that every lane's window
    sequence is NONDECREASING over groups (greedy best-fit: each window,
    ascending, goes to the eligible lane with the largest current
    position — the patience heuristic). Unused lanes REPEAT their
    previous window with valid=0; the kernel zeroes their contribution,
    so repeats are harmless and keep the lane monotone.

    Unlike the forward planner, slot-0 blocks at block-col 0 are checked
    against the block VALUES: pure pad rows (the nbrow pad tail) would
    otherwise force window 0 into the LAST group, which no monotone lane
    can serve.

    Returns (q_t int32 (W, ngroups), valid int32 (W, ngroups),
    x_pad_blocks) or None when no monotone assignment exists (caller
    keeps the XLA scatter fallback).
    """
    cols = np.asarray(block_cols)
    nbrow, kmax = cols.shape
    if nbrow % R:
        return None
    ngroups = nbrow // R
    real = _validated_real_slots(cols, blocks)
    if real is None:
        return None
    real = real.copy()
    if (cols[:, 0] == 0).any() and blocks is not None:
        import jax.numpy as _jnp

        nz0 = np.asarray(
            _jnp.any(_jnp.asarray(blocks)[:, 0] != 0, axis=(1, 2)))
        real[:, 0] = (cols[:, 0] != 0) | nz0
    ws_sorted = np.sort(
        np.where(real, cols // wb, -1).reshape(ngroups, R * kmax), axis=1)
    last = np.full(W, -1, np.int64)
    q_t = np.zeros((W, ngroups), np.int64)
    valid = np.zeros((W, ngroups), bool)
    for g in range(ngroups):
        row = ws_sorted[g]
        wins = np.unique(row[row >= 0])
        if wins.size > W:
            return None
        used = []
        for v in wins:
            cand = [w for w in range(W) if w not in used and last[w] <= v]
            if not cand:
                return None
            w = max(cand, key=lambda i: last[i])
            q_t[w, g] = v
            valid[w, g] = True
            last[w] = v
            used.append(w)
        for w in range(W):
            if w not in used:
                q_t[w, g] = max(last[w], 0)
                last[w] = q_t[w, g]
    x_pad_blocks = int(max(int(q_t.max(initial=0)) + 1, -(-nbcol // wb)) * wb)
    return q_t.astype(np.int32), valid.astype(np.int32), x_pad_blocks


def _t_kernel_onehot_multiwin(kmax: int, t_in: bool, wb: int, W: int,
                              q_ref, v_ref, cols_ref, u_ref, blocks_ref,
                              *out_refs):
    """Transpose scatter into ``W`` independently addressed sliding output
    windows. Selectors compare GLOBAL block-cols against the lane's traced
    window offset (like the forward multi-window gather); lane validity
    scales the update, so repeated (valid=0) lane steps add exactly zero
    while still defining the window content on a window change."""
    RK, bm, bn = blocks_ref.shape
    R = RK // kmax
    u = u_ref[...].T if t_in else u_ref[...]
    row_of = jax.lax.broadcasted_iota(jnp.int32, (RK, R), 0) // kmax
    expand = (row_of == jax.lax.broadcasted_iota(jnp.int32, (RK, R), 1)
              ).astype(u.dtype)
    u_rk = jax.lax.dot_general(
        expand, u, (((1,), (0,)), ((), ())),
        precision=_GATHER_PRECISION,
        preferred_element_type=jnp.float32)  # (RK, bm)
    contrib = jnp.sum(blocks_ref[...] * u_rk[:, :, None], axis=1)  # (RK, bn)

    i = pl.program_id(0)
    prec = (_GATHER_PRECISION if contrib.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for w, ref in enumerate(out_refs):
        q_now = q_ref[w, i]
        q_prev = jnp.where(i > 0, q_ref[w, jnp.maximum(i - 1, 0)], -1)
        new = q_now != q_prev
        vw = v_ref[w, i].astype(contrib.dtype)
        for s in range(0, wb, _T_WIN_SEG):
            e = min(s + _T_WIN_SEG, wb)
            ids = jax.lax.broadcasted_iota(jnp.int32, (e - s, RK), 0) + (
                q_now * wb + s)
            sel = (ids == cols_ref[...]).astype(contrib.dtype)
            upd = (jax.lax.dot_general(
                sel, contrib, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32) * vw).astype(ref.dtype)

            @pl.when(new)
            def _(u=upd, r=ref, s=s, e=e):
                r[s:e, :] = u

            @pl.when(jnp.logical_not(new))
            def _(u=upd, r=ref, s=s, e=e):
                r[s:e, :] = r[s:e, :] + u


@functools.partial(jax.jit, static_argnames=("wb", "x_pad_blocks", "nbcol",
                                             "interpret", "t_in"))
def bsr_rmatvec_pallas_multiwin(blocks, block_cols, win_q_t, win_valid_t,
                                u_blocks, *, wb: int, x_pad_blocks: int,
                                nbcol: int, interpret=False, t_in=False):
    """Transpose BSR SpMV with the output streamed as ``W`` independently
    addressed sliding (wb, bn) windows — the mostly-banded generalization
    of ``bsr_rmatvec_pallas_windowed``; plan: ``bsr_window_plan_multi_t``.
    Fills the forward/transpose cost-parity contract for multi-window
    plans (reference src/adjtrans.jl:158-205: transpose same cost as
    forward by construction)."""
    nbrow, kmax, bm, bn = blocks.shape
    W = win_q_t.shape[0]
    R = bsr_windowed_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize,
                                      nbrow)
    dtype = jnp.result_type(blocks.dtype, u_blocks.dtype)
    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    cols_flat = block_cols.reshape(1, nbrow * kmax)  # GLOBAL cols, lane-major

    def out_spec(w):
        return pl.BlockSpec((wb, bn), lambda i, q, v, w=w: (q[w, i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i, q, v: (0, i)),
            (pl.BlockSpec((bm, R), lambda i, q, v: (0, i)) if t_in else
             pl.BlockSpec((R, bm), lambda i, q, v: (i, 0))),
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q, v: (i, 0, 0)),
        ],
        out_specs=[out_spec(w) for w in range(W)],
    )
    outs = pl.pallas_call(
        functools.partial(_t_kernel_onehot_multiwin, kmax, t_in, wb, W),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((x_pad_blocks, bn), dtype)] * W,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(win_q_t, win_valid_t, cols_flat, u_blocks.astype(dtype), blocks_flat)
    if not isinstance(outs, (list, tuple)):
        outs = (outs,)

    # static visit masks per lane (see bsr_rmatvec_pallas_windowed)
    nwin = x_pad_blocks // wb
    zero = jnp.zeros((), dtype)
    out = None
    for w in range(W):
        m = jnp.zeros((nwin,), bool).at[win_q_t[w]].set(True)
        o = jnp.where(jnp.repeat(m, wb)[:, None], outs[w], zero)
        out = o if out is None else out + o
    return out[:nbcol]
