"""Pallas TPU kernel: BSR SpMV (block-sparse matrix · vector).

The XLA fallback (sparse/ops.py) materializes the gathered x-blocks
``x[block_cols]`` — an (nbrow·kmax·bn) HBM round-trip — before the
contraction. This kernel keeps x resident in VMEM and gathers block
segments on-chip, so HBM traffic is the block values once plus x once:
the speed-of-light for SpMV (BASELINE.md: ≥80% roofline nnz/s).

Layout: grid over groups of R=8 block-rows (to satisfy the (8, 128) tile
constraint on the (nbrow, bm) output); ``block_cols`` rides the
scalar-prefetch slot (pltpu.PrefetchScalarGridSpec) so block indices are in
SMEM before the body runs; the (R, kmax, bm, bn) values tile is DMA'd by
the pallas pipeline (double-buffered) while the previous tile computes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec_pallas", "BSR_PALLAS_ROWS_PER_PROGRAM"]

BSR_PALLAS_ROWS_PER_PROGRAM = 8  # R block-rows per grid step


def _bsr_kernel(cols_ref, x_ref, blocks_ref, y_ref):
    """R block-rows: y[r] = Σ_k blocks[r, k] @ x[cols[r, k]]."""
    i = pl.program_id(0)
    R, kmax, bm, bn = blocks_ref.shape

    def body(k, acc_rows):
        new_rows = []
        for r in range(R):  # static unroll over the row group
            j = cols_ref[i * R + r, k]
            xk = x_ref[j, :]  # (bn,) on-chip gather
            new_rows.append(
                acc_rows[r]
                + jnp.dot(blocks_ref[r, k], xk, preferred_element_type=y_ref.dtype)
            )
        return tuple(new_rows)

    acc0 = tuple(jnp.zeros((bm,), dtype=y_ref.dtype) for _ in range(R))
    rows = jax.lax.fori_loop(0, kmax, body, acc0)
    y_ref[:, :] = jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec_pallas(blocks, block_cols, x_blocks, *, interpret=False):
    """y_blocks (nbrow, bm) = BSR(blocks, block_cols) @ x_blocks (nbcol, bn).

    Requires nbrow divisible by 8 (callers pad); ``x_blocks`` must fit VMEM
    (up to ~2M f32 entries) — callers fall back to the XLA path beyond that.
    """
    nbrow, kmax, bm, bn = blocks.shape
    R = BSR_PALLAS_ROWS_PER_PROGRAM
    if nbrow % R != 0:
        raise ValueError(f"nbrow={nbrow} must be a multiple of {R} (pad the BSR)")
    dtype = jnp.result_type(blocks.dtype, x_blocks.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_cols -> SMEM
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident in VMEM
            pl.BlockSpec(
                (R, kmax, bm, bn),
                lambda i, cols: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((R, bm), lambda i, cols: (i, 0), memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow, bm), dtype),
        interpret=interpret,
    )(block_cols, x_blocks.astype(dtype), blocks.astype(dtype))
