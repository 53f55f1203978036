"""Pallas TPU kernel: BSR SpMV (block-sparse matrix · vector).

The XLA fallback (sparse/ops.py) materializes the gathered x-blocks
``x[block_cols]`` — an extra HBM round-trip proportional to nnz — before
the contraction. This kernel keeps x resident in VMEM and gathers block
segments on-chip, so HBM traffic is the block values once plus x once:
the speed-of-light for SpMV (BASELINE.md: ≥80% roofline nnz/s).

Layout: blocks are stored row-major *within a block-row group* as
``(nbrow, bm, kmax, bn)`` ("m-first"). Grid over groups of R=8 block-rows
(the (8, ·) output tile constraint); ``block_cols`` is a VMEM-blocked
input read as per-index scalars (SMEM scalar-prefetch cannot hold the
index array at production sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec_pallas", "to_mfirst", "BSR_PALLAS_ROWS_PER_PROGRAM"]

BSR_PALLAS_ROWS_PER_PROGRAM = 8  # R block-rows per grid step


def to_mfirst(blocks):
    """(nbrow, kmax, bm, bn) storage → (nbrow, bm, kmax, bn) kernel layout."""
    return jnp.transpose(blocks, (0, 2, 1, 3))


def _bsr_kernel(cols_ref, x_ref, blocks_ref, y_ref):
    """R block-rows: y[r] = Σ_k blocks[r,·,k,·] @ x[cols[r,k]]."""
    R, bm, kmax, bn = blocks_ref.shape

    rows = []
    for r in range(R):  # static unroll
        acc = jnp.zeros((bm, 1), dtype=y_ref.dtype)
        for k in range(kmax):  # static unroll; gathers stay in VMEM
            xk = x_ref[cols_ref[r, k], :].reshape(bn, 1)
            acc = acc + jnp.dot(
                blocks_ref[r, :, k, :],
                xk,
                preferred_element_type=y_ref.dtype,
                precision=jax.lax.Precision.HIGHEST,  # MXU would truncate f32->bf16
            )
        rows.append(acc[:, 0])
    y_ref[:, :] = jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec_pallas(blocks_mfirst, block_cols, x_blocks, *, interpret=False):
    """y_blocks (nbrow, bm) = BSR @ x_blocks (nbcol, bn), with blocks in
    m-first layout (see ``to_mfirst``).

    Requires nbrow divisible by 8 (callers pad); ``x_blocks`` must fit VMEM
    (up to ~2M f32 entries) — callers fall back to the XLA path beyond that.
    """
    nbrow, bm, kmax, bn = blocks_mfirst.shape
    R = BSR_PALLAS_ROWS_PER_PROGRAM
    if nbrow % R != 0:
        raise ValueError(f"nbrow={nbrow} must be a multiple of {R} (pad the BSR)")
    dtype = jnp.result_type(blocks_mfirst.dtype, x_blocks.dtype)

    grid_spec = pl.GridSpec(
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((R, kmax), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident in VMEM
            pl.BlockSpec(
                (R, bm, kmax, bn),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((R, bm), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow, bm), dtype),
        interpret=interpret,
    )(block_cols, x_blocks.astype(dtype), blocks_mfirst.astype(dtype))
