"""Pallas TPU kernels (SURVEY.md §2.3 'Pallas apply kernels').

The XLA paths are the defaults wherever they already reach the HBM
roofline (measured: dense matvec ~700 GB/s, 128×128 BSR ~734 GB/s, compact
L-BFGS applies 280-350 µs at n=1e6); the Pallas kernels cover the case the
XLA lowering leaves on the table — fine-block (8×128) BSR SpMV, whose
``x[block_cols]`` gather caps the einsum path at ~0.70 of roofline:

- ``bsr_spmv``: forward + transpose BSR SpMV with x VMEM-resident and the
  gather/scatter vectorized as one-hot MXU contractions (v2 — see module
  docstring). Engaged automatically by ``BSROperator`` when eligible
  (small blocks, x within the VMEM bound); ``backend="xla"`` opts out.
"""

from .bsr_spmv import (
    bsr_matvec_pallas,
    bsr_rmatvec_pallas,
    bsr_pallas_rows_per_program,
    BSR_PALLAS_MAX_X_ELEMS,
    BSR_PALLAS_ONEHOT_MAX_NBCOL,
)

__all__ = [
    "bsr_matvec_pallas",
    "bsr_rmatvec_pallas",
    "bsr_pallas_rows_per_program",
    "BSR_PALLAS_MAX_X_ELEMS",
    "BSR_PALLAS_ONEHOT_MAX_NBCOL",
]
