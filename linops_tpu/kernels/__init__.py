"""Pallas TPU kernels (SURVEY.md §2.3 'Pallas apply kernels').

The XLA paths are the defaults wherever they already reach the HBM
roofline (measured: dense matvec ~700 GB/s, 128x128 BSR ~734 GB/s, compact
L-BFGS applies 280-350 us at n=1e6); these kernels cover the cases where
explicit VMEM management wins or may win:

- ``bsr_spmv``: BSR SpMV with on-chip x gather (opt-in via
  ``BSROperator(backend="pallas")``). Status: numerically exact but
  measured ~20x slower than the XLA einsum path on v5e — the per-block
  (8, 128) dots with full-f32 precision do not amortize; kept as the
  starting point for a future tiled rewrite. Use the default XLA path.
"""

from .bsr_spmv import bsr_matvec_pallas, to_mfirst

__all__ = ["bsr_matvec_pallas", "to_mfirst"]
