"""Sparse storage formats and operators (SURVEY.md §2.3: 'Sparse storage
formats' + 'Pallas apply kernels')."""

from .formats import COO, CSR, BSR, coo_from_dense, csr_from_dense, bsr_from_dense
from .ops import COOOperator, CSROperator, BSROperator, opSparse

__all__ = [
    "COO",
    "CSR",
    "BSR",
    "coo_from_dense",
    "csr_from_dense",
    "bsr_from_dense",
    "COOOperator",
    "CSROperator",
    "BSROperator",
    "opSparse",
]
