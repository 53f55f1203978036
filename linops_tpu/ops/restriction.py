"""Restriction / extension operators and operator slicing.

Reference: src/special-operators.jl:167-233. ``R = opRestriction(I, ncol)``
gives ``R @ v == v[I]`` (gather); its transpose scatters. ``opExtension`` is
the adjoint. ``op[rows, cols] == R @ op @ E`` so slices are always operators.
Indices here are 0-based (Python convention).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException, register_operator

__all__ = ["RestrictionOperator", "opRestriction", "opExtension", "op_getindex"]


class RestrictionOperator(LinearOperator):
    """Gather rows ``idx`` out of a length-``ncol`` vector. The transpose is
    a scatter into zeros (reference: src/special-operators.jl:167-174)."""

    _fields_children = ("idx",)
    _fields_aux = ("_ncol",)

    def __init__(self, idx, ncol: int):
        super().__init__()
        idx_host = np.asarray(idx)
        if idx_host.ndim == 0:
            idx_host = idx_host.reshape(1)
        if idx_host.ndim != 1 or not np.issubdtype(idx_host.dtype, np.integer):
            raise LinearOperatorException("indices must be an integer vector")
        if idx_host.size and (idx_host.min() < 0 or idx_host.max() >= ncol):
            # reference: "indices should be between 1 and ncol" (0-based here)
            raise LinearOperatorException(f"indices should be between 0 and {ncol - 1}")
        self.idx = jnp.asarray(idx_host)
        self._ncol = int(ncol)

    @property
    def nrow(self):
        return self.idx.shape[0]

    @property
    def ncol(self):
        return self._ncol

    @property
    def dtype(self):
        # reference uses the index integer type as eltype
        # (src/special-operators.jl:193); promotion fixes this up in algebra.
        return self.idx.dtype

    def _prod(self, v):
        return v[self.idx]

    def _tprod(self, u):
        # scatter-ADD: the true adjoint of a gather (with duplicate indices,
        # set-semantics would break <Rv, u> == <v, R'u> and be
        # implementation-defined about which duplicate wins)
        return jnp.zeros((self._ncol,), u.dtype).at[self.idx].add(u)

    def _ctprod(self, w):
        return self._tprod(w)

    def apply_matrix(self, M, mode: str = "N"):
        if mode in ("N", "C"):
            return M[self.idx, :]
        return jnp.zeros((self._ncol, M.shape[1]), M.dtype).at[self.idx, :].add(M)

    def _name(self):
        return "Restriction operator"


register_operator(RestrictionOperator)


def opRestriction(idx, ncol: int):
    """Restriction to indices ``idx`` (int, integer vector, or slice/colon).
    ``opRestriction(slice(None), n)`` is the identity
    (reference: src/special-operators.jl:187-201)."""
    if isinstance(idx, slice):
        if idx == slice(None):
            from .eye import Eye

            return Eye(ncol, dtype=jnp.int64)
        idx = np.arange(*idx.indices(ncol))
    return RestrictionOperator(idx, ncol)


def opExtension(idx, ncol: int):
    """Extension: place a short vector at positions ``idx`` of a length
    ``ncol`` vector; the adjoint of restriction
    (reference: src/special-operators.jl:216-221)."""
    if isinstance(idx, slice) and idx == slice(None):
        from .eye import Eye

        return Eye(ncol, dtype=jnp.int64)
    return opRestriction(idx, ncol).H


def _normalize_index(key, dim: int):
    """Return None for ':' (skip), else an index vector."""
    if isinstance(key, slice):
        if key == slice(None):
            return None
        return np.arange(*key.indices(dim))
    if isinstance(key, (int, np.integer)):
        return np.asarray([key])
    return np.asarray(key)


def op_getindex(op: LinearOperator, rows, cols) -> LinearOperator:
    """``op[rows, cols] = R @ op @ E`` — slices are always operators
    (reference: src/special-operators.jl:224-233)."""
    r = _normalize_index(rows, op.nrow)
    c = _normalize_index(cols, op.ncol)
    out = op
    if c is not None:
        out = out @ opExtension(c, op.ncol)
    if r is not None:
        out = opRestriction(r, op.nrow) @ out
    return out
