"""Diagonal operators, square and rectangular.

Reference: src/special-operators.jl:125-165. Square: ``res = α d v (+ β res)``
with ctprod conjugating d; rectangular: min-dim slice with zero tail.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException, register_operator

__all__ = ["DiagonalOperator", "opDiagonal"]


class DiagonalOperator(LinearOperator):
    _fields_children = ("d",)
    _fields_aux = ("_nrow", "_ncol")

    def __init__(self, d, nrow: int = None, ncol: int = None):
        super().__init__()
        d = jnp.asarray(d)
        if d.ndim != 1:
            raise LinearOperatorException("diagonal must be a vector")
        n = d.shape[0]
        if nrow is None and ncol is None:
            nrow = ncol = n
        elif nrow is None or ncol is None:
            raise LinearOperatorException("provide both nrow and ncol or neither")
        nrow, ncol = int(nrow), int(ncol)
        # reference: square rect-form with d longer truncates (src/special-operators.jl:159)
        if nrow == ncol and nrow <= n:
            d = d[:nrow]
        elif min(nrow, ncol) > n:
            raise LinearOperatorException("diagonal too short for operator size")
        self.d = d
        self._nrow = nrow
        self._ncol = ncol

    @property
    def nrow(self):
        return self._nrow

    @property
    def ncol(self):
        return self._ncol

    @property
    def dtype(self):
        return self.d.dtype

    @property
    def _square(self):
        return self._nrow == self._ncol

    @property
    def symmetric(self):
        # reference square opDiagonal: symmetric=true; rectangular: false
        return self._square

    @property
    def hermitian(self):
        # reference: hermitian = isreal(d); we use the (static) dtype
        return self._square and not jnp.issubdtype(self.d.dtype, jnp.complexfloating)

    def _diag_for_mode(self, mode: str):
        if mode in ("H", "C") and jnp.issubdtype(self.d.dtype, jnp.complexfloating):
            return jnp.conj(self.d)
        return self.d

    def apply(self, v, mode: str = "N"):
        d = self._diag_for_mode(mode)
        if self._square:
            return d * v
        out_dim = self.out_dim(mode)
        n_min = min(self._nrow, self._ncol)
        y = d[:n_min] * v[:n_min]
        if out_dim == n_min:
            return y
        return jnp.zeros((out_dim,), y.dtype).at[:n_min].set(y)

    def apply_matrix(self, M, mode: str = "N"):
        d = self._diag_for_mode(mode)
        if self._square:
            return d[:, None] * M
        out_dim = self.out_dim(mode)
        n_min = min(self._nrow, self._ncol)
        Y = d[:n_min, None] * M[:n_min, :]
        if out_dim == n_min:
            return Y
        return jnp.zeros((out_dim, M.shape[1]), Y.dtype).at[:n_min, :].set(Y)

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _name(self):
        return "Diagonal operator"


register_operator(DiagonalOperator)


def opDiagonal(*args):
    """``opDiagonal(d)`` or ``opDiagonal(nrow, ncol, d)``
    (reference: src/special-operators.jl:138,158)."""
    if len(args) == 1:
        return DiagonalOperator(args[0])
    if len(args) == 3:
        nrow, ncol, d = args
        return DiagonalOperator(d, nrow, ncol)
    raise TypeError("opDiagonal(d) or opDiagonal(nrow, ncol, d)")
