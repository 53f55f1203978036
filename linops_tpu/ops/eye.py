"""Identity / ones / zeros operators.

Reference: src/special-operators.jl:1-123 (opEye/opOnes/opZeros, including
the typeless singleton opEye() that returns its argument unchanged and the
rectangular identity that zero-fills the tail).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException, register_operator

__all__ = ["Eye", "UniversalEye", "Ones", "Zeros", "opEye", "opOnes", "opZeros"]


class UniversalEye(LinearOperator):
    """Typeless identity: ``opEye()`` (reference: src/special-operators.jl:14-30).
    ``I * x is x`` and ``I * op is op`` for any size."""

    _fields_children = ()
    _fields_aux = ()
    _is_universal_eye = True

    def __init__(self):
        super().__init__()

    @property
    def nrow(self):
        raise LinearOperatorException("opEye() has no fixed size")

    @property
    def ncol(self):
        raise LinearOperatorException("opEye() has no fixed size")

    @property
    def dtype(self):
        return jnp.float64

    @property
    def symmetric(self):
        return True

    @property
    def hermitian(self):
        return True

    def apply(self, v, mode: str = "N"):
        return v

    def apply_matrix(self, M, mode: str = "N"):
        return M

    def matvec(self, v, mode: str = "N"):
        return v  # identity: op * v === v

    @staticmethod
    def _passthrough(other):
        # identity: operators and arrays pass through unchanged. Scalars
        # must NOT (2.0 * opEye() is a scaled identity, which needs a size
        # — silently returning the bare scalar corrupts downstream algebra).
        if isinstance(other, LinearOperator) or getattr(other, "ndim", 0) >= 1:
            return other
        raise LinearOperatorException(
            "the sizeless opEye() cannot be combined with scalars; use "
            "opEye(n) for a sized identity"
        )

    def __mul__(self, other):
        return self._passthrough(other)

    def __rmul__(self, other):
        return self._passthrough(other)

    def __matmul__(self, other):
        return self._passthrough(other)

    def __rmatmul__(self, other):
        return self._passthrough(other)

    @property
    def T(self):
        return self

    @property
    def H(self):
        return self

    def conj(self):
        return self

    def _name(self):
        return "Identity operator"


register_operator(UniversalEye)


class Eye(LinearOperator):
    """Sized identity, possibly rectangular: copies the leading min-dim
    entries and zero-fills the tail (reference: src/special-operators.jl:36-77)."""

    _fields_children = ()
    _fields_aux = ("_nrow", "_ncol", "_dtype_name")

    def __init__(self, nrow: int, ncol: int = None, *, dtype=jnp.float64):
        super().__init__()
        self._nrow = int(nrow)
        self._ncol = int(nrow if ncol is None else ncol)
        self._dtype_name = jnp.dtype(dtype).name

    @property
    def nrow(self):
        return self._nrow

    @property
    def ncol(self):
        return self._ncol

    @property
    def dtype(self):
        return jnp.dtype(self._dtype_name)

    @property
    def symmetric(self):
        return self._nrow == self._ncol

    @property
    def hermitian(self):
        return self._nrow == self._ncol

    def _eye_apply(self, v, out_dim):
        n_min = min(self._nrow, self._ncol)
        if out_dim == v.shape[0]:
            return v
        if out_dim < v.shape[0]:
            return v[:out_dim]
        return jnp.zeros((out_dim,), v.dtype).at[:n_min].set(v[:n_min])

    def apply(self, v, mode: str = "N"):
        out_dim = self.out_dim(mode)
        return self._eye_apply(v, out_dim)

    def apply_matrix(self, M, mode: str = "N"):
        out_dim = self.out_dim(mode)
        n_min = min(self._nrow, self._ncol)
        if out_dim == M.shape[0]:
            return M
        if out_dim < M.shape[0]:
            return M[:out_dim, :]
        return jnp.zeros((out_dim, M.shape[1]), M.dtype).at[:n_min, :].set(M[:n_min, :])

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _name(self):
        return "Identity operator"


register_operator(Eye)


class Ones(LinearOperator):
    """All-ones operator: ``y = sum(v) * ones(nrow)``
    (reference: src/special-operators.jl:79-100)."""

    _fields_children = ()
    _fields_aux = ("_nrow", "_ncol", "_dtype_name")

    def __init__(self, nrow: int, ncol: int, *, dtype=jnp.float64):
        super().__init__()
        self._nrow = int(nrow)
        self._ncol = int(ncol)
        self._dtype_name = jnp.dtype(dtype).name

    @property
    def nrow(self):
        return self._nrow

    @property
    def ncol(self):
        return self._ncol

    @property
    def dtype(self):
        return jnp.dtype(self._dtype_name)

    @property
    def symmetric(self):
        return self._nrow == self._ncol

    @property
    def hermitian(self):
        return self._nrow == self._ncol

    def apply(self, v, mode: str = "N"):
        out_dim = self.out_dim(mode)
        return jnp.full((out_dim,), jnp.sum(v), dtype=v.dtype)

    def apply_matrix(self, M, mode: str = "N"):
        out_dim = self.out_dim(mode)
        col_sums = jnp.sum(M, axis=0, keepdims=True)
        return jnp.broadcast_to(col_sums, (out_dim, M.shape[1]))

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _name(self):
        return "Ones operator"


register_operator(Ones)


class Zeros(LinearOperator):
    """Zero operator (reference: src/special-operators.jl:102-123)."""

    _fields_children = ()
    _fields_aux = ("_nrow", "_ncol", "_dtype_name")

    def __init__(self, nrow: int, ncol: int, *, dtype=jnp.float64):
        super().__init__()
        self._nrow = int(nrow)
        self._ncol = int(ncol)
        self._dtype_name = jnp.dtype(dtype).name

    @property
    def nrow(self):
        return self._nrow

    @property
    def ncol(self):
        return self._ncol

    @property
    def dtype(self):
        return jnp.dtype(self._dtype_name)

    @property
    def symmetric(self):
        return self._nrow == self._ncol

    @property
    def hermitian(self):
        return self._nrow == self._ncol

    def apply(self, v, mode: str = "N"):
        return jnp.zeros((self.out_dim(mode),), v.dtype)

    def apply_matrix(self, M, mode: str = "N"):
        return jnp.zeros((self.out_dim(mode), M.shape[1]), M.dtype)

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _name(self):
        return "Zeros operator"


register_operator(Zeros)


# -- reference-parity spellings ----------------------------------------------


def opEye(*args, dtype=jnp.float64):
    """``opEye()`` | ``opEye(n)`` | ``opEye(nrow, ncol)`` with ``dtype=``
    (reference: src/special-operators.jl:14,53,69)."""
    if len(args) == 0:
        return UniversalEye()
    if len(args) == 1:
        return Eye(args[0], dtype=dtype)
    return Eye(args[0], args[1], dtype=dtype)


def opOnes(nrow, ncol, *, dtype=jnp.float64):
    return Ones(nrow, ncol, dtype=dtype)


def opZeros(nrow, ncol, *, dtype=jnp.float64):
    return Zeros(nrow, ncol, dtype=dtype)
