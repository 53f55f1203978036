"""Lazy operator algebra nodes: Scale, Sum, Compose.

The reference builds a *new closure triple* per algebra operation
(reference: src/operations.jl:99-235). We build explicit graph nodes instead;
their ``apply`` pushes the mode down to children so the whole expression
traces into one fused XLA computation (SURVEY.md §7 design stance 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import (
    LinearOperator,
    LinearOperatorException,
    register_operator,
    mode_conjugated,
)

__all__ = ["Scale", "Sum", "Compose"]


def _scalar_is_real(x) -> bool:
    """Static (trace-safe) 'is this scalar real' check.

    Julia's ``isreal`` is value-based (reference: src/operations.jl:172); for
    concrete values we match it, for traced values we fall back to the dtype.
    """
    if isinstance(x, bool) or isinstance(x, (int, float)):
        return True
    if isinstance(x, complex):
        return x.imag == 0
    dt = jnp.result_type(x)
    if not jnp.issubdtype(dt, jnp.complexfloating):
        return True
    if isinstance(x, jax.core.Tracer):
        return False
    try:
        return bool(jnp.imag(x) == 0)
    except Exception:
        return False


def _resolve(op: LinearOperator, mode: str) -> str:
    """Short-circuit T/H on symmetric/hermitian nodes, mirroring the reference
    dispatch (src/adjtrans.jl:100-102, 168-170) so counters and math agree."""
    if mode == "T" and op.symmetric:
        return "N"
    if mode == "H" and op.hermitian:
        return "N"
    return mode


class Scale(LinearOperator):
    """``alpha * op``. Folds nested scales; ctprod conjugates the scalar
    (reference: src/operations.jl:163-177)."""

    _fields_children = ("alpha", "op")
    _fields_aux = ("_alpha_real",)

    def __init__(self, alpha, op: LinearOperator, *, alpha_real=None):
        super().__init__()
        if isinstance(op, Scale):
            # fold: a * (b * A) -> (a*b) * A
            inner_real = op._alpha_real
            alpha_real_outer = _scalar_is_real(alpha) if alpha_real is None else alpha_real
            self.alpha = alpha * op.alpha
            self.op = op.op
            self._alpha_real = inner_real and alpha_real_outer
        else:
            self.alpha = alpha
            self.op = op
            self._alpha_real = _scalar_is_real(alpha) if alpha_real is None else alpha_real

    @property
    def nrow(self):
        return self.op.nrow

    @property
    def ncol(self):
        return self.op.ncol

    @property
    def dtype(self):
        # result_type with the raw scalar keeps Python-number weak typing
        # (2.0 * float32-op stays float32, matching reference promote_type
        # ergonomics).
        return jnp.result_type(self.alpha, self.op.dtype)

    @property
    def symmetric(self):
        return self.op.symmetric

    @property
    def hermitian(self):
        # reference: hermitian preserved iff isreal(x) (src/operations.jl:172)
        return self.op.hermitian and self._alpha_real

    def apply(self, v, mode: str = "N"):
        mode = _resolve(self, mode)
        a = self.alpha
        if mode_conjugated(mode) or mode == "H":
            # ctprod uses x' (reference: src/operations.jl:167)
            a = jnp.conj(a) if not self._alpha_real else a
        return a * self.op.apply(v, mode)

    def apply_matrix(self, M, mode: str = "N"):
        mode = _resolve(self, mode)
        a = self.alpha
        if mode_conjugated(mode) or mode == "H":
            a = jnp.conj(a) if not self._alpha_real else a
        return a * self.op.apply_matrix(M, mode)

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        self.op.bump(_resolve(self, mode), n)

    def _name(self):
        return "Scaled operator"


register_operator(Scale)


class Sum(LinearOperator):
    """``op1 + op2`` with ANDed flags (reference: src/operations.jl:199-215).

    Structural symmetry (``x + x^H`` / ``x + x^T`` on the same object) is
    detected ONCE at construction and stored as aux: pytree
    flatten/unflatten (sharding, checkpoint load, jit reconstruction)
    rebuilds the children as distinct objects, so an identity check in
    the flag properties would silently lose the flag downstream."""

    _fields_children = ("op1", "op2")
    _fields_aux = ("_struct_herm", "_struct_symm")

    def __init__(self, op1: LinearOperator, op2: LinearOperator,
                 _struct_herm: bool = None, _struct_symm: bool = None):
        super().__init__()
        if op1.shape != op2.shape:
            raise LinearOperatorException("shape mismatch")
        self.op1 = op1
        self.op2 = op2
        if _struct_herm is None or _struct_symm is None:
            from .adjoint import AdjointOperator, TransposeOperator

            adj = self._is_structural_pair(AdjointOperator)
            trans = self._is_structural_pair(TransposeOperator)
            real = not jnp.issubdtype(jnp.dtype(self.dtype), jnp.complexfloating)
            _struct_herm = adj or (real and trans)
            _struct_symm = trans or (real and adj)
        self._struct_herm = bool(_struct_herm)
        self._struct_symm = bool(_struct_symm)

    def _is_structural_pair(self, cls) -> bool:
        # x + wrapper(x) on the SAME object: x + x^H is hermitian and
        # x + x^T symmetric by construction. The reference's
        # Hermitian/Symmetric builders (src/abstract.jl:231-253) return
        # exactly this shape, so the inference makes `hermitianized()`
        # compose with hermitian-gated consumers (lobpcg, SLQ, checks).
        return (isinstance(self.op2, cls) and self.op2.parent is self.op1) or (
            isinstance(self.op1, cls) and self.op1.parent is self.op2
        )

    @property
    def nrow(self):
        return self.op1.nrow

    @property
    def ncol(self):
        return self.op1.ncol

    @property
    def dtype(self):
        return jnp.result_type(self.op1.dtype, self.op2.dtype)

    @property
    def symmetric(self):
        return self._struct_symm or (self.op1.symmetric and self.op2.symmetric)

    @property
    def hermitian(self):
        return self._struct_herm or (self.op1.hermitian and self.op2.hermitian)

    def apply(self, v, mode: str = "N"):
        mode = _resolve(self, mode)
        return self.op1.apply(v, mode) + self.op2.apply(v, mode)

    def apply_matrix(self, M, mode: str = "N"):
        mode = _resolve(self, mode)
        return self.op1.apply_matrix(M, mode) + self.op2.apply_matrix(M, mode)

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        mode = _resolve(self, mode)
        self.op1.bump(mode, n)
        self.op2.bump(mode, n)

    def _name(self):
        return "Sum of operators"


register_operator(Sum)


class Compose(LinearOperator):
    """``op1 @ op2``: result flags are always (False, False)
    (reference: src/operations.jl:131-156). (AB)^T = B^T A^T, so T/H modes
    reverse the traversal order."""

    _fields_children = ("op1", "op2")
    _fields_aux = ()

    def __init__(self, op1: LinearOperator, op2: LinearOperator):
        super().__init__()
        if op1.ncol != op2.nrow:
            raise LinearOperatorException("shape mismatch")
        self.op1 = op1
        self.op2 = op2

    @property
    def nrow(self):
        return self.op1.nrow

    @property
    def ncol(self):
        return self.op2.ncol

    @property
    def dtype(self):
        return jnp.result_type(self.op1.dtype, self.op2.dtype)

    def apply(self, v, mode: str = "N"):
        if mode in ("N", "C"):
            return self.op1.apply(self.op2.apply(v, mode), mode)
        return self.op2.apply(self.op1.apply(v, mode), mode)

    def apply_matrix(self, M, mode: str = "N"):
        if mode in ("N", "C"):
            return self.op1.apply_matrix(self.op2.apply_matrix(M, mode), mode)
        return self.op2.apply_matrix(self.op1.apply_matrix(M, mode), mode)

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        self.op1.bump(mode, n)
        self.op2.bump(mode, n)

    def _name(self):
        return "Composition of operators"


register_operator(Compose)
