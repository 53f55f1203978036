"""Shifted operator: ``H + sigma * I`` with a mutable shift.

Reference: src/shifted_operators.jl. The shift sigma is *mutable after
construction* (tested at reference test/test_shifted_operator.jl:60); here it
is a pytree leaf read at flatten time, so updating ``op.sigma`` changes the
applied value WITHOUT retracing/recompiling (it is a traced scalar argument,
not a compile-time constant — SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException, register_operator
from ..core.dense import aslinearoperator

__all__ = ["ShiftedOperator"]


from ..core.algebra import _scalar_is_real as _sigma_is_real  # shared trace-safe check


class ShiftedOperator(LinearOperator):
    _fields_children = ("op", "sigma")
    _fields_aux = ()

    def __init__(self, op, sigma=0.0):
        super().__init__()
        op = aslinearoperator(op)
        if op.nrow != op.ncol:
            raise LinearOperatorException("Operator H must be square.")
        self.op = op
        # enforce sigma matches the operator eltype (reference:
        # src/shifted_operators.jl:72)
        self.sigma = jnp.asarray(sigma, dtype=op.dtype)

    @property
    def nrow(self):
        return self.op.nrow

    @property
    def ncol(self):
        return self.op.ncol

    @property
    def dtype(self):
        return jnp.result_type(self.op.dtype, jnp.result_type(self.sigma))

    @property
    def symmetric(self):
        return self.op.symmetric

    @property
    def hermitian(self):
        # re-checked dynamically against the CURRENT sigma (reference:
        # src/shifted_operators.jl:90)
        return self.op.hermitian and _sigma_is_real(self.sigma)

    def apply(self, v, mode: str = "N"):
        s = self.sigma
        if mode in ("H", "C") and jnp.issubdtype(jnp.result_type(s), jnp.complexfloating):
            # ctprod uses conj(sigma) (reference: src/shifted_operators.jl:40-49)
            s = jnp.conj(s)
        return self.op.apply(v, mode) + s * v

    def apply_matrix(self, M, mode: str = "N"):
        s = self.sigma
        if mode in ("H", "C") and jnp.issubdtype(jnp.result_type(s), jnp.complexfloating):
            s = jnp.conj(s)
        return self.op.apply_matrix(M, mode) + s * M

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        self.op.bump(mode, n)

    def set_sigma(self, sigma):
        """Update the shift in place (host-side); applies see the new value
        with no recompilation."""
        self.sigma = jnp.asarray(sigma, dtype=self.op.dtype)
        return self

    def _name(self):
        return "Shifted operator"


register_operator(ShiftedOperator)
