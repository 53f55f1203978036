"""Adjoint / transpose / conjugate wrappers.

Zero-cost lazy wrappers with the full six-way involution group simplified at
construction time (reference: src/adjtrans.jl:7-44). A wrapper's ``apply``
simply composes its mode with the requested one; the actual inference lattice
lives in ``LinearOperator.apply`` (core/base.py).

Counter cross-mapping follows the reference exactly
(reference: src/adjtrans.jl:46-58): e.g. the adjoint wrapper's nprod is the
parent's nctprod.
"""

from __future__ import annotations

from .base import LinearOperator, register_operator, compose_modes

__all__ = [
    "AdjointOperator",
    "TransposeOperator",
    "ConjugateOperator",
    "adjoint",
    "transpose",
    "conj",
]


class _ModeWrapper(LinearOperator):
    """Shared machinery for the three wrappers. ``_mode`` is the group element
    this wrapper multiplies in."""

    _fields_children = ("parent",)
    _fields_aux = ()
    _mode = "N"

    def __init__(self, parent: LinearOperator):
        super().__init__()
        self.parent = parent

    # -- shape ----------------------------------------------------------

    @property
    def nrow(self):
        if self._mode in ("T", "H"):
            return self.parent.ncol
        return self.parent.nrow

    @property
    def ncol(self):
        if self._mode in ("T", "H"):
            return self.parent.nrow
        return self.parent.ncol

    @property
    def dtype(self):
        return self.parent.dtype

    # -- flags forwarded to parent (reference: src/adjtrans.jl:67-73) ----

    @property
    def symmetric(self):
        return self.parent.symmetric

    @property
    def hermitian(self):
        return self.parent.hermitian

    # -- apply ------------------------------------------------------------

    def apply(self, v, mode: str = "N"):
        return self.parent.apply(v, compose_modes(mode, self._mode))

    def apply_matrix(self, M, mode: str = "N"):
        return self.parent.apply_matrix(M, compose_modes(mode, self._mode))

    # -- counters delegate to parent with composed mode -------------------

    def bump(self, mode: str, n: int = 1):
        self.parent.bump(compose_modes(mode, self._mode), n)

    def reset_counters(self):
        self.parent.reset_counters()
        return self

    def _counter_for(self, mode: str) -> int:
        """Wrapper counters read through the reference's cross-mapping
        (reference: src/adjtrans.jl:46-58), via the slot the parent's
        dispatch actually bumps (an adjoint apply on a parent without
        ctprod falls back to tprod — the wrapper must read that slot)."""
        m = compose_modes(mode, self._mode)
        p = self.parent
        return getattr(p, p._slot_for(m))

    @property
    def nprod(self):
        return self._counter_for("N")

    @property
    def ntprod(self):
        return self._counter_for("T")

    @property
    def nctprod(self):
        return self._counter_for("H")

    def _name(self):
        label = {"H": "Adjoint", "T": "Transpose", "C": "Conjugate"}[self._mode]
        return f"{label} of " + self.parent._name()

    def __repr__(self):
        label = {"H": "Adjoint", "T": "Transpose", "C": "Conjugate"}[self._mode]
        return f"{label} of the following LinearOperator:\n" + repr(self.parent)


class AdjointOperator(_ModeWrapper):
    _mode = "H"


class TransposeOperator(_ModeWrapper):
    _mode = "T"


class ConjugateOperator(_ModeWrapper):
    _mode = "C"


register_operator(AdjointOperator)
register_operator(TransposeOperator)
register_operator(ConjugateOperator)

_WRAPPER_FOR = {"H": AdjointOperator, "T": TransposeOperator, "C": ConjugateOperator}


def _wrap(op: LinearOperator, mode: str) -> LinearOperator:
    """Wrap ``op`` in the given mode with full involution simplification
    (reference: src/adjtrans.jl:32-44)."""
    if mode == "N":
        return op
    if isinstance(op, _ModeWrapper):
        combined = compose_modes(mode, op._mode)
        return _wrap(op.parent, combined)
    # self-adjoint shortcuts are NOT taken here: the reference keeps the
    # wrapper and resolves via the lattice at apply time, preserving counters.
    return _WRAPPER_FOR[mode](op)


def adjoint(op: LinearOperator) -> LinearOperator:
    return _wrap(op, "H")


def transpose(op: LinearOperator) -> LinearOperator:
    return _wrap(op, "T")


def conj(op: LinearOperator) -> LinearOperator:
    return _wrap(op, "C")
