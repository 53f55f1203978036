"""Randomized property checks (reference: src/utilities.jl:61-149).

Probabilistic single-probe checks with tol eps^(1/3); exact equality for
integer element types, mirroring the reference's Integer specializations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException
from .rng import fresh_key

__all__ = ["check_ctranspose", "check_hermitian", "check_positive_definite"]


def _as_op(op):
    if isinstance(op, LinearOperator):
        return op
    from ..core.dense import aslinearoperator

    return aslinearoperator(op)


def _is_int(op) -> bool:
    return jnp.issubdtype(jnp.dtype(op.dtype), jnp.integer)


def _eps(op) -> float:
    dt = jnp.dtype(op.dtype)
    rdt = jnp.finfo(dt).dtype if jnp.issubdtype(dt, jnp.inexact) else jnp.dtype(jnp.float64)
    return float(jnp.finfo(jnp.real(jnp.zeros((), rdt)).dtype).eps)


def _rand(key, n, op):
    if _is_int(op):
        return jnp.floor(10 * jax.random.uniform(key, (n,))).astype(op.dtype) - 5
    dt = jnp.dtype(op.dtype)
    rdt = jnp.finfo(dt).dtype if jnp.issubdtype(dt, jnp.inexact) else jax.dtypes.canonicalize_dtype(jnp.float64)
    return jax.random.uniform(key, (n,), dtype=rdt)


def check_ctranspose(op, key=None) -> bool:
    """Check ⟨y, Ax⟩ ≈ conj(⟨x, A'y⟩) on random probes
    (reference: src/utilities.jl:66-83)."""
    op = _as_op(op)
    m, n = op.shape
    if key is None:
        key = fresh_key()
    k1, k2 = jax.random.split(key)
    x = _rand(k1, n, op)
    y = _rand(k2, m, op)
    yAx = jnp.vdot(y, op.matvec(x))
    xAty = jnp.vdot(x, op.matvec(y, mode="H"))
    if _is_int(op):
        return bool(yAx == xAty)
    eps = _eps(op)
    return bool(jnp.abs(yAx - jnp.conj(xAty)) < (jnp.abs(yAx) + eps) * eps ** (1 / 3))


def check_hermitian(op, key=None) -> bool:
    """Check hermicity via ‖Av‖² = ⟨v, A(Av)⟩
    (reference: src/utilities.jl:87-115)."""
    op = _as_op(op)
    m, n = op.shape
    if m != n:
        raise LinearOperatorException("shape mismatch")
    if key is None:
        key = fresh_key()
    v = _rand(key, n, op)
    w = op.matvec(v)
    s = jnp.vdot(w, w)
    t = jnp.vdot(v, op.matvec(w))
    if _is_int(op):
        return bool(s == t)
    eps = _eps(op)
    return bool(jnp.abs(s - t) < (jnp.abs(s) + eps) * eps ** (1 / 3))


def check_positive_definite(op, semi: bool = False, key=None) -> bool:
    """Single Rayleigh-quotient definiteness probe
    (reference: src/utilities.jl:117-149)."""
    op = _as_op(op)
    m, n = op.shape
    if m != n:
        raise LinearOperatorException("shape mismatch")
    if key is None:
        key = fresh_key()
    v = _rand(key, n, op)
    w = op.matvec(v)
    vw = jnp.vdot(v, w)
    if not _is_int(op):
        eps = _eps(op)
        # |imag| (the reference tests the signed value, src/utilities.jl:131,
        # which lets a large NEGATIVE imaginary part slip through — clearly
        # unintended, so we use the magnitude)
        if float(jnp.abs(jnp.imag(vw))) > (eps**0.5) * float(jnp.abs(vw)):
            return False
    vw = float(jnp.real(vw))
    return (vw >= 0) if semi else (vw > 0)
