"""Jitted Krylov-style drivers: matvec chains, CG, MINRES-like iteration.

The reference's clients (JSO solvers) call ``mul!`` in hot host loops; on
TPU per-call dispatch would dominate (hundreds of µs through a remote
runtime), so the idiomatic equivalent keeps the *whole iteration* on device:
one jit containing a ``lax.fori_loop``/``while_loop`` whose body applies the
operator graph. This is BASELINE config 2's "100-matvec Krylov-style chain"
as a single compiled computation (SURVEY.md §6).

All drivers take the operator as a pytree argument, so new operators with
the same graph structure hit the compiled cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.base import LinearOperator

__all__ = ["matvec_chain", "cg", "power_iteration"]


@functools.partial(jax.jit, static_argnames=("iters", "mode", "normalize"))
def matvec_chain(op: LinearOperator, v, iters: int = 100, mode: str = "N",
                 normalize: bool = True):
    """Apply ``op`` ``iters`` times in one compiled loop (optionally
    normalizing each step to keep magnitudes bounded). Returns the final
    vector. The whole chain is ONE XLA computation: zero per-apply dispatch,
    compositions fused."""

    def body(_, x):
        y = op.apply(x, mode)
        if normalize:
            y = y / jnp.linalg.norm(y)
        return y

    return lax.fori_loop(0, iters, body, v)


@functools.partial(jax.jit, static_argnames=("maxiter",))
def cg(op: LinearOperator, b, x0=None, *, tol: float = 1e-8, maxiter: int = 100,
       M: LinearOperator = None):
    """Conjugate gradients on a symmetric positive-definite operator, with an
    optional operator preconditioner M ≈ A⁻¹ (e.g. an InverseLBFGSOperator).
    Returns (x, iterations, final residual norm). Entirely on device."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - op.apply(x, "N")
    z = M.apply(r, "N") if M is not None else r
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    tol2 = (tol * bnorm) ** 2

    def cond(state):
        _, r, _, _, k, _ = state
        return (jnp.vdot(r, r).real > tol2) & (k < maxiter)

    def body(state):
        x, r, p, rz, k, _ = state
        Ap = op.apply(p, "N")
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M.apply(r, "N") if M is not None else r
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, p, rz_new, k + 1, jnp.sqrt(jnp.vdot(r, r).real)

    init = (x, r, p, rz, jnp.zeros((), jnp.int32), jnp.linalg.norm(r))
    x, r, _, _, k, res = lax.while_loop(cond, body, init)
    return x, k, res


@functools.partial(jax.jit, static_argnames=("iters",))
def power_iteration(op: LinearOperator, v0, iters: int = 50):
    """Largest-|eigenvalue| estimate of a square operator by power iteration
    in one compiled loop. Returns (eigenvalue estimate, eigenvector)."""

    def body(_, carry):
        v, _ = carry
        w = op.apply(v, "N")
        lam = jnp.vdot(v, w)
        return w / jnp.linalg.norm(w), lam

    v = v0 / jnp.linalg.norm(v0)
    v, lam = lax.fori_loop(0, iters, body, (v, jnp.zeros((), v.dtype)))
    return lam, v
