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

__all__ = ["matvec_chain", "cg", "gmres", "power_iteration"]


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
    dt = jnp.result_type(b.dtype, op.dtype)
    b = b.astype(dt)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(dt)
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


@functools.partial(jax.jit, static_argnames=("restart", "maxiter"))
def gmres(op: LinearOperator, b, x0=None, *, tol: float = 1e-8,
          restart: int = 30, maxiter: int = 10, M: LinearOperator = None):
    """Restarted GMRES(m) for general square operators, with an optional
    left-preconditioner operator M ≈ A⁻¹. Arnoldi with full
    orthogonalization runs as one fused loop per restart cycle; the whole
    solve is a single compiled computation. Returns (x, restarts used,
    final residual norm)."""
    n = b.shape[0]
    dt = jnp.result_type(b.dtype, op.dtype)
    b = b.astype(dt)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(dt)
    m = min(restart, n)
    bnorm = jnp.linalg.norm(b)
    tol_abs = tol * jnp.where(bnorm == 0, 1.0, bnorm)

    def prec(v):
        return M.apply(v, "N") if M is not None else v

    def arnoldi_cycle(x):
        r = prec(b - op.apply(x, "N"))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dt).at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((m + 1, m), dt)

        def arnoldi_step(j, carry):
            V, H = carry
            w = prec(op.apply(V[j], "N"))
            hcol = jnp.conj(V) @ w  # rows > j are zero vectors -> 0 coeffs
            mask = jnp.arange(m + 1) <= j
            hcol = jnp.where(mask, hcol, 0.0)
            w = w - V.T @ hcol
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.where(hj1 == 0, 1.0, hj1))
            H = H.at[:, j].set(hcol).at[j + 1, j].set(hj1.astype(dt))
            return V, H

        V, H = lax.fori_loop(0, m, arnoldi_step, (V, H))
        # least squares min ||beta e1 - H y||
        e1 = jnp.zeros((m + 1,), dt).at[0].set(beta)
        y = jnp.linalg.lstsq(H, e1)[0]
        return x + V[:m].T @ y

    def cond(state):
        x, k, res = state
        return (res > tol_abs) & (k < maxiter)

    def body(state):
        x, k, _ = state
        x = arnoldi_cycle(x)
        res = jnp.linalg.norm(b - op.apply(x, "N"))
        return x, k + 1, res

    res0 = jnp.linalg.norm(b - op.apply(x, "N"))
    x, k, res = lax.while_loop(cond, body, (x, jnp.zeros((), jnp.int32), res0))
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
