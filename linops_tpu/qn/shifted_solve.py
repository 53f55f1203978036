"""Shifted L-BFGS system solver: (B + σI) x = b for a forward L-BFGS operator.

TPU-native implementation of the Erway-Jain-Marcia recursive
Sherman-Morrison-Woodbury method (reference: src/utilities.jl:151-289;
"Shifted L-BFGS Systems", Optim. Methods Softw. 29(5), 2014).

The 2·mem sequential rank-1 corrections (alternating over the forward form's
a/b vectors) have a loop-carried dependence; each step's inner
Gram-Schmidt-like correction over previous p-vectors is batched as one
``(2mem, n)`` mat-vec, so the whole solve is a single ``fori_loop`` of
2·mem steps compiled into one XLA loop kernel — no per-step dispatch
(SURVEY.md §7 hard part 1). The reference's preallocated ``shifted_p/v/u``
workspaces (src/lbfgs.jl:21-23) become loop-carried values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .lbfgs import LBFGSOperator, LBFGSState

__all__ = ["solve_shifted_system", "ldiv"]


@jax.jit
def _solve_shifted(state: LBFGSState, b, sigma):
    """Pure EJM recursion (reference solve_shifted_system!,
    src/utilities.jl:207-248). 0-based index mapping:
    1-based ``k = mod(insert + j - 1, mem) + 1`` → ``k0 = (insert0+j0+1) % mem``."""
    mem, n = state.S.shape
    dt = b.dtype

    gamma_inv = 1.0 / state.gamma
    x0 = 1.0 / (gamma_inv + sigma)
    x_init = x0 * b

    two_mem = 2 * mem
    # sign of the t-th previous term in the inner correction: (-1)^t (0-based)
    t_signs = jnp.where(jnp.arange(two_mem) % 2 == 0, 1.0, -1.0).astype(dt)
    t_idx = jnp.arange(two_mem)

    def body(i, carry):
        x, P, v = carry
        j = i // 2
        k = jnp.mod(state.insert + j + 1, mem)
        sign_i = jnp.where(i % 2 == 0, 1.0, -1.0).astype(dt)
        # odd 1-based i (even 0-based) uses a[k]; even uses b[k]
        # (reference: shifted_u .= sign_i == -1 ? b[k] : a[k], :231)
        u = jnp.where(sign_i == 1, state.A[k], state.B[k])

        # p_i = x0·u + Σ_{t<i} sign_t·v[t]·⟨p_t, u⟩·p_t  — one (2mem,n) matvec
        c = jnp.where(t_idx < i, t_signs * v * (P @ u), 0.0)
        p_i = x0 * u + P.T @ c

        v_i = 1.0 / (1.0 - sign_i * jnp.dot(u, p_i))
        x = x + sign_i * v_i * jnp.dot(p_i, b) * p_i
        return x, P.at[i].set(p_i), v.at[i].set(v_i)

    x, _, _ = lax.fori_loop(
        0,
        two_mem,
        body,
        (x_init, jnp.zeros((two_mem, n), dt), jnp.zeros((two_mem,), dt)),
    )
    return x


def solve_shifted_system(B: LBFGSOperator, b, sigma):
    """Solve ``(B + σI) x = b`` where B is a *forward* L-BFGS operator and
    σ ≥ 0 (reference solve_shifted_system!, src/utilities.jl:207-248).

    Returns the solution vector (functional; the reference writes into a
    preallocated ``x``)."""
    if B.inverse:
        raise ValueError("solve_shifted_system requires a forward L-BFGS operator")
    sigma_f = float(sigma)
    if sigma_f < 0:
        raise ValueError("σ must be nonnegative")
    b = jnp.asarray(b, B.dtype)
    return _solve_shifted(B.state, b, jnp.asarray(sigma_f, B.dtype))


def ldiv(B: LBFGSOperator, b):
    """Solve ``B x = b`` (σ = 0 case; reference ldiv!,
    src/utilities.jl:281-289)."""
    return solve_shifted_system(B, b, 0.0)
