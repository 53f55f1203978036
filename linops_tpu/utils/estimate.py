"""Stochastic trace and diagonal estimation (matrix-free).

Capability upgrade beyond the reference: LinearOperators.jl exposes no
trace/diagonal estimators and leaves clients to roll probe loops over
``op * v``. On TPU the natural formulation is BATCHED — a ``(n, k)``
Rademacher probe block goes through ``apply_matrix`` as one MXU
contraction per apply, so ``k`` probes cost roughly one streaming pass
over the operator, not ``k``.

- ``estimate_trace(op, method="hutchpp")`` — Hutch++ (Meyer, Musco,
  Musco, Woodruff 2021): a low-rank QR sketch captures the dominant
  spectrum exactly and plain Hutchinson handles only the deflated
  residual, giving O(1/k) error decay on spectra with decay vs
  Hutchinson's O(1/sqrt(k)). ``method="hutchinson"`` is the classic
  unbiased estimator.
- ``estimate_diagonal`` — the Bekas/Kokiopoulou/Saad probe estimator:
  ``diag(A) ~= mean_k(g_k * (A g_k))`` for Rademacher ``g_k``.

Both compile to a single XLA computation (operators ride their normal
precision-policy apply paths) and pin the operator's arrays on-chip via
the residency hint when they fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException
from ..core.precision import pmatmul
from .residency import chain_resident
from .rng import fresh_key

__all__ = ["estimate_trace", "estimate_diagonal"]


def _probe_dtype(op):
    dt = jnp.dtype(op.dtype)
    if not jnp.issubdtype(dt, jnp.inexact):
        dt = jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)
    return dt


def _rademacher(key, shape, dtype):
    # real-valued signs even for complex operators: E[g g^T] = I is all the
    # estimators need, and real probes keep the quadratic forms unbiased
    # for complex A (g^H = g^T).
    real_dt = jnp.finfo(dtype).dtype if jnp.issubdtype(dtype, jnp.complexfloating) else dtype
    return jax.random.rademacher(key, shape, real_dt).astype(dtype)


@functools.partial(jax.jit, static_argnames=())
def _hutchinson(op, G):
    op = chain_resident(op, G)
    AG = op.apply_matrix(G, "N")
    # per-probe quadratic forms g^H A g (real Rademacher: g^H == g^T)
    samples = jnp.sum(jnp.conj(G) * AG, axis=0)
    k = samples.shape[0]
    est = jnp.mean(samples)
    stderr = jnp.std(samples.real) / jnp.sqrt(k) if k > 1 else jnp.zeros((), samples.real.dtype)
    return est, stderr


@functools.partial(jax.jit, static_argnames=())
def _hutchpp(op, S, G):
    op = chain_resident(op, S)
    AS = op.apply_matrix(S, "N")
    Q, _ = jnp.linalg.qr(AS)  # (n, m) orthonormal sketch basis
    AQ = op.apply_matrix(Q, "N")
    # exact low-rank part: tr(Q^H A Q) without forming the (m, m) product
    t_lowrank = jnp.sum(jnp.conj(Q) * AQ)
    # deflate the Hutchinson probes: g' = (I - Q Q^H) g. The residual
    # trace tr((I-P) A (I-P)) is estimated by g'^H A g' (P hermitian,
    # real g), and tr(A) = tr(Q^H A Q) + tr((I-P) A (I-P)) exactly.
    Gd = G - pmatmul(Q, pmatmul(jnp.conj(Q).T, G))
    AGd = op.apply_matrix(Gd, "N")
    samples = jnp.sum(jnp.conj(Gd) * AGd, axis=0)
    k = samples.shape[0]
    est = t_lowrank + jnp.mean(samples)
    stderr = jnp.std(samples.real) / jnp.sqrt(k) if k > 1 else jnp.zeros((), samples.real.dtype)
    return est, stderr


def estimate_trace(op, *, probes: int = 36, key=None, method: str = "hutchpp"):
    """Estimate ``tr(op)`` with ``probes`` total operator-block applies.

    Returns ``(estimate, stderr)`` where ``stderr`` is the standard error
    of the stochastic part (for ``hutchpp`` the sketched low-rank part is
    exact, so the reported stderr covers only the deflated residual — the
    total error is usually far below plain Hutchinson's at equal probes).

    ``method``: ``"hutchpp"`` (default; splits probes 1/3 sketch + QR
    apply, 1/3 residual Hutchinson) or ``"hutchinson"`` (all probes on the
    plain unbiased estimator). Pass an explicit ``key`` to pin
    determinism; by default probes draw OS entropy (see utils/rng.py).
    """
    if not isinstance(op, LinearOperator):
        from ..core.dense import aslinearoperator

        op = aslinearoperator(op)
    m, n = op.shape
    if m != n:
        raise LinearOperatorException(
            f"trace requires a square operator, got shape {(m, n)}"
        )
    if probes < 1:
        raise ValueError("probes must be >= 1")
    dt = _probe_dtype(op)
    if key is None:
        key = fresh_key()

    if method == "hutchinson":
        G = _rademacher(key, (n, probes), dt)
        est, se = _hutchinson(op, G)
    elif method == "hutchpp":
        # probe budget in operator applies: m_s (A S) + m_s (A Q) + m_g (A G)
        m_s = max(1, min(probes // 3, n))
        m_g = max(1, probes - 2 * m_s)
        k1, k2 = jax.random.split(key)
        S = _rademacher(k1, (n, m_s), dt)
        G = _rademacher(k2, (n, m_g), dt)
        est, se = _hutchpp(op, S, G)
    else:
        raise ValueError(f"unknown method {method!r} (hutchpp | hutchinson)")

    if jnp.issubdtype(jnp.dtype(op.dtype), jnp.complexfloating):
        return complex(est), float(se)
    return float(jnp.real(est)), float(se)


@functools.partial(jax.jit, static_argnames=())
def _diag_probes(op, G):
    op = chain_resident(op, G)
    AG = op.apply_matrix(G, "N")
    # Bekas et al. 2007: with Rademacher probes sum_k g_k * g_k == k
    # elementwise, so the estimator is the plain probe mean.
    samples = jnp.conj(G) * AG  # (n, k) per-probe diagonal draws
    k = samples.shape[1]
    est = jnp.mean(samples, axis=1)
    if k > 1:
        stderr = jnp.std(samples.real, axis=1) / jnp.sqrt(k)
    else:
        stderr = jnp.zeros_like(est, dtype=samples.real.dtype)
    return est, stderr


def estimate_diagonal(op, *, probes: int = 64, key=None):
    """Estimate ``diag(op)`` (Bekas/Kokiopoulou/Saad probe estimator).

    Returns ``(diag, stderr)`` device arrays of length ``n``. Unbiased for
    any square operator; variance on entry ``i`` scales with the squared
    off-diagonal mass of row ``i``, so strongly diagonally-dominant
    operators converge fastest. For an EXACT diagonal of a lazy graph use
    ``op.to_dense()`` (blockwise) or a structured op's own ``diag``.
    """
    if not isinstance(op, LinearOperator):
        from ..core.dense import aslinearoperator

        op = aslinearoperator(op)
    m, n = op.shape
    if m != n:
        raise LinearOperatorException(
            f"diagonal estimation requires a square operator, got shape {(m, n)}"
        )
    if probes < 1:
        raise ValueError("probes must be >= 1")
    dt = _probe_dtype(op)
    if key is None:
        key = fresh_key()
    G = _rademacher(key, (n, probes), dt)
    return _diag_probes(op, G)
