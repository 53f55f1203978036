"""GMRES driver tests (nonsymmetric Krylov solver, all on device)."""

import numpy as np
import jax.numpy as jnp
import pytest

import linops_tpu as lo


def test_gmres_nonsymmetric(rng):
    n = 40
    A = rng.standard_normal((n, n)) + n * np.eye(n)  # well-conditioned, nonsym
    op = lo.LinearOperator(jnp.asarray(A))
    b = jnp.asarray(rng.standard_normal(n))
    x, k, res = lo.gmres(op, b, tol=1e-10, restart=20, maxiter=20)
    err = np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b)
    assert err < 1e-9, err


def test_gmres_preconditioned(rng):
    n = 60
    A = rng.standard_normal((n, n)) * 0.1 + np.diag(rng.random(n) + 1.0)
    op = lo.LinearOperator(jnp.asarray(A))
    Mi = lo.opDiagonal(1.0 / jnp.diag(jnp.asarray(A)))  # Jacobi preconditioner
    b = jnp.asarray(rng.standard_normal(n))
    x0, k0, _ = lo.gmres(op, b, tol=1e-10, restart=15, maxiter=30)
    x1, k1, _ = lo.gmres(op, b, tol=1e-10, restart=15, maxiter=30, M=Mi)
    for x in (x0, x1):
        err = np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b)
        assert err < 1e-8


def test_gmres_on_sparse_operator(rng):
    n = 64
    A = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)) + n * np.eye(n)
    op = lo.opSparse(A, format="csr")
    b = jnp.asarray(rng.standard_normal(n))
    x, k, res = lo.gmres(op, b, tol=1e-9, restart=25, maxiter=10)
    assert np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b) < 1e-8


def test_gmres_complex_operator_real_rhs(rng):
    """Complex operator with real b promotes the Krylov basis (regression:
    complex residual silently truncated into a real buffer)."""
    n = 12
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)) + n * np.eye(n)
    op = lo.LinearOperator(jnp.asarray(A))
    b = jnp.asarray(rng.standard_normal(n))
    x, k, res = lo.gmres(op, b, tol=1e-10, restart=n, maxiter=10)
    err = np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b)
    assert err < 1e-9, err


def test_cg_complex_operator_real_rhs(rng):
    """Hermitian complex operator + real b traces and solves (regression:
    while_loop carry dtype mismatch)."""
    n = 16
    M = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = M @ M.conj().T + n * np.eye(n)
    op = lo.LinearOperator(jnp.asarray(A), symmetric=False, hermitian=True)
    b = jnp.asarray(rng.standard_normal(n))
    x, k, res = lo.cg(op, b, tol=1e-10, maxiter=200)
    err = np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b)
    assert err < 1e-8, err
