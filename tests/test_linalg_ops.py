"""Factorization operators: opInverse / opCholesky / opLDL / opHouseholder /
opHermitian (reference test coverage in test/test_linop.jl)."""

import numpy as np
import pytest

import linops_tpu as lo
from helpers import simple_matrix, simple_vector, assert_close, RTOL

DTYPES = [np.float64, np.complex128]


def _spd(dtype, n, rng):
    A = simple_matrix(dtype, n, n, rng)
    return A @ A.conj().T + n * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("dtype", DTYPES)
def test_op_inverse(dtype, rng):
    M = simple_matrix(dtype, 5, 5, rng)
    op = lo.opInverse(M)
    Minv = np.linalg.inv(M)
    v = simple_vector(dtype, 5)
    assert_close(op @ v, Minv @ v, rtol=100 * RTOL)
    assert_close(op.T @ v, Minv.T @ v, rtol=100 * RTOL)
    assert_close(op.H @ v, Minv.conj().T @ v, rtol=100 * RTOL)
    assert_close(lo.to_dense(op @ lo.LinearOperator(M)), np.eye(5), rtol=100 * RTOL)


@pytest.mark.parametrize("dtype", DTYPES)
def test_op_cholesky(dtype, rng):
    M = _spd(dtype, 5, rng)
    op = lo.opCholesky(M, check=True)
    Minv = np.linalg.inv(M)
    v = simple_vector(dtype, 5)
    assert_close(op @ v, Minv @ v, rtol=100 * RTOL)
    assert_close(op.T @ v, Minv.T @ v, rtol=100 * RTOL)
    assert_close(op.H @ v, Minv.conj().T @ v, rtol=100 * RTOL)
    assert op.hermitian
    assert op.symmetric == (dtype == np.float64)


def test_op_cholesky_check_rejects(rng):
    M = simple_matrix(np.float64, 5, 5, rng)  # not symmetric
    with pytest.raises(lo.LinearOperatorException):
        lo.opCholesky(M, check=True)
    # negative definite
    N = -_spd(np.float64, 5, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.opCholesky(N, check=True)


@pytest.mark.parametrize("dtype", DTYPES)
def test_op_ldl(dtype, rng):
    # symmetric indefinite
    A = simple_matrix(dtype, 5, 5, rng)
    M = (A + A.conj().T) / 2
    M = M - 1.5 * np.eye(5)  # make indefinite
    op = lo.opLDL(M)
    v = simple_vector(dtype, 5)
    assert_close(np.asarray(lo.LinearOperator(M) @ (op @ v)), np.asarray(v), rtol=1e3 * RTOL)


@pytest.mark.parametrize("dtype", DTYPES)
def test_op_householder(dtype, rng):
    h = np.asarray(simple_vector(dtype, 5)) / np.linalg.norm(simple_vector(dtype, 5))
    H = np.eye(5) - 2 * np.outer(h, h.conj())
    op = lo.opHouseholder(h)
    v = simple_vector(dtype, 5)
    assert_close(op @ v, H @ v, rtol=10 * RTOL)
    assert_close(op.H @ v, H.conj().T @ v, rtol=10 * RTOL)
    assert_close(op.T @ v, H.T @ v, rtol=10 * RTOL)
    assert op.hermitian


@pytest.mark.parametrize("dtype", DTYPES)
def test_op_hermitian(dtype, rng):
    B = simple_matrix(dtype, 5, 5, rng)
    A = (B + B.conj().T) / 2
    op = lo.opHermitian(np.real(np.diagonal(A)).astype(dtype), A)
    v = simple_vector(dtype, 5)
    assert_close(op @ v, A @ v, rtol=10 * RTOL)
    assert_close(op.H @ v, A.conj().T @ v, rtol=10 * RTOL)
    assert_close(op.T @ v, A.T @ v, rtol=10 * RTOL)
    assert op.hermitian
    # single-arg form takes diagonal + lower triangle of the matrix
    op2 = lo.opHermitian(A)
    assert_close(op2 @ v, A @ v, rtol=10 * RTOL)


def test_timed_operator(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    op = lo.TimedOperator(lo.LinearOperator(A))
    v = simple_vector(np.float64, 4)
    assert_close(op @ v, A @ v)
    assert_close(op.T @ v, A.T @ v)
    assert op.timings["prod"][0] == 1
    assert op.timings["prod"][1] > 0
    # decorator commutes with adjoint (reference: src/TimedOperators.jl:35-37)
    assert isinstance(op.H, lo.TimedOperator)
    r = repr(op)
    assert "ncalls" in r


# ---------------------------------------------------------------------------
# Sparse factorization (host-callback solves; reference opLDL ext)
# ---------------------------------------------------------------------------


def test_sparse_inverse(rng):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    import numpy as np
    from linops_tpu.ops.sparse_factor import opSparseInverse, opSparseLDL

    n = 40
    A = scipy_sparse.random(n, n, density=0.2, random_state=3) + scipy_sparse.eye(n) * n
    A = A.tocsc()
    op = opSparseInverse(A)
    b = rng.standard_normal(n)
    x = np.asarray(op * b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-10
    xt = np.asarray(op.T * b)
    assert np.linalg.norm(A.T @ xt - b) / np.linalg.norm(b) < 1e-10

    # symmetric quasi-definite LDL route
    S = (A + A.T) / 2
    opl = opSparseLDL(S, check=True)
    xs = np.asarray(opl * b)
    assert np.linalg.norm(S @ xs - b) / np.linalg.norm(b) < 1e-10

    # inside a jitted graph
    import jax
    y = jax.jit(lambda v: op.apply(v, "N"))(b)
    assert np.linalg.norm(A @ np.asarray(y) - b) / np.linalg.norm(b) < 1e-10


def test_sparse_ldl_asymmetric_check(rng):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from linops_tpu.ops.sparse_factor import opSparseLDL

    A = scipy_sparse.random(10, 10, density=0.5, random_state=1).tocsc() + scipy_sparse.eye(10)
    with pytest.raises(lo.LinearOperatorException):
        opSparseLDL(A, check=True)


# ---------------------------------------------------------------------------
# opIterativeInverse (matrix-free inverse via inner Krylov solves)
# ---------------------------------------------------------------------------


def test_iterative_inverse_hermitian(rng):
    import jax
    import jax.numpy as jnp

    n = 30
    A = simple_matrix(np.float64, n, n, rng, symmetric=True) + 3.0 * np.eye(n)
    op = lo.LinearOperator(A, symmetric=True, hermitian=True)
    inv = lo.opIterativeInverse(op, tol=1e-12, maxiter=200)
    assert inv.hermitian and inv.shape == (n, n)
    v = simple_vector(np.float64, n)
    np.testing.assert_allclose(np.asarray(inv @ v), np.linalg.solve(A, v),
                               rtol=1e-8, atol=1e-10)
    # graph composition: inv @ op ~= identity
    np.testing.assert_allclose(np.asarray((inv @ op) @ v), v, rtol=1e-7,
                               atol=1e-9)
    # traceable: works inside an outer jit
    y = jax.jit(lambda o, b: o @ b)(inv, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y), np.linalg.solve(A, v), rtol=1e-8)


def test_iterative_inverse_nonsymmetric_modes(rng):
    n = 24
    A = simple_matrix(np.float64, n, n, rng) + 4.0 * np.eye(n)
    inv = lo.opIterativeInverse(lo.LinearOperator(A), tol=1e-12, maxiter=400)
    v = simple_vector(np.float64, n)
    np.testing.assert_allclose(np.asarray(inv @ v), np.linalg.solve(A, v),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(inv.T @ v),
                               np.linalg.solve(A.T, v), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(inv.H @ v),
                               np.linalg.solve(A.T, v), rtol=1e-7, atol=1e-9)


def test_iterative_inverse_as_preconditioner(rng):
    import jax.numpy as jnp

    # inexact inner solves as a preconditioner for an outer solver
    n = 40
    A = simple_matrix(np.float64, n, n, rng, symmetric=True) + 5.0 * np.eye(n)
    op = lo.LinearOperator(A, symmetric=True, hermitian=True)
    M = lo.opIterativeInverse(op, tol=1e-2, maxiter=10, solver="cg")
    b = jnp.asarray(simple_vector(np.float64, n))
    x, it, res = lo.cg(op, b, tol=1e-10, maxiter=200, M=M)
    assert float(res) < 1e-8
    assert int(it) <= 6  # a near-inverse preconditioner converges in a few


def test_iterative_inverse_validation(rng):
    with pytest.raises(lo.LinearOperatorException):
        lo.opIterativeInverse(lo.LinearOperator(np.ones((3, 4))))
    with pytest.raises(ValueError):
        lo.opIterativeInverse(lo.LinearOperator(np.eye(4)), solver="nope")


def test_iterative_inverse_review_findings(rng):
    """Round-2 review regressions: auto solver must not silently break
    down (skew-symmetric bicgstab), operator-data gradients must flow
    (full implicit differentiation), and T/H applies hit their counter
    slots."""
    import jax
    import jax.numpy as jnp

    n = 14
    v = jnp.asarray(simple_vector(np.float64, n))

    # skew-symmetric: bicgstab breaks down; auto (gmres) converges
    K = rng.standard_normal((n, n))
    K = K - K.T
    invK = lo.opIterativeInverse(lo.LinearOperator(K), tol=1e-10, maxiter=300)
    x = invK @ v
    assert float(jnp.linalg.norm(jnp.asarray(K) @ x - v)) < 1e-8
    xi, it, res = invK.solve_info(v)
    assert float(res) < 1e-8

    # full implicit differentiation: grads w.r.t. the WRAPPED OPERATOR'S
    # data match the dense-solve oracle
    S = rng.standard_normal((n, n))
    S = S @ S.T + 5 * np.eye(n)

    def loss_op(A):
        inv = lo.opIterativeInverse(
            lo.LinearOperator(A, symmetric=True, hermitian=True),
            tol=1e-13, maxiter=400)
        return jnp.sum(inv @ v)

    gA = jax.grad(loss_op)(jnp.asarray(S))
    gD = jax.grad(lambda A: jnp.sum(jnp.linalg.solve(A, v)))(jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(gA), np.asarray(gD), atol=1e-7)

    # counter contract: T/H applies are not miscounted as nprod
    invn = lo.opIterativeInverse(
        lo.LinearOperator(rng.standard_normal((n, n)) + 5 * np.eye(n)),
        tol=1e-10, maxiter=300)
    invn.reset_counters()
    _ = invn @ v
    _ = invn.T @ v
    _ = invn.H @ v
    assert (invn.nprod, invn.ntprod, invn.nctprod) == (1, 1, 1)
