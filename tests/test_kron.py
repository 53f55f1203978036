"""Kronecker operator vs dense np.kron with random probes
(reference: test/test_kron.jl — 100 random matvec probes, abs err < 1e-12)."""

import numpy as np
import pytest

import linops_tpu as lo
from helpers import simple_matrix, assert_close

DTYPES = [np.float64, np.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shapes", [((3, 3), (2, 2)), ((4, 2), (3, 5)), ((2, 5), (4, 3))])
def test_kron_probes(dtype, shapes, rng):
    (m, n), (p, q) = shapes
    A = simple_matrix(dtype, m, n, rng)
    B = simple_matrix(dtype, p, q, rng)
    K = np.kron(A, B)
    op = lo.kron(lo.LinearOperator(A), lo.LinearOperator(B))
    assert op.shape == K.shape
    normK = np.linalg.norm(K, 2)
    for _ in range(20):
        x = rng.standard_normal(n * q)
        if dtype == np.complex128:
            x = x + 1j * rng.standard_normal(n * q)
        err = np.linalg.norm(np.asarray(op @ x) - K @ x)
        assert err < 1e-12 * normK * np.linalg.norm(x)
    u = rng.standard_normal(m * p)
    assert_close(op.T @ u, K.T @ u, rtol=1e-10)
    assert_close(op.H @ u, K.conj().T @ u, rtol=1e-10)


def test_kron_mixed_and_dense(rng):
    A = simple_matrix(np.float64, 2, 2, rng)
    B = simple_matrix(np.float64, 3, 3, rng)
    # both arrays -> dense kron
    K = lo.kron(A, B)
    assert not isinstance(K, lo.AbstractLinearOperator)
    assert_close(K, np.kron(A, B))
    # mixed -> operator
    op = lo.kron(lo.LinearOperator(A), B)
    assert isinstance(op, lo.AbstractLinearOperator)
    x = rng.standard_normal(6)
    assert_close(op @ x, np.kron(A, B) @ x, rtol=1e-10)


def test_kron_flags(rng):
    S = simple_matrix(np.float64, 3, 3, rng, symmetric=True)
    opS = lo.LinearOperator(S, symmetric=True, hermitian=True)
    kk = lo.kron(opS, opS)
    assert kk.symmetric and kk.hermitian
    A = lo.LinearOperator(simple_matrix(np.float64, 3, 3, rng))
    assert not lo.kron(opS, A).symmetric


def test_kron_to_dense(rng):
    A = simple_matrix(np.float64, 2, 3, rng)
    B = simple_matrix(np.float64, 3, 2, rng)
    op = lo.kron(lo.LinearOperator(A), lo.LinearOperator(B))
    assert_close(lo.to_dense(op), np.kron(A, B), rtol=1e-10)
