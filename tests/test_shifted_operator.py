"""ShiftedOperator tests — including mutable sigma without recompilation
(reference: test/test_shifted_operator.jl, mutation tested at :60)."""

import numpy as np
import pytest

import linops_tpu as lo
from helpers import simple_matrix, simple_vector, assert_close, RTOL


def test_shifted_basic(rng):
    H = simple_matrix(np.float64, 5, 5, rng, symmetric=True)
    opH = lo.LinearOperator(H, symmetric=True, hermitian=True)
    sigma = 0.7
    op = lo.ShiftedOperator(opH, sigma)
    M = H + sigma * np.eye(5)
    v = simple_vector(np.float64, 5)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)
    assert_close(op.T @ v, M.T @ v, rtol=10 * RTOL)
    assert_close(op.H @ v, M.T @ v, rtol=10 * RTOL)
    assert op.symmetric and op.hermitian


def test_shifted_mutable_sigma(rng):
    H = simple_matrix(np.float64, 4, 4, rng)
    opH = lo.LinearOperator(H)
    op = lo.ShiftedOperator(opH, 0.0)
    v = simple_vector(np.float64, 4)
    assert_close(op @ v, H @ v, rtol=10 * RTOL)
    sizes0 = lo.apply_cache_sizes()
    op.set_sigma(2.5)
    assert_close(op @ v, (H + 2.5 * np.eye(4)) @ v, rtol=10 * RTOL)
    # updating sigma must NOT recompile (traced scalar, not constant)
    assert lo.apply_cache_sizes()["apply"] == sizes0["apply"]


def test_shifted_complex_adjoint(rng):
    H = simple_matrix(np.complex128, 4, 4, rng)
    Hh = (H + H.conj().T) / 2
    opH = lo.LinearOperator(Hh, hermitian=True)
    sigma = 1.0 + 2.0j
    op = lo.ShiftedOperator(opH, sigma)
    M = Hh + sigma * np.eye(4)
    v = simple_vector(np.complex128, 4)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)
    # ctprod uses conj(sigma) (reference: src/shifted_operators.jl:40-49)
    assert_close(op.H @ v, M.conj().T @ v, rtol=10 * RTOL)
    # hermitian flag re-checked against current sigma (reference :90)
    assert not op.hermitian
    op.set_sigma(1.0 + 0j)
    assert op.hermitian


def test_shifted_requires_square(rng):
    A = simple_matrix(np.float64, 4, 3, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.ShiftedOperator(lo.LinearOperator(A), 1.0)
