"""hcat/vcat/hvcat oracle tests vs dense concatenation
(reference: test/test_cat.jl)."""

import numpy as np
import pytest

import linops_tpu as lo
from helpers import simple_matrix, simple_vector, assert_close, RTOL

DTYPES = [np.float64, np.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
def test_hcat(dtype, rng):
    A = simple_matrix(dtype, 4, 3, rng)
    B = simple_matrix(dtype, 4, 2, rng)
    op = lo.hcat(lo.LinearOperator(A), lo.LinearOperator(B))
    M = np.hstack([A, B])
    assert op.shape == (4, 5)
    v = simple_vector(dtype, 5)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)
    u = simple_vector(dtype, 4)
    assert_close(op.T @ u, M.T @ u, rtol=10 * RTOL)
    assert_close(op.H @ u, M.conj().T @ u, rtol=10 * RTOL)
    assert_close(lo.to_dense(op), M, rtol=10 * RTOL)


@pytest.mark.parametrize("dtype", DTYPES)
def test_vcat(dtype, rng):
    A = simple_matrix(dtype, 4, 3, rng)
    B = simple_matrix(dtype, 2, 3, rng)
    op = lo.vcat(lo.LinearOperator(A), lo.LinearOperator(B))
    M = np.vstack([A, B])
    assert op.shape == (6, 3)
    v = simple_vector(dtype, 3)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)
    u = simple_vector(dtype, 6)
    assert_close(op.T @ u, M.T @ u, rtol=10 * RTOL)
    assert_close(op.H @ u, M.conj().T @ u, rtol=10 * RTOL)


def test_cat_shape_errors(rng):
    A = lo.LinearOperator(simple_matrix(np.float64, 4, 3, rng))
    B = lo.LinearOperator(simple_matrix(np.float64, 3, 3, rng))
    with pytest.raises(lo.LinearOperatorException):
        lo.hcat(A, B)
    C = lo.LinearOperator(simple_matrix(np.float64, 4, 2, rng))
    with pytest.raises(lo.LinearOperatorException):
        lo.vcat(A, C)


@pytest.mark.parametrize("dtype", DTYPES)
def test_hvcat(dtype, rng):
    A = simple_matrix(dtype, 2, 2, rng)
    B = simple_matrix(dtype, 2, 3, rng)
    C = simple_matrix(dtype, 3, 2, rng)
    D = simple_matrix(dtype, 3, 3, rng)
    op = lo.hvcat(
        (2, 2),
        lo.LinearOperator(A),
        lo.LinearOperator(B),
        lo.LinearOperator(C),
        lo.LinearOperator(D),
    )
    M = np.block([[A, B], [C, D]])
    assert op.shape == (5, 5)
    v = simple_vector(dtype, 5)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)
    assert_close(op.H @ v, M.conj().T @ v, rtol=10 * RTOL)


def test_cat_mixed_matrix_operand(rng):
    A = simple_matrix(np.float64, 3, 2, rng)
    B = simple_matrix(np.float64, 3, 3, rng)
    op = lo.hcat(lo.LinearOperator(A), B)  # bare matrix auto-wrapped
    M = np.hstack([A, B])
    v = simple_vector(np.float64, 5)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)


def test_nary_cat(rng):
    mats = [simple_matrix(np.float64, 3, k, rng) for k in (1, 2, 3)]
    op = lo.hcat(*[lo.LinearOperator(m) for m in mats])
    M = np.hstack(mats)
    v = simple_vector(np.float64, 6)
    assert_close(op @ v, M @ v, rtol=10 * RTOL)


def test_hvcat_count_mismatch(rng):
    """hvcat validates that the row layout consumes every operator."""
    import jax.numpy as jnp
    A = lo.LinearOperator(jnp.asarray(rng.standard_normal((3, 3))))
    with pytest.raises(lo.LinearOperatorException):
        lo.hvcat((2,), A, A, A)  # one operator silently dropped before
