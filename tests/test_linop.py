"""Core operator algebra tests — port of the reference test contract in
test/test_linop.jl (oracle pattern: dense A vs wrapped operator for every
algebraic combination), plus counters, flag-inference errors, eltype lying,
and the recompilation guard that replaces the reference's zero-allocation
assertions."""

import numpy as np
import pytest
import jax.numpy as jnp

import linops_tpu as lo
from helpers import simple_matrix, simple_vector, assert_close, RTOL

DTYPES = [np.float64, np.complex128]


# ----------------------------------------------------------------------------
# basic wrap + apply oracle (test_linop.jl:43-112)
# ----------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", DTYPES)
def test_matrix_operator_basic(dtype, rng):
    A = simple_matrix(dtype, 5, 3, rng)
    op = lo.LinearOperator(A)
    assert op.shape == (5, 3)
    assert op.size(1) == 5 and op.size(2) == 3
    assert jnp.dtype(op.dtype) == jnp.dtype(dtype)

    v = simple_vector(dtype, 3)
    assert_close(op @ v, A @ v)
    u = simple_vector(dtype, 5)
    assert_close(op.T @ u, A.T @ u)
    assert_close(op.H @ u, A.conj().T @ u)
    assert_close(op.conj() @ v, A.conj() @ v)
    assert_close(op.to_dense(), A)


@pytest.mark.parametrize("dtype", DTYPES)
def test_algebra_oracle(dtype, rng):
    A = simple_matrix(dtype, 5, 5, rng)
    B = simple_matrix(dtype, 5, 5, rng)
    opA = lo.LinearOperator(A)
    opB = lo.LinearOperator(B)
    v = simple_vector(dtype, 5)

    cases = {
        "sum": (opA + opB, A + B),
        "sub": (opA - opB, A - B),
        "compose": (opA @ opB, A @ B),
        "neg": (-opA, -A),
        "scale": (2.5 * opA, 2.5 * A),
        "scale_r": (opA * 2.5, A * 2.5),
        "div": (opA / 2.0, A / 2.0),
        "affine": (2.0 * opA @ opB - opB.T / 3.0, 2.0 * A @ B - B.T / 3.0),
    }
    for name, (op, M) in cases.items():
        assert_close(op @ v, M @ v, rtol=10 * RTOL)
        assert_close(op.T @ v, M.T @ v, rtol=10 * RTOL)
        assert_close(op.H @ v, M.conj().T @ v, rtol=10 * RTOL)
        assert_close(op.to_dense(), M, rtol=10 * RTOL)


@pytest.mark.parametrize("dtype", DTYPES)
def test_scalar_plus_operator(dtype, rng):
    # reference: op + x == op + x*opOnes (src/operations.jl:222)
    A = simple_matrix(dtype, 4, 4, rng)
    op = lo.LinearOperator(A)
    v = simple_vector(dtype, 4)
    assert_close((op + 2.0) @ v, (A + 2.0) @ v, rtol=10 * RTOL)
    assert_close((2.0 + op) @ v, (A + 2.0) @ v, rtol=10 * RTOL)
    assert_close((op - 2.0) @ v, (A - 2.0) @ v, rtol=10 * RTOL)
    assert_close((2.0 - op) @ v, (2.0 - A) @ v, rtol=10 * RTOL)


def test_matrix_operand_autowrap(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    B = simple_matrix(np.float64, 4, 4, rng)
    op = lo.LinearOperator(A)
    v = simple_vector(np.float64, 4)
    assert_close((op + jnp.asarray(B)) @ v, (A + B) @ v, rtol=10 * RTOL)
    assert_close((op @ jnp.asarray(B)) @ v, (A @ B) @ v, rtol=10 * RTOL)
    assert_close((jnp.asarray(B) @ op) @ v, (B @ A) @ v, rtol=10 * RTOL)


def test_shape_mismatch_raises(rng):
    A = simple_matrix(np.float64, 5, 3, rng)
    B = simple_matrix(np.float64, 5, 3, rng)
    op = lo.LinearOperator(A)
    with pytest.raises(lo.LinearOperatorException):
        op @ np.ones(5)  # wrong input length
    with pytest.raises(lo.LinearOperatorException):
        lo.LinearOperator(A) @ lo.LinearOperator(B)  # 3 != 5
    with pytest.raises(lo.LinearOperatorException):
        lo.LinearOperator(A) + lo.LinearOperator(B.T)


# ----------------------------------------------------------------------------
# 5-arg mul! semantics (reference: src/operations.jl:22-40)
# ----------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", DTYPES)
def test_mul_axpby(dtype, rng):
    A = simple_matrix(dtype, 5, 5, rng)
    op = lo.LinearOperator(A)
    v = simple_vector(dtype, 5)
    res = simple_vector(dtype, 5) * 0.5
    alpha, beta = 2.0, 3.0
    out = lo.mul(op, v, alpha, beta, res)
    assert_close(out, alpha * (A @ v) + beta * res, rtol=10 * RTOL)
    # beta == 0 specialized path must ignore res entirely (NaN-safety,
    # reference: src/constructors.jl:66-78)
    res_nan = np.full(5, np.nan, dtype=dtype)
    out0 = lo.mul(op, v, alpha, 0, res_nan)
    assert_close(out0, alpha * (A @ v), rtol=10 * RTOL)
    assert not np.any(np.isnan(np.asarray(out0)))
    # modes
    outT = lo.mul(op, v, alpha, beta, res, mode="T")
    assert_close(outT, alpha * (A.T @ v) + beta * res, rtol=10 * RTOL)


@pytest.mark.parametrize("dtype", DTYPES)
def test_mul_matrix_axpby(dtype, rng):
    """Matrix-RHS 5-arg mul (reference: src/operations.jl:34-40)."""
    A = simple_matrix(dtype, 6, 4, rng)
    op = lo.LinearOperator(A)
    M = np.stack([simple_vector(dtype, 4) * (i + 1) for i in range(3)], axis=1)
    Res = np.stack([simple_vector(dtype, 6) * 0.5 for _ in range(3)], axis=1)
    alpha, beta = 2.0, 3.0
    out = lo.mul(op, M, alpha, beta, Res)
    assert_close(out, alpha * (A @ M) + beta * Res, rtol=10 * RTOL)
    # alpha-only and plain paths
    assert_close(lo.mul(op, M, alpha), alpha * (A @ M), rtol=10 * RTOL)
    assert_close(lo.mul(op, M), A @ M, rtol=10 * RTOL)
    # beta == 0 specialization never reads Res (NaN-safe)
    Res_nan = np.full((6, 3), np.nan, dtype=dtype)
    out0 = lo.mul(op, M, alpha, 0, Res_nan)
    assert not np.any(np.isnan(np.asarray(out0)))
    # transpose mode + donation
    ResT = np.stack([simple_vector(dtype, 4) for _ in range(3)], axis=1)
    outT = lo.mul(op, np.asarray(Res), alpha, beta, jnp.asarray(ResT), mode="T", donate=True)
    assert_close(outT, alpha * (A.T @ Res) + beta * ResT, rtol=10 * RTOL)
    # rank-mismatched res raises
    with pytest.raises(lo.LinearOperatorException):
        lo.mul(op, M, alpha, beta, np.zeros(6, dtype=dtype))


# ----------------------------------------------------------------------------
# counters (test_linop.jl:634-673)
# ----------------------------------------------------------------------------


def test_counters(rng):
    A = simple_matrix(np.complex128, 4, 4, rng)
    op = lo.LinearOperator(A)
    v = simple_vector(np.complex128, 4)
    assert (op.nprod, op.ntprod, op.nctprod) == (0, 0, 0)
    op @ v
    op @ v
    assert op.nprod == 2
    op.T @ v
    assert op.ntprod == 1
    op.H @ v
    assert op.nctprod == 1
    # wrapper counter cross-mapping (reference: src/adjtrans.jl:46-58)
    adj = op.H
    assert adj.nprod == op.nctprod
    op.reset_counters()
    assert (op.nprod, op.ntprod, op.nctprod) == (0, 0, 0)


def test_counters_composite(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    B = simple_matrix(np.float64, 4, 4, rng)
    opA = lo.LinearOperator(A)
    opB = lo.LinearOperator(B)
    comp = opA @ opB
    v = simple_vector(np.float64, 4)
    comp @ v
    assert opA.nprod == 1 and opB.nprod == 1
    comp.T @ v
    assert opA.ntprod == 1 and opB.ntprod == 1


# ----------------------------------------------------------------------------
# function-backed operators + inference lattice (test_linop.jl:521-585)
# ----------------------------------------------------------------------------


def test_function_operator(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    Aj = jnp.asarray(A)
    op = lo.FunctionOperator(4, 4, lambda v: Aj @ v, lambda u: Aj.T @ u, dtype=np.float64)
    v = simple_vector(np.float64, 4)
    assert_close(op @ v, A @ v)
    assert_close(op.T @ v, A.T @ v)
    # ctprod inferred from tprod for real dtype
    assert_close(op.H @ v, A.T @ v)


def test_function_operator_factory(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    Aj = jnp.asarray(A)
    op = lo.LinearOperator(np.float64, 4, 4, False, False, lambda v: Aj @ v, lambda u: Aj.T @ u)
    v = simple_vector(np.float64, 4)
    assert_close(op @ v, A @ v)


def test_unable_to_infer(rng):
    A = simple_matrix(np.complex128, 4, 4, rng)
    Aj = jnp.asarray(A)
    # only prod given, not symmetric/hermitian: transpose is underivable
    op = lo.FunctionOperator(4, 4, lambda v: Aj @ v, dtype=np.complex128)
    v = simple_vector(np.complex128, 4)
    with pytest.raises(lo.LinearOperatorException, match="unable to infer"):
        op.T @ v
    with pytest.raises(lo.LinearOperatorException, match="unable to infer"):
        op.H @ v


def test_symmetric_inference(rng):
    A = simple_matrix(np.float64, 4, 4, rng, symmetric=True)
    Aj = jnp.asarray(A)
    op = lo.FunctionOperator(4, 4, lambda v: Aj @ v, symmetric=True, hermitian=True, dtype=np.float64)
    v = simple_vector(np.float64, 4)
    assert_close(op.T @ v, A.T @ v)
    assert_close(op.H @ v, A.conj().T @ v)


def test_hermitian_complex_inference(rng):
    B = simple_matrix(np.complex128, 4, 4, rng)
    A = (B + B.conj().T) / 2  # hermitian, NOT symmetric
    Aj = jnp.asarray(A)
    op = lo.FunctionOperator(4, 4, lambda v: Aj @ v, hermitian=True, dtype=np.complex128)
    v = simple_vector(np.complex128, 4)
    assert_close(op.H @ v, A.conj().T @ v)
    # transpose inferred via conj trick from hermitian
    assert_close(op.T @ v, A.T @ v)


def test_eltype_lying_raises(rng):
    # reference: declaring Float64 for a complex operator raises
    # (src/constructors.jl:46-61)
    A = simple_matrix(np.complex128, 4, 4, rng)
    Aj = jnp.asarray(A)
    op = lo.FunctionOperator(4, 4, lambda v: Aj @ v, dtype=np.float64)
    with pytest.raises(lo.LinearOperatorException):
        op @ simple_vector(np.float64, 4)


# ----------------------------------------------------------------------------
# adjoint/transpose involution group (test_adjtrans.jl)
# ----------------------------------------------------------------------------


def test_involutions(rng):
    A = simple_matrix(np.complex128, 4, 3, rng)
    op = lo.LinearOperator(A)
    assert op.H.H is op
    assert op.T.T is op
    assert op.conj().conj() is op
    # 6-way group (reference: src/adjtrans.jl:39-44)
    assert isinstance(op.H.T, lo.ConjugateOperator)
    assert isinstance(op.T.H, lo.ConjugateOperator)
    assert isinstance(op.conj().T, lo.AdjointOperator)
    assert op.H.shape == (3, 4)
    assert op.conj().shape == (4, 3)
    v = simple_vector(np.complex128, 3)
    assert_close(op.H.T @ v, A.conj() @ v)


# ----------------------------------------------------------------------------
# promotion & mixed dtypes
# ----------------------------------------------------------------------------


def test_dtype_promotion(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    op = lo.LinearOperator(A)
    v = simple_vector(np.complex128, 4)
    out = op @ v
    assert np.asarray(out).dtype == np.complex128
    assert_close(out, A @ v)


# ----------------------------------------------------------------------------
# recompilation guard — the reference's zero-allocation analogue
# (test/test_linop_allocs.jl)
# ----------------------------------------------------------------------------


def test_no_recompilation_across_applies(rng):
    A = simple_matrix(np.float64, 16, 16, rng)
    op = 2.0 * lo.LinearOperator(A) + lo.LinearOperator(A).T
    v = np.asarray(simple_vector(np.float64, 16))
    op @ v  # warmup
    sizes0 = lo.apply_cache_sizes()
    for i in range(5):
        op @ (v * (i + 1.0))
        # fresh operator with same structure must also hit the cache
        op2 = 2.0 * lo.LinearOperator(A * (i + 1.0)) + lo.LinearOperator(A).T
        op2 @ v
    sizes1 = lo.apply_cache_sizes()
    assert sizes1["apply"] == sizes0["apply"], "hot path recompiled"


# ----------------------------------------------------------------------------
# hermitian/symmetric symmetrizers (reference: src/abstract.jl:231-253)
# ----------------------------------------------------------------------------


def test_symmetrizers(rng):
    A = simple_matrix(np.complex128, 4, 4, rng)
    op = lo.LinearOperator(A)
    v = simple_vector(np.complex128, 4)
    assert_close(op.hermitianized() @ v, (A + A.conj().T) / 2 @ v, rtol=10 * RTOL)
    assert_close(op.symmetrized() @ v, (A + A.T) / 2 @ v, rtol=10 * RTOL)


def test_matmat(rng):
    A = simple_matrix(np.float64, 5, 3, rng)
    M = simple_matrix(np.float64, 3, 4, rng)
    op = lo.LinearOperator(A)
    assert_close(op.matmat(M), A @ M)
    U = simple_matrix(np.float64, 5, 2, rng)
    assert_close(op.matmat(U, mode="T"), A.T @ U)


def test_row_vector_forms(rng):
    """u @ op == opᵀu (reference u'*op / transpose(u)*op,
    src/operations.jl:50-77; numpy 1-D convention)."""
    A = simple_matrix(np.complex128, 5, 3, rng)
    op = lo.LinearOperator(jnp.asarray(A))
    u = rng.standard_normal(5) + 1j * rng.standard_normal(5)
    assert_close(u @ op, A.T @ u)
    # the adjoint row form u' * op = (op' u)' -> conj(opᴴ u)
    assert_close(np.conj(u) @ op, A.T @ np.conj(u))
    w = rng.standard_normal(3) + 1j * rng.standard_normal(3)
    assert_close(np.asarray(op.H.T * w), np.conj(A) @ w)


def test_operator_power(rng):
    """op ** p: lazy Compose chain by binary exponentiation (p == 0 is
    the identity; negative/rect inputs raise; non-int defers)."""
    A = 0.3 * rng.standard_normal((10, 10))
    op = lo.LinearOperator(A)
    for p in (0, 1, 2, 3, 7):
        np.testing.assert_allclose(
            np.asarray(lo.to_dense(op ** p)), np.linalg.matrix_power(A, p),
            atol=1e-12)
    v = rng.standard_normal(10)
    np.testing.assert_allclose(np.asarray((op ** 3) * v),
                               A @ (A @ (A @ v)), atol=1e-12)
    with pytest.raises(ValueError):
        op ** -1
    with pytest.raises(lo.LinearOperatorException):
        lo.LinearOperator(rng.standard_normal((4, 3))) ** 2
    with pytest.raises(TypeError):
        op ** 1.5


def test_operator_power_numpy_exponent(rng):
    # review finding: np.int64 exponents fell into numpy's __rpow__ with
    # a cryptic ufunc error
    A = 0.3 * rng.standard_normal((6, 6))
    op = lo.LinearOperator(A)
    np.testing.assert_allclose(np.asarray(lo.to_dense(op ** np.int64(3))),
                               np.linalg.matrix_power(A, 3), atol=1e-12)


def test_reference_name_aliases():
    """Every LinearOperators.jl export name resolves in linops_tpu —
    either natively, via the documented rename, or via the aliases
    (migration contract)."""
    native = ["BlockDiagonalOperator", "DiagonalAndrei", "DiagonalBFGS",
              "DiagonalPSB", "InverseLBFGSOperator", "LBFGSOperator",
              "LSR1Operator", "ShiftedOperator", "SpectralGradient",
              "check_ctranspose", "opCholesky", "opDiagonal",
              "opExtension", "opEye", "opHermitian", "opHouseholder",
              "opInverse", "opLDL", "opOnes", "opRestriction", "opZeros"]
    aliases = ["AbstractLinearOperator", "AdjointLinearOperator",
               "TransposeLinearOperator", "ConjugateLinearOperator",
               "TimedLinearOperator"]
    for name in native + aliases:
        assert hasattr(lo, name), name
    assert lo.TimedLinearOperator is lo.TimedOperator
    # AbstractLinearOperator is the CLASS (pre-existing export);
    # LinearOperator is the reference-style factory function
    assert isinstance(lo.opEye(3), lo.AbstractLinearOperator)
