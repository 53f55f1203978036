"""Adjoint/transpose/conjugate wrapper contract
(reference: test/test_adjtrans.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import assert_close

import linops_tpu as lo


@pytest.fixture
def complex_op(rng):
    A = rng.random((5, 3)) + 1j * rng.random((5, 3))
    return A, lo.LinearOperator(jnp.asarray(A))


def test_wrapper_densification(complex_op):
    """Matrix(fop) == foo(A) for all three wrappers, including scaled and
    negated forms (reference :11-20)."""
    A, opA = complex_op
    for foo, fop in [
        (lambda M: M.conj().T, opA.H),
        (np.conj, opA.conj()),
        (lambda M: M.T, opA.T),
    ]:
        assert_close(fop.to_dense(), foo(A))
        assert_close((-fop).to_dense(), foo(-A))
        assert_close(((2 + 3j) * fop).to_dense(), (2 + 3j) * foo(A))
        assert_close((fop * (2 + 3j)).to_dense(), foo(A) * (2 + 3j))


def test_involution_group(complex_op):
    """The 6-way involution rules collapse symbolically — no wrapper towers
    (reference :22-27, src/adjtrans.jl:32-44)."""
    _, opA = complex_op
    aopA, copA, topA = opA.H, opA.conj(), opA.T

    assert aopA.H is opA
    assert topA.T is opA
    assert copA.conj() is opA

    def same_kind(x, y):
        return type(x) is type(y)

    assert same_kind(topA.H, copA)  # adjoint(transpose) = conj
    assert same_kind(copA.H, topA)  # adjoint(conj) = transpose
    assert same_kind(aopA.conj(), topA)  # conj(adjoint) = transpose
    assert same_kind(topA.conj(), aopA)
    assert same_kind(copA.T, aopA)  # transpose(conj) = adjoint
    assert same_kind(aopA.T, copA)


def test_wrapper_applies(complex_op, rng):
    A, opA = complex_op
    v5c = rng.random(5) + 1j * rng.random(5)
    v5r = rng.random(5)
    assert_close(opA.H * v5c, A.conj().T @ v5c)
    assert_close(opA.T * v5c, A.T @ v5c)
    assert_close(opA.H * v5r, A.conj().T @ v5r)
    assert_close(opA.T * v5r, A.T @ v5r)
    v3c = rng.random(3) + 1j * rng.random(3)
    v3r = rng.random(3)
    assert_close(opA.conj() * v3c, np.conj(A) @ v3c)
    assert_close(opA.conj() * v3r, np.conj(A) @ v3r)


def test_derived_adjoint_from_tprod(rng):
    """Function operator with only prod+tprod: the adjoint is derived via
    the conj trick (reference test_derived_adjoint, :44-100)."""
    A = rng.random((5, 3)) + 1j * rng.random((5, 3))
    Aj = jnp.asarray(A)
    op = lo.FunctionOperator(
        5, 3, lambda x: Aj @ x, lambda y: Aj.T @ y, None, dtype=jnp.complex128
    )
    for foo, fop in [
        (lambda M: M.conj().T, op.H),
        (np.conj, op.conj()),
        (lambda M: M.T, op.T),
    ]:
        assert_close(fop.to_dense(), foo(A))
    v = rng.random(5) + 1j * rng.random(5)
    assert_close(op.H * v, A.conj().T @ v)
    assert_close(op.T * v, A.T @ v)


def test_derived_transpose_from_ctprod(rng):
    """Function operator with only prod+ctprod: transpose derived
    (reference test_derived_transpose)."""
    A = rng.random((5, 3)) + 1j * rng.random((5, 3))
    Aj = jnp.asarray(A)
    op = lo.FunctionOperator(
        5, 3, lambda x: Aj @ x, None, lambda y: Aj.conj().T @ y, dtype=jnp.complex128
    )
    v = rng.random(5) + 1j * rng.random(5)
    assert_close(op.T * v, A.T @ v)
    assert_close(op.H * v, A.conj().T @ v)
    assert_close(op.T.to_dense(), A.T)


def test_wrapper_counters(complex_op, rng):
    """Counter cross-mapping: adjoint apply bumps the parent's nctprod
    (reference src/adjtrans.jl:46-58)."""
    A, opA = complex_op
    opA.reset_counters()
    v = rng.random(5) + 1j * rng.random(5)
    _ = opA.H * v
    assert opA.nctprod == 1 and opA.nprod == 0
    _ = opA.T * v
    assert opA.ntprod == 1
    w = rng.random(3) + 1j * rng.random(3)
    _ = opA.conj() * w
    assert opA.nprod == 1


def test_wrapper_counters_follow_fallback_slot(rng):
    """Adjoint apply on a parent WITHOUT ctprod bumps (and reads) the tprod
    slot via the conj-trick fallback (regression: wrapper read nctprod=0)."""
    A = rng.standard_normal((4, 4))
    Aj = jnp.asarray(A)
    fo = lo.FunctionOperator(4, 4, lambda x: Aj @ x, lambda y: Aj.T @ y)
    fo.reset_counters()
    _ = fo.H * jnp.ones(4)
    assert fo.ntprod == 1 and fo.nctprod == 0
    assert fo.H.nprod == 1  # wrapper's forward count = the slot actually hit


def test_unary_scalar_on_adjtrans(rng):
    """Unary/scalar ops commute with adjoint/transpose views
    (reference test_linop.jl issue #107, :596-603)."""
    import linops_tpu as lo

    A = rng.standard_normal((5, 3))
    op = lo.LinearOperator(jnp.asarray(A))
    for view in (lo.adjoint, lo.transpose):
        np.testing.assert_allclose(
            np.asarray(view(-op).to_dense()), np.asarray((-view(op)).to_dense())
        )
        np.testing.assert_allclose(
            np.asarray(view(2 * op).to_dense()), np.asarray((2 * view(op)).to_dense())
        )


def test_sum_and_cat_with_adjtrans(rng):
    """Sums and concatenations mixing views, operators, and raw matrices
    (reference test_linop.jl issues #109, :605-631)."""
    import linops_tpu as lo

    A = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
    opA = lo.LinearOperator(jnp.asarray(A))
    for view, dense_view in ((lo.adjoint, lambda M: M.conj().T), (lo.transpose, lambda M: M.T)):
        want = A + dense_view(A)
        np.testing.assert_allclose(np.asarray((view(opA) + opA).to_dense()), want, atol=1e-12)
        np.testing.assert_allclose(np.asarray((opA + view(opA)).to_dense()), want, atol=1e-12)
        # operator + raw matrix autowrap
        np.testing.assert_allclose(np.asarray((view(opA) + A).to_dense()), want, atol=1e-12)
        # cat in every mix
        np.testing.assert_allclose(
            np.asarray(lo.hcat(view(opA), opA).to_dense()),
            np.hstack([dense_view(A), A]), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(lo.vcat(opA, view(opA)).to_dense()),
            np.vstack([A, dense_view(A)]), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(lo.hvcat([[view(opA), opA], [opA, view(opA)]]).to_dense()),
            np.block([[dense_view(A), A], [A, dense_view(A)]]), atol=1e-12)


def test_hermitianized_symmetrized_flags(rng):
    """x + x^H / x + x^T are hermitian/symmetric BY CONSTRUCTION; the Sum
    node detects the structural shape (the reference's Hermitian/Symmetric
    builders, src/abstract.jl:231-253, return exactly it) so the result
    composes with hermitian-gated consumers (lobpcg, SLQ, checks)."""
    import linops_tpu as lo

    A = rng.standard_normal((12, 12))
    op = lo.LinearOperator(A)
    H = op.hermitianized()
    S = op.symmetrized()
    assert H.hermitian and H.symmetric  # real: both
    assert S.symmetric and S.hermitian
    np.testing.assert_allclose(np.asarray(lo.to_dense(H)), (A + A.T) / 2,
                               atol=1e-14)
    assert lo.check_hermitian(H)

    C = rng.standard_normal((10, 10)) + 1j * rng.standard_normal((10, 10))
    opc = lo.LinearOperator(C)
    Hc = opc.hermitianized()
    Sc = opc.symmetrized()
    assert Hc.hermitian and not Hc.symmetric
    assert Sc.symmetric and not Sc.hermitian
    np.testing.assert_allclose(np.asarray(lo.to_dense(Hc)), (C + C.conj().T) / 2,
                               atol=1e-14)
    # an unrelated sum keeps ANDed flags (reference src/operations.jl:199-215)
    other = lo.LinearOperator(rng.standard_normal((12, 12)))
    assert not (op + other).hermitian
