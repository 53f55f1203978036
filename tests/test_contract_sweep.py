"""Systematic operator-contract sweep: every operator family must satisfy
the same algebraic contract the reference enforces piecemeal across
test_linop/test_adjtrans/test_cat/... — densification consistency, adjoint
lattice, mode arithmetic, and participation in the lazy algebra."""

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import assert_close

import linops_tpu as lo


def _operators(rng):
    """(name, operator, dense oracle) triples covering the zoo."""
    n = 12
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, n))
    d = rng.standard_normal(n) + 2.0
    Asp = A * (rng.random((n, n)) < 0.4)
    h = rng.standard_normal(n)

    mat = lo.LinearOperator(jnp.asarray(A))
    diag = lo.opDiagonal(jnp.asarray(d))
    out = [
        ("matrix", mat, A),
        ("diagonal", diag, np.diag(d)),
        ("eye", lo.opEye(n), np.eye(n)),
        ("ones", lo.opOnes(n, n), np.ones((n, n))),
        ("zeros", lo.opZeros(n, n), np.zeros((n, n))),
        ("scale", 2.5 * mat, 2.5 * A),
        ("compose", mat @ diag, A @ np.diag(d)),
        ("sum", mat + diag, A + np.diag(d)),
        ("sub", mat - diag, A - np.diag(d)),
        ("adjoint", mat.H, A.T),
        ("csr", lo.opSparse(Asp, format="csr"), Asp),
        ("bsr", lo.opSparse(Asp, format="bsr", block_shape=(4, 4)), Asp),
        ("coo", lo.opSparse(Asp, format="coo"), Asp),
        ("shifted", lo.ShiftedOperator(mat, 0.7), A + 0.7 * np.eye(n)),
        ("householder", lo.opHouseholder(jnp.asarray(h)), np.eye(n) - 2 * np.outer(h, h)),
        ("blockdiag", lo.BlockDiagonalOperator(mat, diag),
         np.block([[A, np.zeros((n, n))], [np.zeros((n, n)), np.diag(d)]])),
        ("hcat", lo.hcat(mat, diag), np.hstack([A, np.diag(d)])),
        ("vcat", lo.vcat(mat, diag), np.vstack([A, np.diag(d)])),
        ("kron", lo.kron(lo.LinearOperator(jnp.asarray(A[:4, :4])), lo.LinearOperator(jnp.asarray(B[:3, :3]))),
         np.kron(A[:4, :4], B[:3, :3])),
        ("restriction", lo.opRestriction(jnp.arange(0, n, 2), n), np.eye(n)[::2]),
        ("slice", mat[jnp.arange(3), jnp.arange(4)], A[:3, :4]),
        ("timed", lo.TimedOperator(mat), A),
        ("power", mat ** 3, np.linalg.matrix_power(A, 3)),
        ("hermitianized", mat.hermitianized(), (A + A.T) / 2),
        ("symmetrized", mat.symmetrized(), (A + A.T) / 2),
    ]
    # iterative inverse (inner Krylov solve as an operator node)
    S = A @ A.T + 5.0 * np.eye(n)
    out.append((
        "iter_inverse",
        lo.opIterativeInverse(
            lo.LinearOperator(jnp.asarray(S), symmetric=True, hermitian=True),
            tol=1e-13, maxiter=300),
        np.linalg.inv(S),
    ))
    # Nystrom preconditioner node with a hand-built exact oracle
    Uq = np.linalg.qr(rng.standard_normal((n, 3)))[0]
    lam = np.array([4.0, 2.0, 1.0])
    P = lo.NystromPreconditioner(jnp.asarray(Uq), jnp.asarray(lam), mu=0.5)
    scale = (lam[-1] + 0.5) / (lam + 0.5)
    P_dense = (Uq * scale) @ Uq.T + (np.eye(n) - Uq @ Uq.T)
    out.append(("nystrom_pinv", P, P_dense))
    return out


def test_contract_sweep(rng):
    for name, op, dense in _operators(rng):
        m, n = dense.shape
        assert op.shape == (m, n), name
        v = rng.standard_normal(n)
        u = rng.standard_normal(m)
        assert_close(op * v, dense @ v)
        assert_close(op.to_dense(), dense, rtol=1e-10)
        assert_close(op.T * u, dense.T @ u)
        assert_close(op.H * u, dense.T @ u)
        # involution
        assert_close(op.T.T * v, dense @ v)
        # scaled participation in algebra
        assert_close((2.0 * op) * v, 2 * (dense @ v))
        assert_close((-op) * v, -(dense @ v))


def test_contract_sweep_gradients(rng):
    """jax.grad flows through every family's apply."""
    import jax

    for name, op, dense in _operators(rng):
        m, n = dense.shape
        x = jnp.asarray(rng.standard_normal(n))
        g = jax.grad(lambda x_: jnp.sum(op.apply(x_, "N")))(x)
        assert_close(g, dense.T @ np.ones(m), rtol=1e-9)


def test_contract_sweep_jit_cacheable(rng):
    """Every family applies under jit with operators as pytree args."""
    import jax

    f = jax.jit(lambda o, x: o.apply(x, "N"))
    for name, op, dense in _operators(rng):
        v = jnp.asarray(rng.standard_normal(dense.shape[1]))
        assert_close(f(op, v), dense @ v)


def test_contract_sweep_complex(rng):
    """Complex-dtype contract: matvec/adjoint/transpose/conj against dense
    oracles for the families with complex support (reference test_linop.jl
    uses ComplexF64 throughout)."""
    n = 10
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    d = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    Asp = A * (rng.random((n, n)) < 0.4)
    mat = lo.LinearOperator(jnp.asarray(A))
    cases = [
        ("matrix", mat, A),
        ("diagonal", lo.opDiagonal(jnp.asarray(d)), np.diag(d)),
        ("scale", (1 + 2j) * mat, (1 + 2j) * A),
        ("compose", mat @ mat, A @ A),
        ("sum", mat + mat.T, A + A.T),
        ("csr", lo.opSparse(Asp, format="csr"), Asp),
        ("coo", lo.opSparse(Asp, format="coo"), Asp),
        ("shifted", lo.ShiftedOperator(mat, 0.5 - 1j), A + (0.5 - 1j) * np.eye(n)),
        ("kron", lo.kron(lo.LinearOperator(jnp.asarray(A[:3, :3])), lo.LinearOperator(jnp.asarray(A[:4, :4]))),
         np.kron(A[:3, :3], A[:4, :4])),
        ("hcat", lo.hcat(mat, mat), np.hstack([A, A])),
    ]
    for name, op, dense in cases:
        m2, n2 = dense.shape
        v = rng.standard_normal(n2) + 1j * rng.standard_normal(n2)
        u = rng.standard_normal(m2) + 1j * rng.standard_normal(m2)
        assert_close(op * v, dense @ v)
        assert_close(op.H * u, dense.conj().T @ u)
        assert_close(op.T * u, dense.T @ u)
        assert_close(op.conj() * v, np.conj(dense) @ v)
        assert_close(op.to_dense(), dense, rtol=1e-10)


def test_contract_sweep_counters(rng):
    """Per-family counter assertions (reference test_linop.jl:634-673): every
    zoo operator tracks nprod/ntprod/nctprod, conj bumps nprod, and the
    adjoint view cross-maps its counters."""
    for name, op, dense in _operators(rng):
        m, n = dense.shape
        op.reset_counters()
        v = rng.standard_normal(n)
        u = rng.standard_normal(m)
        for _ in range(3):
            op * v
        for _ in range(2):
            op.T * u
        op.H * u
        if op.symmetric and op.hermitian:
            # the mode lattice collapses T/H onto the N product
            assert op.nprod == 6, name
            assert op.ntprod == 0 and op.nctprod == 0, name
        elif name != "adjoint":
            # (on the real adjoint VIEW, T and H coincide — conj(A) = A —
            # so the exact split differs; its cross-maps are checked below)
            assert op.nprod == 3, name
            assert op.ntprod == 2, name
            assert op.nctprod == 1, name
        if name == "matrix":
            # conj on a real base operator routes through the N product
            lo.conj(op) * v
            assert op.nprod == 4, name
        if not (op.symmetric and op.hermitian):
            # counter cross-maps on the adjoint/transpose views (the
            # reference asserts these on a nonsymmetric complex matrix)
            opT = lo.transpose(op)
            assert opT.nprod == op.ntprod, name
            assert opT.ntprod == op.nprod, name
            opH = lo.adjoint(op)
            assert opH.nprod == op.nctprod, name
        op.reset_counters()
        assert (op.nprod, op.ntprod, op.nctprod) == (0, 0, 0), name


def test_contract_sweep_eltype_lying(rng):
    """An operator lying about its eltype raises on apply for EVERY family's
    product (reference test_linop.jl:571-585: complex output declared
    Float64 raises InexactError on materialization)."""
    n = 10
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    d = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    Asp = A * (rng.random((n, n)) < 0.4)
    mat = lo.LinearOperator(jnp.asarray(A))
    families = [
        ("matrix", mat),
        ("diagonal", lo.opDiagonal(jnp.asarray(d))),
        ("compose", mat @ mat),
        ("sum", mat + mat.T),
        ("csr", lo.opSparse(Asp, format="csr")),
        ("shifted", lo.ShiftedOperator(mat, 0.5 - 1j)),
        ("hcat", lo.hcat(mat, mat)),
        ("kron", lo.kron(lo.LinearOperator(jnp.asarray(A[:3, :3])),
                         lo.LinearOperator(jnp.asarray(A[:4, :4])))),
    ]
    for name, op in families:
        m2, n2 = op.shape
        liar = lo.FunctionOperator(
            m2, n2,
            prod=lambda x, _op=op: _op.apply(x, "N"),
            tprod=lambda x, _op=op: _op.apply(x, "T"),
            dtype=np.float64,  # the lie: products are complex
        )
        v = rng.standard_normal(n2)
        with pytest.raises(lo.LinearOperatorException):
            liar * v
        with pytest.raises(lo.LinearOperatorException):
            liar.to_dense()


def test_contract_sweep_dtype_promotion(rng):
    """Result dtype follows promote_type(op, v) across the zoo (reference
    storage-promotion semantics, src/operations.jl:43-48)."""
    for name, op, dense in _operators(rng):
        m, n = dense.shape
        if not np.issubdtype(np.dtype(op.dtype), np.floating):
            continue
        v32 = jnp.asarray(rng.standard_normal(n), jnp.float32)
        out = op * v32
        assert out.dtype == jnp.promote_types(op.dtype, jnp.float32), name
        vc = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
        outc = op * vc
        assert np.issubdtype(np.dtype(outc.dtype), np.complexfloating), name
        assert_close(outc, dense @ np.asarray(vc))
