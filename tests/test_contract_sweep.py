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
    ]
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
