"""L-SR1 operator tests, mirroring the reference contract
(reference: test/test_lsr1.jl)."""

import numpy as np
import jax.numpy as jnp

from helpers import RTOL, simple_vector

import linops_tpu as lo
from linops_tpu.qn import LSR1Operator


def dense_sr1(B, s, y):
    """Dense SR1 update oracle (reference test/test_lsr1.jl:48-56)."""
    ymBs = y - B @ s
    denom = np.dot(ymBs, s)
    if abs(denom) >= 1.0e-8 + 1.0e-8 * np.linalg.norm(s) * np.linalg.norm(ymBs):
        B = B + np.outer(ymBs, ymBs) / denom
    return B


def test_lsr1_basic():
    n, mem = 10, 5
    B = LSR1Operator(n, mem=mem, scaling=False)

    for _ in range(2):  # run again after reset
        assert np.linalg.norm(B.diag() - np.diag(B.to_dense())) <= RTOL
        assert B.insert == 0
        assert np.linalg.norm(B.to_dense() - np.eye(n)) <= np.finfo(np.float64).eps

        # Only valid updates accepted: y = B*s makes y - Bs = 0 -> reject
        # (reference :17-21).
        s = simple_vector(np.float64, n)
        y = np.asarray(B * s)
        B.push(s, y)
        assert B.insert == 0

        # Insert a few pairs (reference :24-28).
        for i in range(1, mem + 3):
            s = np.ones(n) * i
            y = np.concatenate([[i], np.ones(n - 1)])
            B.push(s, y)

        assert lo.check_hermitian(B)
        assert np.linalg.norm(B.diag() - np.diag(B.to_dense())) <= RTOL

        v = simple_vector(np.float64, n)
        assert np.linalg.norm(B * v - v) > RTOL
        B.reset()
        assert B.scaling_factor == 1.0
        assert np.linalg.norm(B * v - v) < RTOL

        assert np.linalg.norm(B.to_dense(), 2) <= B.opnorm_upper_bound + RTOL


def test_lsr1_vs_dense_sr1(rng):
    """Full-memory L-SR1 tracks the dense SR1 recursion
    (reference test/test_lsr1.jl:44-70)."""
    n = 10
    LB = LSR1Operator(n, mem=n, scaling=False)
    B = np.eye(n)

    assert np.linalg.norm(LB.to_dense() - B) < RTOL * np.linalg.norm(B)

    for _ in range(n):
        s = rng.standard_normal(n)
        y = rng.standard_normal(n)
        B = dense_sr1(B, s, y)
        LB.push(s, y)
        assert np.linalg.norm(LB.to_dense() - B) < RTOL * np.linalg.norm(B)
        assert np.linalg.norm(LB.diag() - np.diag(B)) < RTOL * np.linalg.norm(np.diag(B))

    assert np.linalg.norm(B, 2) <= LB.opnorm_upper_bound + RTOL


def test_lsr1_dtypes():
    """Different precisions (reference test/test_lsr1.jl:73-84)."""
    n, mem = 10, 5
    for dt in (jnp.float32, jnp.float64):
        B = LSR1Operator(dt, n, mem=mem)
        s = np.ones(n)
        y = 2 * np.ones(n)
        B.push(s, y)
        assert B.dtype == jnp.dtype(dt)
        v = simple_vector(np.float64, n).astype(np.dtype(dt))
        assert (B * v).dtype == jnp.dtype(dt)


def test_lsr1_no_recompile(rng):
    """Pushes/applies hit the jit cache after the first (reference
    zero-allocation contract, test/test_lsr1.jl:87-106)."""
    n, mem = 40, 6
    B = LSR1Operator(n, mem=mem)
    from linops_tpu.qn.lsr1 import _push

    for i in range(6):
        B.push(rng.random(n), rng.random(n))
        if i == 0:
            misses = _push._cache_size()
    assert _push._cache_size() == misses

    x = rng.random(n)
    B.matvec(x)
    from linops_tpu.core.apply import apply_cache_sizes

    before = apply_cache_sizes()
    for _ in range(5):
        B.matvec(x)
    assert apply_cache_sizes() == before


def test_lsr1_indefinite_ok(rng):
    """SR1 approximations may be indefinite — apply stays consistent with the
    densified operator (symmetry inferred, no tprod needed)."""
    n = 12
    B = LSR1Operator(n, mem=6, scaling=False)
    for _ in range(6):
        B.push(rng.standard_normal(n), rng.standard_normal(n))
    Bd = np.asarray(B.to_dense())
    np.testing.assert_allclose(Bd, Bd.T, rtol=1e-12)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(B.T * v), Bd.T @ v, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(B.H * v), Bd.T @ v, rtol=1e-10)


def test_lsr1_scaling(rng):
    """Scaled LSR1: B0 = I/γ with γ = ys/y'y (reference src/lsr1.jl:155-160)."""
    n = 8
    B = LSR1Operator(n, mem=n, scaling=True)
    s = rng.standard_normal(n)
    y = rng.standard_normal(n)
    B.push(s, y)
    if B.insert == 1:  # accepted
        gamma = np.dot(y, s) / np.dot(y, y)
        assert abs(B.scaling_factor - gamma) < 1e-12
        Bd = dense_sr1(np.eye(n) / gamma, s, y)
        np.testing.assert_allclose(np.asarray(B.to_dense()), Bd, rtol=1e-10)


def test_lsr1_compact_equals_a_form(rng):
    """The compact (BNS thm 5.1) SR1 apply equals the reference a-form
    recursion across partial/full/wrapped rings and scaling on/off, and the
    lazy push produces the same state as the eager one."""
    from linops_tpu.qn.lsr1 import (
        lsr1_apply,
        lsr1_apply_compact,
        lsr1_apply_matrix,
        lsr1_apply_matrix_compact,
    )

    n, mem = 24, 5
    for scaling in (False, True):
        for pushes in (0, 2, mem, mem + 3):
            lazy = LSR1Operator(n, mem=mem, scaling=scaling)
            eager = LSR1Operator(n, mem=mem, scaling=scaling, lazy_a=False)
            for _ in range(pushes):
                s = rng.standard_normal(n)
                y = rng.standard_normal(n)
                lazy.push(s, y)
                eager.push(s, y)
            v = rng.standard_normal(n)
            a_form = np.asarray(lsr1_apply(eager.state, jnp.asarray(v)))
            compact = np.asarray(lsr1_apply_compact(eager.state, jnp.asarray(v)))
            np.testing.assert_allclose(
                compact, a_form, rtol=1e-9, atol=1e-9,
                err_msg=f"scaling={scaling} pushes={pushes}",
            )
            np.testing.assert_allclose(
                np.asarray(lazy * v), np.asarray(eager * v), rtol=1e-9, atol=1e-9
            )
            # matrix applies agree too (a-form oracle vs compact)
            X = jnp.asarray(rng.standard_normal((n, 3)))
            np.testing.assert_allclose(
                np.asarray(lsr1_apply_matrix_compact(eager.state, X)),
                np.asarray(lsr1_apply_matrix(eager.state, X)),
                rtol=1e-9, atol=1e-9,
            )
            # deferred a-form materializes to the eager values
            np.testing.assert_allclose(
                np.asarray(lazy.diag()), np.asarray(eager.diag()),
                rtol=1e-9, atol=1e-9,
            )
            assert abs(lazy.opnorm_upper_bound - eager.opnorm_upper_bound) < 1e-8 * max(
                1.0, eager.opnorm_upper_bound
            )
