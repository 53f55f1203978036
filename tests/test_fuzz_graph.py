"""Randomized operator-graph fuzzing: build random lazy-algebra graphs from
the full constructor pool and check every mode against the dense oracle.

The reference's oracle pattern (test/test_linop.jl) checks hand-picked
combinations; a framework whose algebra is an explicit graph should also
survive arbitrary compositions. Seeded → deterministic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import linops_tpu as lo

RTOL = 1e-9


def _leaf(rng, m, n, complex_):
    """A random leaf operator of shape (m, n) with its dense oracle."""
    def randm(shape):
        a = rng.standard_normal(shape)
        if complex_:
            a = a + 1j * rng.standard_normal(shape)
        return a

    kind = rng.integers(0, 6)
    if kind == 0:
        A = randm((m, n))
        return lo.LinearOperator(jnp.asarray(A)), A
    if kind == 1 and m == n:
        d = randm(n) + 2.0
        return lo.opDiagonal(jnp.asarray(d)), np.diag(d)
    if kind == 2 and m == n:
        return lo.opEye(n, dtype=jnp.complex128 if complex_ else jnp.float64), np.eye(n)
    if kind == 3:
        A = randm((m, n)) * (rng.random((m, n)) < 0.5)
        fmt = ("csr", "coo", "ell")[rng.integers(0, 3)]
        return lo.opSparse(A, format=fmt), A
    if kind == 4 and m == n and not complex_:
        h = rng.standard_normal(n)
        return lo.opHouseholder(jnp.asarray(h)), np.eye(n) - 2 * np.outer(h, h)
    A = randm((m, n))
    return lo.LinearOperator(jnp.asarray(A)), A


def _graph(rng, m, n, depth, complex_):
    """A random graph of shape (m, n) with its dense oracle."""
    if depth == 0:
        return _leaf(rng, m, n, complex_)
    op_kind = rng.integers(0, 8)
    if op_kind == 0:  # scale
        g, D = _graph(rng, m, n, depth - 1, complex_)
        c = float(rng.standard_normal()) + (1j * float(rng.standard_normal()) if complex_ else 0.0)
        return c * g, c * D
    if op_kind == 1:  # sum
        g1, D1 = _graph(rng, m, n, depth - 1, complex_)
        g2, D2 = _graph(rng, m, n, depth - 1, complex_)
        return g1 + g2, D1 + D2
    if op_kind == 2:  # compose through a random inner dim
        k = int(rng.integers(2, 7))
        g1, D1 = _graph(rng, m, k, depth - 1, complex_)
        g2, D2 = _graph(rng, k, n, depth - 1, complex_)
        return g1 @ g2, D1 @ D2
    if op_kind == 3:  # transpose of a flipped-shape graph
        g, D = _graph(rng, n, m, depth - 1, complex_)
        return lo.transpose(g), D.T
    if op_kind == 4:  # adjoint
        g, D = _graph(rng, n, m, depth - 1, complex_)
        return lo.adjoint(g), D.conj().T
    if op_kind == 5:  # hcat of two half-width graphs
        n1 = max(1, n // 2)
        n2 = n - n1
        if n2 == 0:
            return _graph(rng, m, n, depth - 1, complex_)
        g1, D1 = _graph(rng, m, n1, depth - 1, complex_)
        g2, D2 = _graph(rng, m, n2, depth - 1, complex_)
        return lo.hcat(g1, g2), np.hstack([D1, D2])
    if op_kind == 6 and m == n:  # shift
        g, D = _graph(rng, m, n, depth - 1, complex_)
        s = float(rng.standard_normal())
        return lo.ShiftedOperator(g, s), D + s * np.eye(n)
    if op_kind == 7 and m == n:  # symmetrizers (structural-flag Sum nodes)
        g, D = _graph(rng, m, n, depth - 1, complex_)
        if rng.integers(0, 2):
            h = g.hermitianized()
            assert h.hermitian  # structural inference must hold on any graph
            return h, (D + D.conj().T) / 2
        s_ = g.symmetrized()
        assert s_.symmetric
        return s_, (D + D.T) / 2
    return _graph(rng, m, n, depth - 1, complex_)


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("complex_", [False, True])
def test_random_graphs_vs_dense(seed, complex_):
    rng = np.random.default_rng(1000 + seed)
    m = int(rng.integers(2, 9))
    n = int(rng.integers(2, 9))
    depth = int(rng.integers(1, 4))
    op, D = _graph(rng, m, n, depth, complex_)
    assert op.shape == D.shape, (op.shape, D.shape)

    def rvec(k):
        v = rng.standard_normal(k)
        if complex_:
            v = v + 1j * rng.standard_normal(k)
        return v

    scale = max(np.abs(D).max(), 1.0)
    v = rvec(n)
    u = rvec(m)
    np.testing.assert_allclose(np.asarray(op * v), D @ v, rtol=RTOL, atol=RTOL * scale * 10)
    np.testing.assert_allclose(np.asarray(op.T * u), D.T @ u, rtol=RTOL, atol=RTOL * scale * 10)
    np.testing.assert_allclose(np.asarray(op.H * u), D.conj().T @ u, rtol=RTOL, atol=RTOL * scale * 10)
    np.testing.assert_allclose(np.asarray(op.to_dense()), D, rtol=RTOL, atol=RTOL * scale * 10)
    # matrix apply
    M = np.stack([rvec(n) for _ in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(op.matmat(jnp.asarray(M))), D @ M, rtol=RTOL, atol=RTOL * scale * 10)
