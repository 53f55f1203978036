"""DIA (diagonal-offset) operator tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import assert_close

import linops_tpu as lo
from linops_tpu.sparse.dia import (
    DIAOperator,
    dia_from_dense,
    laplacian_1d,
    laplacian_2d,
)


def banded(rng, n, bw, complex_=False):
    A = np.zeros((n, n), np.complex128 if complex_ else np.float64)
    for k in range(-bw, bw + 1):
        d = rng.standard_normal(n - abs(k))
        if complex_:
            d = d + 1j * rng.standard_normal(n - abs(k))
        A += np.diag(d, k)
    return A


def test_dia_matvec_oracle(rng):
    n = 40
    A = banded(rng, n, 3)
    op = dia_from_dense(A)
    assert op.symmetric is False
    v = rng.standard_normal(n)
    assert_close(op * v, A @ v)
    assert_close(op.T * v, A.T @ v)
    assert_close(op.H * v, A.T @ v)
    assert_close(op.to_dense(), A, rtol=1e-12)


def test_dia_complex(rng):
    n = 30
    A = banded(rng, n, 2, complex_=True)
    op = dia_from_dense(A)
    v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    assert_close(op * v, A @ v)
    assert_close(op.H * v, A.conj().T @ v)
    assert_close(op.conj() * v, np.conj(A) @ v)


def test_dia_matmat(rng):
    n = 30
    A = banded(rng, n, 2)
    op = dia_from_dense(A)
    X = rng.standard_normal((n, 5))
    assert_close(op.matmat(X), A @ X)


def test_laplacian_1d():
    n = 16
    L = laplacian_1d(n, dtype=jnp.float64)
    dense = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    assert_close(L.to_dense(), dense, rtol=1e-12)
    assert L.symmetric and L.hermitian


def test_laplacian_2d():
    nx, ny = 5, 7
    L = laplacian_2d(nx, ny, dtype=jnp.float64)
    n = nx * ny
    dense = np.zeros((n, n))
    for ix in range(nx):
        for iy in range(ny):
            r = ix * ny + iy
            dense[r, r] = 4.0
            if iy + 1 < ny:
                dense[r, r + 1] = -1.0
            if iy > 0:
                dense[r, r - 1] = -1.0
            if ix + 1 < nx:
                dense[r, r + ny] = -1.0
            if ix > 0:
                dense[r, r - ny] = -1.0
    assert_close(L.to_dense(), dense, rtol=1e-12)
    d = np.asarray(L.to_dense())
    np.testing.assert_allclose(d, d.T)


def test_dia_in_algebra_and_cg(rng):
    """Stencil operator drives jitted CG end-to-end."""
    L = laplacian_2d(8, 8, dtype=jnp.float64)
    n = 64
    op = L + 0.5 * lo.opEye(n, dtype=jnp.float64)  # SPD shift
    b = jnp.asarray(rng.standard_normal(n))
    x, iters, res = lo.cg(op, b, tol=1e-10, maxiter=300)
    dense = np.asarray(L.to_dense()) + 0.5 * np.eye(n)
    np.testing.assert_allclose(
        dense @ np.asarray(x), np.asarray(b), atol=1e-8
    )


def test_dia_empty_and_errors():
    with pytest.raises(lo.LinearOperatorException):
        DIAOperator(jnp.zeros((2, 5)), [0])  # offsets length mismatch
    with pytest.raises(lo.LinearOperatorException):
        dia_from_dense(np.zeros((3, 4)))


# ---------------------------------------------------------------------------
# 2-D grid stencil operator
# ---------------------------------------------------------------------------


def test_stencil2d_matches_dia_laplacian():
    """Grid-layout Laplacian equals the DIA-form matrix exactly."""
    from linops_tpu.sparse.dia import laplacian_2d_dia

    nx, ny = 6, 9
    S = laplacian_2d(nx, ny, dtype=jnp.float64)
    D = laplacian_2d_dia(nx, ny, dtype=jnp.float64)
    assert S.symmetric and S.hermitian
    np.testing.assert_allclose(np.asarray(S.to_dense()), np.asarray(D.to_dense()))
    v = np.random.default_rng(0).standard_normal(nx * ny)
    assert_close(S * v, np.asarray(D.to_dense()) @ v)
    assert_close(S.T * v, np.asarray(D.to_dense()).T @ v)


def test_stencil2d_varying_coefficients(rng):
    """Spatially-varying coefficients against a dense oracle."""
    from linops_tpu.sparse.stencil import Stencil2DOperator

    nx, ny = 5, 6
    n = nx * ny
    offsets = [(0, 0), (0, 1), (1, 0), (-1, -1)]
    coeffs = rng.standard_normal((len(offsets), nx, ny))
    S = Stencil2DOperator(nx, ny, offsets, jnp.asarray(coeffs))
    dense = np.zeros((n, n))
    for k, (dx, dy) in enumerate(offsets):
        for i in range(nx):
            for j in range(ny):
                ii, jj = i + dx, j + dy
                if 0 <= ii < nx and 0 <= jj < ny:
                    dense[i * ny + j, ii * ny + jj] += coeffs[k, i, j]
    v = rng.standard_normal(n)
    assert_close(S * v, dense @ v)
    assert_close(S.T * v, dense.T @ v)
    assert_close(S.to_dense(), dense, rtol=1e-10)
    assert not S.symmetric


def test_stencil2d_asymmetric_flags():
    from linops_tpu.sparse.stencil import Stencil2DOperator

    S = Stencil2DOperator(4, 4, [(0, 0), (0, 1)], jnp.asarray([2.0, -1.0]))
    assert not S.symmetric  # mirrored offset missing
    S2 = Stencil2DOperator(4, 4, [(0, -1), (0, 0), (0, 1)], jnp.asarray([-1.0, 2.0, -1.0]))
    assert S2.symmetric


def test_stencil2d_in_cg(rng):
    n = 12 * 12
    L = laplacian_2d(12, 12, dtype=jnp.float64) + 0.3 * lo.opEye(n, dtype=jnp.float64)
    b = jnp.asarray(rng.standard_normal(n))
    x, it, res = lo.cg(L, b, tol=1e-10, maxiter=500)
    assert float(res) < 1e-8


def test_stencil_3d(rng):
    """7-point 3-D Laplacian stencil vs dense oracle."""
    from linops_tpu.sparse.stencil import StencilOperator

    g = (3, 4, 5)
    n = 60
    offsets = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    coeffs = jnp.asarray([6.0, -1, -1, -1, -1, -1, -1], jnp.float64)
    S = StencilOperator(g, offsets, coeffs)
    assert S.symmetric
    dense = np.zeros((n, n))
    import itertools
    for k, off in enumerate(offsets):
        for idx in itertools.product(*(range(s) for s in g)):
            tgt = tuple(i + o for i, o in zip(idx, off))
            if all(0 <= t < s for t, s in zip(tgt, g)):
                r = np.ravel_multi_index(idx, g)
                c = np.ravel_multi_index(tgt, g)
                dense[r, c] += float(coeffs[k])
    v = rng.standard_normal(n)
    assert_close(S * v, dense @ v)
    assert_close(S.T * v, dense.T @ v)
    assert_close(S.to_dense(), dense, rtol=1e-12)
