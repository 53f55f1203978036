"""Shared fixtures mirroring the reference's test_aux.jl (test/test_aux.jl:1-33):
synthetic matrices with known singular values in [1, 2] built from QR factors,
and deterministic alternating-sign vectors."""

import numpy as np

RTOL = np.sqrt(np.finfo(np.float64).eps)  # reference rtol (test/test_linop.jl:4)


def simple_matrix(dtype, nrow, ncol, rng=None, symmetric=False):
    rng = rng or np.random.default_rng(0)
    n_min = min(nrow, ncol)
    cplx = np.issubdtype(np.dtype(dtype), np.complexfloating)

    def randm(m, n):
        a = rng.standard_normal((m, n))
        if cplx:
            a = a + 1j * rng.standard_normal((m, n))
        return a

    U, _ = np.linalg.qr(randm(nrow, n_min))
    V, _ = np.linalg.qr(randm(ncol, n_min))
    S = np.diag(np.linspace(1.0, 2.0, n_min))
    A = U @ S @ V.conj().T
    if symmetric:
        assert nrow == ncol
        A = (A + A.T) / 2
    return A.astype(dtype)


def simple_vector(dtype, n, rng=None):
    v = np.array([(-1.0) ** i for i in range(n)])
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        v = v + 1j * np.array([(-1.0) ** (i + 1) for i in range(n)])
    return v.astype(dtype)


def assert_close(a, b, rtol=RTOL, atol=None):
    a = np.asarray(a)
    b = np.asarray(b)
    scale = max(np.linalg.norm(b.ravel()), 1.0)
    if atol is None:
        atol = rtol * scale
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
