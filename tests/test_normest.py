"""normest / estimate_opnorm / property checks
(reference: test/test_normest.jl, test/test_estimate_opnorm.jl)."""

import numpy as np
import pytest

import linops_tpu as lo
from helpers import simple_matrix, simple_vector


def test_normest_matches_dense(rng):
    A = simple_matrix(np.float64, 30, 20, rng)
    true_norm = np.linalg.norm(A, 2)
    op = lo.LinearOperator(A)
    est, cnt = lo.normest(op, tol=1e-10, maxiter=1000)
    assert abs(est - true_norm) < 1e-6 * true_norm
    assert cnt >= 1
    # also accepts bare matrices (reference normest(S) generic)
    est2, _ = lo.normest(A, tol=1e-10, maxiter=1000)
    assert abs(est2 - true_norm) < 1e-6 * true_norm


def test_normest_zero_operator():
    op = lo.opZeros(5, 5)
    est, cnt = lo.normest(op)
    assert est == 0.0 and cnt == 0


def test_estimate_opnorm_tiny_dense(rng):
    A = simple_matrix(np.float64, 4, 4, rng)
    est, ok = lo.estimate_opnorm(lo.LinearOperator(A))
    assert ok
    assert abs(est - np.linalg.norm(A, 2)) < 1e-10


def test_estimate_opnorm_hermitian_lanczos(rng):
    B = simple_matrix(np.float64, 40, 40, rng, symmetric=True)
    op = lo.LinearOperator(B, symmetric=True, hermitian=True)
    est, ok = lo.estimate_opnorm(op)
    assert ok
    true_norm = np.max(np.abs(np.linalg.eigvalsh(B)))
    assert abs(est - true_norm) < 1e-8 * true_norm


def test_estimate_opnorm_general_lanczos(rng):
    A = simple_matrix(np.float64, 50, 30, rng)
    op = lo.LinearOperator(A)
    est, ok = lo.estimate_opnorm(op)
    assert ok
    true_norm = np.linalg.norm(A, 2)
    assert abs(est - true_norm) < 1e-6 * true_norm


def test_checks(rng):
    A = simple_matrix(np.complex128, 6, 6, rng)
    op = lo.LinearOperator(A)
    assert lo.check_ctranspose(op)
    H = (A + A.conj().T) / 2
    assert lo.check_hermitian(lo.LinearOperator(H, hermitian=True))
    assert not lo.check_hermitian(lo.LinearOperator(A))
    spd = H @ H.conj().T + 6 * np.eye(6)
    assert lo.check_positive_definite(lo.LinearOperator(spd, hermitian=True))
    assert not lo.check_positive_definite(lo.LinearOperator(-spd, hermitian=True))
    # integer exact path
    M = np.array([[2, 1], [1, 3]], dtype=np.int64)
    assert lo.check_hermitian(M)
    assert lo.check_ctranspose(M)


def test_estimate_opnorm_lobpcg_fallback_on_clustered_edge():
    """The doubly-degenerate 2-D Laplacian spectrum edge exhausts
    single-vector Lanczos retries; the blocked LOBPCG fallback converges
    (lobpcg_fallback=False restores the reference's (nan, False))."""
    import warnings
    import jax
    import jax.numpy as jnp

    ng = 32
    A = lo.laplacian_2d(ng, ng, dtype=jnp.float64) + lo.opDiagonal(
        0.6 * jnp.ones(ng * ng))
    h = np.pi / (ng + 1)
    c = 2 * np.cos(np.arange(1, ng + 1) * h)
    lam_max = float((4 - c[:, None] - c[None, :]).max() + 0.6)
    key = jax.random.PRNGKey(3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        off_nrm, off_ok = lo.estimate_opnorm(A, key=key, lobpcg_fallback=False)
        nrm, ok = lo.estimate_opnorm(A, key=key)
    if not off_ok:  # Lanczos genuinely exhausted on this spectrum
        assert np.isnan(off_nrm)
        assert ok and abs(nrm - lam_max) < 1e-6 * lam_max
    else:  # if Lanczos happened to converge, the fallback path is moot
        assert abs(off_nrm - lam_max) < 1e-6 * lam_max
