"""Halo-exchange partitioned operator tests on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import assert_close

import linops_tpu as lo
from linops_tpu.parallel import make_mesh
from linops_tpu.parallel.halo import HaloPartitionedOperator, banded_partition


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh(min(jax.device_count(), 8))


def banded(rng, n, bw):
    A = np.zeros((n, n))
    for k in range(-bw, bw + 1):
        d = rng.standard_normal(n - abs(k))
        A += np.diag(d, k)
    return A


def test_banded_matvec(mesh, rng):
    P_dev = mesh.devices.size
    n = 16 * P_dev
    A = banded(rng, n, 3)
    op = banded_partition(A, mesh)
    assert op.halo == 3
    v = rng.standard_normal(n)
    assert_close(op * v, A @ v)


def test_banded_transpose(mesh, rng):
    P_dev = mesh.devices.size
    n = 16 * P_dev
    A = banded(rng, n, 2)
    op = banded_partition(A, mesh)
    u = rng.standard_normal(n)
    assert_close(op.T * u, A.T @ u)
    assert_close(op.H * u, A.T @ u)


def test_halo_chain_and_cg(mesh, rng):
    """The partitioned operator drives jitted Krylov loops end-to-end."""
    P_dev = mesh.devices.size
    n = 16 * P_dev
    A = banded(rng, n, 2)
    A = A @ A.T + 2 * n * np.eye(n)  # SPD, bandwidth 4
    op = banded_partition(A, mesh, symmetric=True, hermitian=True)
    b = jnp.asarray(rng.standard_normal(n))
    x, iters, res = lo.cg(op, b, tol=1e-10, maxiter=300)
    assert np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b) < 1e-8

    out = lo.matvec_chain(op, b, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_coupling_beyond_halo_rejected(mesh, rng):
    P_dev = mesh.devices.size
    n = 16 * P_dev
    A = np.eye(n)
    A[0, -1] = 1.0  # couples across the whole chain
    with pytest.raises(lo.LinearOperatorException):
        banded_partition(A, mesh, halo=2)


def test_halo_in_algebra(mesh, rng):
    """Partitioned operators compose in the lazy algebra."""
    P_dev = mesh.devices.size
    n = 16 * P_dev
    A = banded(rng, n, 2)
    op = banded_partition(A, mesh)
    d = rng.standard_normal(n) + 2.0
    chain = 2.0 * (lo.opDiagonal(jnp.asarray(d)) @ op)
    v = rng.standard_normal(n)
    assert_close(chain * v, 2.0 * np.diag(d) @ A @ v)


def test_lobpcg_on_halo_partitioned_operator(mesh, rng):
    """Distributed eigensolve: the halo-partitioned operator's ppermute
    applies drive lobpcg to the analytic tridiagonal spectrum."""
    import scipy.sparse as sps

    n = 8 * mesh.devices.size
    main = 2.5 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    T = sps.diags([off, main, off], [-1, 0, 1]).toarray()
    hop = banded_partition(jnp.asarray(T), mesh, symmetric=True, hermitian=True)
    th, X, res, it = lo.lobpcg(hop, k=2, largest=True, tol=1e-8, maxiter=400,
                               key=jax.random.PRNGKey(0))
    lam = np.sort(2.5 + 2 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1)))
    np.testing.assert_allclose(np.asarray(th), lam[-2:][::-1], rtol=1e-6)
