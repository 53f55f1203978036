"""Storage propagation through every constructor — the analogue of the
reference's S-kwarg suite (reference: test/gpu/test_S_kwarg.jl), where the
single storage axis (array type) generalizes here to (dtype, device
placement/sharding). Each constructor must propagate its input's dtype to
the operator and its applies, and sharded placement must survive every
constructor via shard_operator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import linops_tpu as lo
from linops_tpu.parallel import make_mesh, shard_operator


@pytest.mark.parametrize("dt", [jnp.float32, jnp.float64, jnp.complex64])
def test_dtype_propagation_constructors(dt, rng):
    n = 16
    mat = jnp.asarray(rng.standard_normal((n, n))).astype(dt)
    vec = jnp.asarray(rng.standard_normal(n)).astype(dt)
    x = jnp.ones(n, dt)

    ops = [
        lo.LinearOperator(mat),
        lo.LinearOperator(dt, n, n, False, False, lambda v: mat @ v),
        lo.opEye(n, dtype=dt),
        lo.opEye(8, n, dtype=dt),
        lo.opOnes(n, n, dtype=dt),
        lo.opZeros(n, n, dtype=dt),
        lo.opDiagonal(vec),
        lo.BlockDiagonalOperator(lo.LinearOperator(mat), lo.LinearOperator(mat)),
        lo.hcat(lo.LinearOperator(mat), lo.opDiagonal(vec)),
        lo.vcat(lo.LinearOperator(mat), lo.opDiagonal(vec)),
        lo.ShiftedOperator(lo.LinearOperator(mat), dt.type(0.5) if hasattr(dt, "type") else 0.5),
        lo.kron(lo.LinearOperator(mat[:3, :3]), lo.LinearOperator(mat[:4, :4])),
        2.0 * lo.LinearOperator(mat),
        lo.LinearOperator(mat) + lo.opDiagonal(vec),
        lo.LinearOperator(mat) @ lo.opDiagonal(vec),
    ]
    want = jnp.dtype(dt)
    for op in ops:
        assert jnp.dtype(op.dtype) == want, type(op).__name__
        y = op.matvec(jnp.ones(op.ncol, dt))
        assert y.dtype == want, type(op).__name__


@pytest.mark.parametrize("dt", [jnp.float32, jnp.float64])
def test_dtype_propagation_qn(dt):
    n = 12
    for op in (
        lo.LBFGSOperator(dt, n, mem=3),
        lo.InverseLBFGSOperator(dt, n, mem=3),
        lo.LSR1Operator(dt, n, mem=3),
    ):
        assert jnp.dtype(op.dtype) == jnp.dtype(dt)
        assert op.matvec(jnp.ones(n, dt)).dtype == jnp.dtype(dt)
    if jnp.dtype(dt) == jnp.float64:
        for op in (lo.DiagonalPSB(np.ones(n)), lo.SpectralGradient(1.0, n)):
            assert jnp.dtype(op.dtype) == jnp.dtype(dt)


def test_sharding_propagation_through_constructors(rng):
    """Device placement survives every constructor via shard_operator (the
    reference's storage_type trait generalized; SURVEY.md §5 config)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple virtual devices")
    mesh = make_mesh(min(jax.device_count(), 8))
    P_dev = mesh.devices.size
    n = 16 * P_dev
    mat = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    vec = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    graph = 2.0 * (lo.LinearOperator(mat) @ lo.opDiagonal(vec)) + lo.LinearOperator(mat).T
    sharded = shard_operator(graph, mesh)

    # every 2-D leaf is row-sharded, every large 1-D leaf dim-sharded
    leaves = jax.tree_util.tree_leaves(sharded)
    axis = mesh.axis_names[0]
    for leaf in leaves:
        if hasattr(leaf, "sharding") and hasattr(leaf, "ndim") and leaf.size > 4:
            spec = leaf.sharding.spec
            assert axis in tuple(spec), f"unsharded leaf {leaf.shape}"

    v = rng.standard_normal(n).astype(np.float32)
    dense = 2.0 * (np.asarray(mat) @ np.diag(np.asarray(vec))) + np.asarray(mat).T
    np.testing.assert_allclose(np.asarray(sharded * v), dense @ v, rtol=2e-4)
