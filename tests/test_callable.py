"""Callable-object-backed operators (reference: test/test_callable.jl)."""

import numpy as np
import jax.numpy as jnp

import linops_tpu as lo


class Flip:
    """Callable class as a product function (reference Flip struct)."""

    def __call__(self, x):
        return -x


def test_callable_operator():
    op = lo.LinearOperator(jnp.float64, 2, 2, True, True, Flip())
    ones = np.ones(2)
    np.testing.assert_array_equal(np.asarray(op * ones), -ones)
    np.testing.assert_array_equal(np.asarray(op.H * ones), -ones)
    np.testing.assert_array_equal(np.asarray(op.T * ones), -ones)


def test_callable_no_recompile():
    """Cached applies across repeated calls (reference zero-alloc check,
    test/test_callable.jl:19-21)."""
    op = lo.LinearOperator(jnp.float64, 2, 2, True, True, Flip())
    v = jnp.ones(2)
    op.matvec(v)
    before = lo.apply_cache_sizes()
    for _ in range(5):
        op.matvec(v)
    assert lo.apply_cache_sizes() == before


def test_callable_mul_axpby():
    """5-arg mul semantics with a callable prod."""
    op = lo.LinearOperator(jnp.float64, 2, 2, True, True, Flip())
    v = jnp.ones(2)
    res = jnp.full(2, 10.0)
    out = lo.mul(op, v, 2.0, 3.0, res)
    np.testing.assert_allclose(np.asarray(out), 2.0 * (-1.0) + 3.0 * 10.0)
