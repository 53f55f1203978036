"""AD tests, mirroring the reference ChainRules extension contract
(reference: test/test_chainrules.jl — Zygote gradients of sum(op*x) vs
dense) plus the native flow-through capability upgrade."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import simple_matrix, assert_close

import linops_tpu as lo
from linops_tpu.core.ad import apply_linear


def test_grad_matches_dense(rng):
    """∇ₓ sum(op·x) = Aᵀ·1 (reference test_chainrules.jl core check)."""
    A = simple_matrix(np.float64, 8, 6, rng)
    op = lo.LinearOperator(jnp.asarray(A))
    x = rng.standard_normal(6)
    g = jax.grad(lambda x_: jnp.sum(op.apply(x_, "N")))(jnp.asarray(x))
    assert_close(g, A.T @ np.ones(8))


def test_grad_through_composite(rng):
    A = simple_matrix(np.float64, 6, 6, rng)
    d = rng.random(6) + 1.0
    chain = 2.0 * (lo.opDiagonal(jnp.asarray(d)) @ lo.LinearOperator(jnp.asarray(A))) + lo.opEye(6)
    dense = 2.0 * np.diag(d) @ A + np.eye(6)
    x = jnp.asarray(rng.standard_normal(6))
    w = jnp.asarray(rng.standard_normal(6))
    g = jax.grad(lambda x_: jnp.vdot(w, chain.apply(x_, "N")))(x)
    assert_close(g, dense.T @ np.asarray(w))


def test_jvp_frule(rng):
    """frule: ẏ = op·ẋ (reference ext :6-25)."""
    A = simple_matrix(np.float64, 7, 5, rng)
    op = lo.LinearOperator(jnp.asarray(A))
    x = jnp.asarray(rng.standard_normal(5))
    dx = jnp.asarray(rng.standard_normal(5))
    y, dy = jax.jvp(lambda x_: op.apply(x_, "N"), (x,), (dx,))
    assert_close(y, A @ np.asarray(x))
    assert_close(dy, A @ np.asarray(dx))


def test_grad_wrt_operator_data(rng):
    """Capability upgrade over the reference: gradients w.r.t. the
    operator's own arrays (reference returns NoTangent)."""
    d = jnp.asarray(rng.random(5) + 1.0)
    x = jnp.asarray(rng.standard_normal(5))

    def loss(d_):
        return jnp.sum(lo.opDiagonal(d_).apply(x, "N") ** 2)

    g = jax.grad(loss)(d)
    assert_close(g, 2 * np.asarray(d) * np.asarray(x) ** 2)


def test_apply_linear_vjp_is_adjoint(rng):
    """apply_linear: backward = one adjoint apply, zero cotangent into the
    operator (the reference rrule exactly)."""
    A = simple_matrix(np.float64, 8, 6, rng)
    op = lo.LinearOperator(jnp.asarray(A))
    x = jnp.asarray(rng.standard_normal(6))
    y, vjp = jax.vjp(lambda x_: apply_linear(op, x_, "N"), x)
    g = jnp.asarray(rng.standard_normal(8))
    (dx,) = vjp(g)
    assert_close(dx, A.T @ np.asarray(g))

    # operator leaves get zero cotangent
    y2, vjp2 = jax.vjp(lambda op_, x_: apply_linear(op_, x_, "N"), op, x)
    d_op, dx2 = vjp2(g)
    assert_close(dx2, A.T @ np.asarray(g))
    assert float(jnp.abs(d_op.A).max()) == 0.0


def test_apply_linear_complex(rng):
    """Complex case: native AD and apply_linear agree (unconjugated
    transpose cotangents; grad adds conjugation)."""
    A = simple_matrix(np.complex128, 6, 6, rng)
    op = lo.LinearOperator(jnp.asarray(A))
    x = jnp.asarray(rng.standard_normal(6) + 1j * rng.standard_normal(6))
    g = jnp.asarray(rng.standard_normal(6) + 1j * rng.standard_normal(6))

    _, vjp_native = jax.vjp(lambda x_: op.apply(x_, "N"), x)
    _, vjp_custom = jax.vjp(lambda x_: apply_linear(op, x_, "N"), x)
    (dn,) = vjp_native(g)
    (dc,) = vjp_custom(g)
    assert_close(dc, np.asarray(dn))


def test_apply_linear_function_operator_uses_ctprod(rng):
    """FunctionOperator backward goes through the user's transpose product."""
    A = simple_matrix(np.float64, 6, 6, rng)
    Aj = jnp.asarray(A)
    calls = {"t": 0}

    def prod(v):
        return Aj @ v

    def tprod(u):
        calls["t"] += 1
        return Aj.T @ u

    op = lo.FunctionOperator(6, 6, prod, tprod)
    x = jnp.asarray(rng.standard_normal(6))
    g = jax.grad(lambda x_: jnp.sum(apply_linear(op, x_, "N")))(x)
    assert_close(g, A.T @ np.ones(6))
    assert calls["t"] >= 1  # backward traced the user's tprod


def test_grad_through_lbfgs(rng):
    """Gradients flow through the two-loop recursion."""
    n = 10
    H = lo.InverseLBFGSOperator(n, mem=4)
    for _ in range(4):
        s = rng.standard_normal(n)
        y = s + 0.1 * rng.standard_normal(n)
        H.push(s, y)
    Hd = np.asarray(H.to_dense())
    x = jnp.asarray(rng.standard_normal(n))
    g = jax.grad(lambda x_: jnp.sum(H.apply(x_, "N")))(x)
    assert_close(g, Hd.T @ np.ones(n), rtol=1e-8)
