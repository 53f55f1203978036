"""Operators are registered pytrees, so jax.vmap composes with them:
a batch axis on the leaves gives a BATCH OF OPERATORS, and vmapped
applies/solves run as one compiled program (a capability the reference's
mutable-struct design cannot express)."""

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo


def test_vmap_diagonal_batch(rng):
    B, n = 5, 12
    ds = jnp.asarray(rng.standard_normal((B, n)) + 3.0)
    ops = jax.vmap(lo.opDiagonal)(ds)  # one stacked operator pytree
    assert ops.d.shape == (B, n)
    vs = jnp.asarray(rng.standard_normal((B, n)))
    ys = jax.vmap(lambda op, v: op @ v)(ops, vs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ds) * np.asarray(vs))


def test_vmap_graph_batch(rng):
    B, n = 4, 10
    As = jnp.asarray(rng.standard_normal((B, n, n)))
    ds = jnp.asarray(rng.standard_normal((B, n)))
    vs = jnp.asarray(rng.standard_normal((B, n)))
    ys = jax.vmap(
        lambda A, d, v: (2.0 * lo.MatrixOperator(A) + lo.opDiagonal(d)) @ v
    )(As, ds, vs)
    oracle = 2.0 * np.einsum("bij,bj->bi", np.asarray(As), np.asarray(vs)) + (
        np.asarray(ds) * np.asarray(vs)
    )
    np.testing.assert_allclose(np.asarray(ys), oracle, atol=1e-12)


def test_vmap_batched_cg(rng):
    # B independent SPD systems, each with its OWN operator, one program
    B, n = 6, 14
    As = jnp.asarray(rng.standard_normal((B, n, n)))
    spd = jnp.einsum("bij,bkj->bik", As, As) + 10.0 * jnp.eye(n)[None]
    bs = jnp.asarray(rng.standard_normal((B, n)))

    def solve(A, b):
        op = lo.MatrixOperator(A, symmetric=True, hermitian=True)
        return lo.cg(op, b, tol=1e-12, maxiter=200)[0]

    xs = jax.vmap(solve)(spd, bs)
    res = np.einsum("bij,bj->bi", np.asarray(spd), np.asarray(xs)) - np.asarray(bs)
    assert np.linalg.norm(res) < 1e-8


def test_vmap_composes_with_grad(rng):
    # grad through a vmapped operator apply w.r.t. the operator data
    B, n = 3, 8
    ds = jnp.asarray(np.abs(rng.standard_normal((B, n))) + 1.0)
    vs = jnp.asarray(rng.standard_normal((B, n)))

    def loss(d, v):
        return jnp.sum((lo.opDiagonal(d) @ v) ** 2)

    g = jax.vmap(jax.grad(loss))(ds, vs)
    np.testing.assert_allclose(np.asarray(g),
                               2.0 * np.asarray(ds) * np.asarray(vs) ** 2,
                               rtol=1e-12)
