"""AD integration: operator applies as differentiable primitives.

Reference counterpart: the ChainRulesCore extension defining ``frule``/
``rrule`` for ``op * x`` with pullback ``op' * ȳ`` and ``NoTangent`` for the
operator (reference: ext/LinearOperatorsChainRulesCoreExt.jl:6-72).

Here there are two AD paths, both capability-supersets of the reference:

1. **Native flow-through** — every apply is pure JAX, so ``jax.grad`` /
   ``jax.jvp`` / ``jax.vjp`` differentiate straight through the operator
   graph, including *with respect to operator data* (diagonals, dense
   blocks, QN memory). The reference cannot do this (its rrule returns
   ``NoTangent`` for the operator).

2. **``apply_linear``** — the reference-faithful rule as a
   ``jax.custom_vjp``: the backward pass *is one adjoint apply*
   (``op.apply(g, T∘mode)``), the operator is treated as a constant
   (zero cotangent for its leaves). Use it when the operator's
   transpose product is cheaper or more accurate than AD-transposing the
   forward (e.g. a FunctionOperator whose user-provided ``ctprod`` avoids
   recomputation), or to stop gradients flowing into operator state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base import LinearOperator, compose_modes

__all__ = ["apply_linear"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def apply_linear(op: LinearOperator, v, mode: str = "N"):
    """``op.apply(v, mode)`` whose VJP is a single apply in the transposed
    mode (the reference rrule: pullback of ``op*x`` is ``op'ȳ``,
    ext/LinearOperatorsChainRulesCoreExt.jl:27-33), with no gradient into
    the operator's own arrays."""
    return op.apply(v, mode)


def _fwd(op, v, mode):
    return op.apply(v, mode), op


def _bwd(mode, op, g):
    # JAX's cotangents for a C-linear map are the *unconjugated* transpose
    # (grad adds the conjugation), so the pullback mode is T∘mode.
    dv = op.apply(g, compose_modes("T", mode))
    d_op = jax.tree.map(jnp.zeros_like, op)
    return (d_op, dv)


apply_linear.defvjp(_fwd, _bwd)
