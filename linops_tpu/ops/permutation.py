"""Permutation operators, Clos-routed on TPU.

The reference composes permutations from ``opRestriction`` (reference:
src/special-operators.jl:167-201), whose apply is ``x[I]`` — a fine-grained
gather that runs ~3 orders below the streaming roofline on TPU (0.1 G
elem/s measured). A permutation is a STATIC data movement, so it routes
through the same radix-128 Clos network as the unstructured SpMV pipeline
(sparse/routing.py): 3-5 lane-gather crossbars + XLA-transpose wirings at
~100 G elem/s.

This unlocks bandwidth-reducing reorderings as first-class operators:
``opPermutation(rcm_permutation(...))`` conjugates a scattered operator
into banded form (``P A Pᵀ``) while keeping applies TPU-fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import (LinearOperator, LinearOperatorException,
                         register_operator)
from ..sparse.routed import _clos_size, _route_and_sum, _route_int8
from ..sparse.routing import RADIX

__all__ = ["PermutationOperator", "opPermutation"]


def _build_stages(dest_n: np.ndarray, npad: int):
    """Stage arrays routing position j -> dest_n[j], identity on the pad
    tail. Returns a tuple of device int8 arrays (G1 NOT folded: the input
    is runtime data)."""
    dest = np.arange(npad, dtype=np.int64)
    dest[: dest_n.shape[0]] = dest_n
    # pad tail maps pad positions onto themselves only if dest_n is a
    # permutation of [0, n) — asserted by the caller
    return tuple(jnp.asarray(g) for g in _route_int8(dest))


class PermutationOperator(LinearOperator):
    """``y = x[perm]`` (row-permutation matrix: ``P[i, perm[i]] = 1``).

    Transpose/adjoint applies use a second routing program for the inverse
    permutation (``Pᵀ = P⁻¹``: orthogonal). On TPU the crossbars run as
    Pallas lane gathers; off-TPU (and for non-f32/bf16 dtypes) the same
    stage arrays execute as jnp gathers, and tiny instances fall back to
    the plain fancy-index gather.

    dtype contract: a permutation carries NO values of its own — applies
    preserve the input dtype exactly. The ``dtype`` property reports
    float32 as a placeholder only (there is no value array to type);
    composite dtype inference through ``jnp.result_type`` therefore treats
    a permutation like an f32 leaf, which can over-promote a pure-bf16
    chain's REPORTED dtype — the computed values are unaffected.
    """

    _fields_children = ("stages", "stages_inv", "perm", "perm_inv")
    _fields_aux = ("_n", "_npad")

    def __init__(self, perm):
        super().__init__()
        perm = np.asarray(perm, np.int64)
        n = perm.shape[0]
        if not np.array_equal(np.sort(perm), np.arange(n)):
            raise LinearOperatorException("perm is not a permutation")
        self._n = int(n)
        self._npad = int(_clos_size(n))
        # y[i] = x[perm[i]]  <=>  element at j moves to slot inv[j]
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        self.perm = jnp.asarray(perm, jnp.int32)
        self.perm_inv = jnp.asarray(inv, jnp.int32)
        self.stages = _build_stages(inv, self._npad)
        # the inverse routing program packs lazily on the first T/H
        # dispatch (bump) — forward-only users skip half the pack cost
        self.stages_inv = None

    @property
    def nrow(self):
        return self._n

    ncol = nrow

    @property
    def dtype(self):
        # placeholder only — see the class docstring's dtype contract
        # (applies preserve the input dtype; there is no value array)
        return jnp.dtype(jnp.float32)

    @property
    def symmetric(self):
        return False

    hermitian = symmetric

    def _route(self, x, stages):
        if self._npad < 4 * RADIX:
            # tiny: the routing overhead isn't worth it anywhere
            use_pallas = False
        else:
            use_pallas = (
                jax.default_backend() == "tpu"
                and jnp.dtype(x.dtype) in (jnp.dtype(jnp.float32),
                                           jnp.dtype(jnp.bfloat16))
            )
        xp = jnp.pad(x, (0, self._npad - self._n)) if self._n < self._npad else x
        a = _route_and_sum(xp.reshape(-1, RADIX), stages, use_pallas,
                           g1_folded=False, w=1)
        return a.reshape(-1)[: self._n]

    def bump(self, mode: str, n: int = 1):
        # NOTE: matmat(T/H) also lands here and packs a program its row
        # gather never uses — bump carries no vector/matrix arity, and one
        # wasted pack beats a missing one on the hot vector path
        if (mode in ("T", "H") and self.stages_inv is None
                and not isinstance(self.perm, jax.core.Tracer)):
            self.stages_inv = _build_stages(
                np.asarray(self.perm, np.int64), self._npad)
        super().bump(mode, n)

    def _prod(self, v):
        return self._route(v, self.stages)

    def _tprod(self, u):
        if self.stages_inv is None:
            # in-jit first touch (no host bump ran): fall back to the
            # plain gather — correct, slower; see RoutedCSROperator note
            return u[self.perm_inv]
        return self._route(u, self.stages_inv)

    def _ctprod(self, w):
        return self._tprod(w)

    def apply_matrix(self, M, mode: str = "N"):
        # matrix RHS: an XLA row gather moves whole (k,)-rows — efficient
        # for wide blocks, no per-element scatter involved. Mode "C"
        # (conjugate, NO transpose) of a real permutation acts like "N".
        idx = self.perm if mode in ("N", "C") else self.perm_inv
        return M[idx]

    def _name(self):
        return "Permutation operator (Clos-routed)"

    @staticmethod
    def _shard_child(op, arr, axis):
        # routing stage arrays are interdependent index structures:
        # replicate (parallel/sharded.py honors this rule per leaf)
        from jax.sharding import PartitionSpec

        return PartitionSpec()


register_operator(PermutationOperator)


def opPermutation(perm) -> PermutationOperator:
    """Permutation operator ``(P x)[i] = x[perm[i]]`` with TPU-fast
    Clos-routed applies (module docstring)."""
    return PermutationOperator(perm)
