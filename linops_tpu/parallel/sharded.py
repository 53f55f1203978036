"""Sharded operators: partition any operator's arrays over a device mesh.

Design (SURVEY.md §2.3 'Distributed operator layer'): operators are pytrees,
so distribution = placing their array leaves with ``NamedSharding`` and
letting GSPMD partition every jitted apply, inserting ICI collectives
(psum for contracted-over-sharded dims, all_gathers where layouts change).
This generalizes the reference's ``S`` storage-type kwarg — its single
device-placement axis (reference: src/constructors.jl:15) — to
(mesh, partition-spec) on every operator.

Default partition rules (overridable per class via ``_shard_child``):
  - 2-D leaves: rows split across the mesh axis (row-partitioned operator;
    forward apply needs no collective, adjoint apply psums)
  - 1-D leaves of operator dimension: split (diagonal operators)
  - scalars / small vectors: replicated
  - quasi-Newton memory ``(mem, n)``: split along n (each device holds its
    slice of every {s, y} pair; dots psum, axpys stay local)
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.base import LinearOperator, Counters

__all__ = ["shard_operator", "operator_sharding_rule"]


def _default_spec(arr, axis: str):
    nd = getattr(arr, "ndim", None)
    if nd == 2:
        return P(axis, None)
    if nd == 1 and arr.shape[0] >= 2:
        return P(axis)
    return P()


def _place(value, mesh: Mesh, axis: str, spec_fn):
    """Recursively place arrays inside operators / states / containers."""
    if isinstance(value, LinearOperator):
        return shard_operator(value, mesh, axis)
    if hasattr(value, "_fields"):  # NamedTuple state (QN ring buffers)
        placed = [
            _place_leaf(getattr(value, f), mesh, axis, spec_fn, qn=True)
            for f in value._fields
        ]
        return type(value)(*placed)
    if isinstance(value, (tuple, list)):
        seq = [_place(v, mesh, axis, spec_fn) for v in value]
        return type(value)(seq)
    return _place_leaf(value, mesh, axis, spec_fn)


def _place_leaf(arr, mesh, axis, spec_fn, qn: bool = False):
    if arr is None or not hasattr(arr, "ndim"):
        return arr
    if qn:
        # (mem, n) memories: split the operator dimension n; replicate the
        # small per-pair scalars and the (mem, mem) Gram matrices.
        n_dev = mesh.shape[axis]
        shard_it = (
            arr.ndim == 2
            and arr.shape[1] != arr.shape[0]
            and arr.shape[1] % n_dev == 0
        )
        spec = P(None, axis) if shard_it else P()
    else:
        spec = spec_fn(arr, axis)
    return jax.device_put(arr, NamedSharding(mesh, spec))


def operator_sharding_rule(op: LinearOperator):
    """The spec function used for ``op``'s own array leaves. Classes may
    override ``_shard_child(field, arr, axis) -> PartitionSpec``."""
    custom = getattr(type(op), "_shard_child", None)

    def spec_fn(arr, axis, _custom=custom, _op=op):
        if _custom is not None:
            return _custom(_op, arr, axis)
        return _default_spec(arr, axis)

    return spec_fn


def shard_operator(op: LinearOperator, mesh: Mesh, axis: Optional[str] = None):
    """Return a copy of ``op`` whose arrays are placed on ``mesh`` with
    row-partitioned shardings (recursing through composite graphs).

    Every subsequent jitted apply compiles to an SPMD program over the mesh.
    """
    if axis is None:
        axis = mesh.axis_names[0]
    spec_fn = operator_sharding_rule(op)
    cls = type(op)
    new = object.__new__(cls)
    for f in cls._fields_children:
        object.__setattr__(new, f, _place(getattr(op, f), mesh, axis, spec_fn))
    for f in cls._fields_aux:
        object.__setattr__(new, f, getattr(op, f))
    object.__setattr__(new, "_counters", Counters())
    return new
