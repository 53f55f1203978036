"""Checkpoint / resume for operator state.

The reference has no checkpointing (SURVEY.md §5: closest is ``reset!``);
here every operator is a pytree, so its state — quasi-Newton ring buffers,
sparse storage, dense blocks — serializes directly. This is the capability
upgrade called out in SURVEY.md §5: a device-resident L-BFGS memory can be
saved mid-run and restored bit-exactly.

Uses numpy's npz container (no external deps); orbax users can instead pass
``op_state(op)`` pytrees to their checkpointer directly.
"""

from __future__ import annotations

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import LinearOperator

__all__ = ["save_operator", "load_operator_state", "op_state"]


def op_state(op: LinearOperator):
    """The operator's dynamic state as a pytree (for orbax etc.)."""
    return {f: getattr(op, f) for f in type(op)._fields_children}


def _structure_fingerprint(op: LinearOperator, leaves) -> dict:
    """Environment-independent structure fingerprint: the graph's node class
    names plus per-leaf shapes. Deliberately does NOT hash aux data (a Mesh
    in a partitioned operator's aux would bake device identities into the
    checkpoint and block cross-topology restores)."""

    def classes(x, out):
        if isinstance(x, LinearOperator):
            out.append(type(x).__name__)
            for f in type(x)._fields_children:
                classes(getattr(x, f), out)
        elif isinstance(x, (tuple, list)):
            for v in x:
                classes(v, out)
        elif hasattr(x, "_fields"):  # NamedTuple state/storage pytrees
            out.append(type(x).__name__)
        return out

    return {
        "classes": classes(op, []),
        "leaf_shapes": [list(np.shape(x)) for x in leaves],
    }


def _to_storable(x):
    """npz-compatible view + original dtype name (bf16 etc. are ml_dtypes
    that npz would store as raw void and fail to restore)."""
    a = np.asarray(x)
    name = a.dtype.name
    if a.dtype.kind == "V":  # ml_dtypes (bfloat16, fp8, ...)
        a = a.view(np.dtype(f"u{a.dtype.itemsize}"))
    return a, name


def save_operator(path: str, op: LinearOperator) -> None:
    """Serialize an operator's dynamic leaves (+ a structure fingerprint)
    to ``path`` (.npz). All dtypes round-trip, including bfloat16.

    Operators may define ``_before_save()`` to materialize deferred state
    first (e.g. lazy quasi-Newton a-vectors); the hook is invoked on EVERY
    operator in the graph (a QN operator nested in a composition is
    materialized too) so the checkpoint is self-contained."""

    def run_hooks(x):
        if isinstance(x, LinearOperator):
            hook = getattr(x, "_before_save", None)
            if hook is not None:
                hook()
            for f in type(x)._fields_children:
                run_hooks(getattr(x, f))
        elif isinstance(x, (tuple, list)):
            for v in x:
                run_hooks(v)

    run_hooks(op)
    leaves, treedef = jax.tree_util.tree_flatten(op)
    arrays = {}
    dtype_names = []
    for i, x in enumerate(leaves):
        a, name = _to_storable(x)
        arrays[f"leaf_{i}"] = a
        dtype_names.append(name)
    meta = {
        "class": type(op).__name__,
        "structure": _structure_fingerprint(op, leaves),
        "n_leaves": len(leaves),
        "dtypes": dtype_names,
    }
    buf = io.BytesIO()
    np.savez(buf, __meta__=json.dumps(meta), **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)  # atomic


def load_operator_state(path: str, op: LinearOperator) -> LinearOperator:
    """Restore saved leaves into an operator of the same structure
    (built the same way as the one saved). Returns ``op`` mutated in place
    (host wrapper semantics, like the reference's ``reset!`` family)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta["class"] != type(op).__name__:
            raise ValueError(
                f"checkpoint holds {meta['class']}, target is {type(op).__name__}"
            )
        leaves, treedef = jax.tree_util.tree_flatten(op)
        if meta["n_leaves"] != len(leaves):
            raise ValueError("checkpoint structure mismatch")
        want = meta.get("structure")
        if want is not None and want != _structure_fingerprint(op, leaves):
            raise ValueError("checkpoint structure mismatch")
        dtype_names = meta.get("dtypes", [None] * len(leaves))
        new_leaves = []
        for i in range(len(leaves)):
            a = z[f"leaf_{i}"]
            name = dtype_names[i]
            if name is not None and a.dtype.name != name:
                a = a.view(jnp.dtype(name))  # bf16 etc. stored as uint bits
            j = jnp.asarray(a)
            if name is not None and j.dtype.name != name:
                raise ValueError(
                    f"checkpoint leaf has dtype {name} but this runtime "
                    f"canonicalizes it to {j.dtype.name} (enable x64 to "
                    "restore float64 state bit-exactly)"
                )
            new_leaves.append(j)
    restored = jax.tree_util.tree_unflatten(treedef, new_leaves)
    for f in type(op)._fields_children:
        setattr(op, f, getattr(restored, f))
    return op
