"""On-chip residency hint for chain drivers.

When a jitted loop (``matvec_chain``, the Krylov drivers) re-applies the
same operator hundreds of times, the operator's arrays are loop-invariant.
XLA:TPU will keep such a buffer in fast on-chip memory across iterations —
but only when the buffer is *produced inside the computation*; plain jit
arguments stay in HBM. Measured on v5e at the bench BSR shape (64 MiB of
bf16 128×128 blocks): streamed-from-HBM chain 95.7 µs/apply vs on-chip
27.6 µs/apply (1215 Gnnz/s, ~3.5×), and multi-RHS SpMM 114 → 32 µs.

``chain_resident`` therefore rematerializes large bf16 leaves through a
multiply by a data-dependent exact 1 (unfoldable: XLA cannot simplify
``x*0`` under NaN/Inf semantics, and the ``where`` pins the value to 0
even then). The multiply runs ONCE per jit call (hoisted out of the
loop), so it costs one extra pass over the data — amortized to noise
over a chain — and is numerically exact (bf16 ``v*1 == v``).

bf16 and f32 float leaves are hoisted (the multiply by 1 is exact in
both); small leaves gain nothing and are skipped. The budget below is
empirical (64 MiB measured resident on v5e); oversized totals skip the
hint entirely so no copy is wasted. The check uses GLOBAL leaf sizes, so
sharded operators whose per-device shards would fit are conservatively
skipped — a safe under-approximation (the hint is an optimization, never
a semantic change).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["chain_resident"]

_MIN_LEAF_BYTES = 1 << 20  # don't bother under 1 MiB
# Largest working set MEASURED to stay resident on v5e is 64 MiB (the bf16
# headline BSR blocks, bench.py sec_spmv_bf16); 96 MiB = 1.5× headroom so
# slightly-larger operators still get the attempt — between 64 and 96 MiB
# residency is extrapolated, and the cost of a failed attempt is one extra
# rematerialization pass, not a correctness issue.
_BUDGET_BYTES = 96 << 20
_DTYPES = (jnp.bfloat16, jnp.float32)


def _nbytes(leaf) -> int:
    return leaf.size * jnp.dtype(leaf.dtype).itemsize


def _candidate(leaf) -> bool:
    return (
        hasattr(leaf, "dtype")
        and any(leaf.dtype == d for d in _DTYPES)
        and _nbytes(leaf) >= _MIN_LEAF_BYTES
    )


def chain_resident(tree, x):
    """Return ``tree`` with large float leaves rematerialized so a chain
    loop over it can keep them on-chip. ``x`` is any traced array of the
    computation (used to derive the unfoldable exact-1 scalar). No-op when
    nothing qualifies or the total exceeds the on-chip budget."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(_nbytes(leaf) for leaf in leaves if _candidate(leaf))
    if total == 0 or total > _BUDGET_BYTES:
        return tree
    z = jnp.real(x.ravel()[0])
    one = jnp.where(jnp.isfinite(z), z * 0, jnp.zeros_like(z)) + 1
    return jax.tree_util.tree_map(
        lambda leaf: leaf * one.astype(leaf.dtype) if _candidate(leaf) else leaf,
        tree,
    )
