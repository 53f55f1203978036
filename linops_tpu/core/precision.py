"""Matmul precision policy: precision follows storage dtype.

TPU MXU contractions at DEFAULT precision truncate f32 inputs to bf16
(~3 decimal digits), silently breaking the f32-exact semantics users of
the reference get from BLAS (reference delegation points:
/root/reference/src/constructors.jl:25-27, src/operations.jl:34). XLA may
additionally hoist the f32→bf16 convert out of chain loops and cache the
shrunken arrays in VMEM — fast, but not the arithmetic the dtype
advertises.

Policy (applied to every library contraction that can reach the MXU):

- any bf16 input  → ``Precision.DEFAULT`` — the single bf16 pass IS exact
  for bf16 storage; callers opt into MXU speed by storing bf16.
- otherwise       → ``Precision.HIGHEST`` — f32-exact (3-pass bf16x9 on
  TPU). Free on HBM-bound matvec-shaped contractions (measured 182.7 vs
  183.9 µs/apply at the bench BSR shape); costs ~3x MXU throughput only
  on compute-bound matmat shapes, where correctness-by-default wins.

CPU/GPU backends ignore or honor the flag appropriately (f32 is native
there), so the policy is a TPU correctness fix with no effect elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["matmul_precision", "pdot", "pmatmul", "pvdot", "pcolumn_dot"]


def matmul_precision(*dtypes):
    """The library-wide precision for a contraction over ``dtypes``."""
    if any(jnp.dtype(d) == jnp.bfloat16 for d in dtypes):
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def pdot(a, b, **kw):
    """``jnp.dot`` under the storage-follows-precision policy."""
    return jnp.dot(a, b, precision=matmul_precision(a.dtype, b.dtype), **kw)


def pmatmul(a, b, **kw):
    """``a @ b`` under the storage-follows-precision policy."""
    return jnp.matmul(a, b, precision=matmul_precision(a.dtype, b.dtype), **kw)


def pvdot(a, b, **kw):
    """``jnp.vdot`` under the storage-follows-precision policy."""
    return jnp.vdot(a, b, precision=matmul_precision(a.dtype, b.dtype), **kw)


def pcolumn_dot(U, V):
    """Per-column ``<u_j, v_j>`` of two (n, k) blocks under the policy.

    A plain ``sum(conj(U) * V, axis=0)`` can be rewritten by XLA into an
    MXU contraction at DEFAULT precision (bf16-truncating for f32), which
    the precision-sensitive multi-RHS Krylov recurrences must not absorb."""
    return jnp.einsum(
        "ij,ij->j", jnp.conj(U), V,
        precision=matmul_precision(U.dtype, V.dtype),
    )
