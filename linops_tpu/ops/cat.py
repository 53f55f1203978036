"""Horizontal / vertical / block-diagonal concatenation of operators.

Reference: src/cat.jl (hcat splits the input vector by column offsets and
accumulates; vcat writes disjoint output slices; transpose modes swap roles)
and src/special-operators.jl:235-294 (BlockDiagonalOperator). These are n-ary
nodes here — the whole concatenation lowers into one fused computation rather
than a pairwise closure fold.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..core.base import LinearOperator, LinearOperatorException, register_operator
from ..core.dense import aslinearoperator

__all__ = ["HCatOperator", "VCatOperator", "BlockDiagonalOperator", "hcat", "vcat", "hvcat"]


def _offsets(sizes: Sequence[int]) -> Tuple[int, ...]:
    out = [0]
    for s in sizes:
        out.append(out[-1] + s)
    return tuple(out)


class HCatOperator(LinearOperator):
    """``[A B ...]``: forward apply splits v and accumulates; transpose apply
    stacks child transposes (reference: src/cat.jl:7-51). Flags false,false."""

    _fields_children = ("ops",)
    _fields_aux = ()

    def __init__(self, ops: Sequence[LinearOperator]):
        super().__init__()
        ops = tuple(aslinearoperator(o) for o in ops)
        if not ops:
            raise LinearOperatorException("hcat of zero operators")
        m = ops[0].nrow
        for o in ops:
            if o.nrow != m:
                raise LinearOperatorException("hcat: inconsistent row sizes")
        self.ops = ops

    @property
    def nrow(self):
        return self.ops[0].nrow

    @property
    def ncol(self):
        return sum(o.ncol for o in self.ops)

    @property
    def dtype(self):
        return jnp.result_type(*[o.dtype for o in self.ops])

    def apply(self, v, mode: str = "N"):
        offs = _offsets([o.ncol for o in self.ops])
        if mode in ("N", "C"):
            parts = [o.apply(v[offs[i] : offs[i + 1]], mode) for i, o in enumerate(self.ops)]
            y = parts[0]
            for p in parts[1:]:
                y = y + p
            return y
        return jnp.concatenate([o.apply(v, mode) for o in self.ops])

    def apply_matrix(self, M, mode: str = "N"):
        offs = _offsets([o.ncol for o in self.ops])
        if mode in ("N", "C"):
            parts = [o.apply_matrix(M[offs[i] : offs[i + 1], :], mode) for i, o in enumerate(self.ops)]
            Y = parts[0]
            for p in parts[1:]:
                Y = Y + p
            return Y
        return jnp.concatenate([o.apply_matrix(M, mode) for o in self.ops], axis=0)

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        for o in self.ops:
            o.bump(mode, n)

    def _name(self):
        return "Horizontal concatenation"


register_operator(HCatOperator)


class VCatOperator(LinearOperator):
    """``[A; B; ...]`` (reference: src/cat.jl:65-109). Flags false,false."""

    _fields_children = ("ops",)
    _fields_aux = ()

    def __init__(self, ops: Sequence[LinearOperator]):
        super().__init__()
        ops = tuple(aslinearoperator(o) for o in ops)
        if not ops:
            raise LinearOperatorException("vcat of zero operators")
        n = ops[0].ncol
        for o in ops:
            if o.ncol != n:
                raise LinearOperatorException("vcat: inconsistent column sizes")
        self.ops = ops

    @property
    def nrow(self):
        return sum(o.nrow for o in self.ops)

    @property
    def ncol(self):
        return self.ops[0].ncol

    @property
    def dtype(self):
        return jnp.result_type(*[o.dtype for o in self.ops])

    def apply(self, v, mode: str = "N"):
        offs = _offsets([o.nrow for o in self.ops])
        if mode in ("N", "C"):
            return jnp.concatenate([o.apply(v, mode) for o in self.ops])
        parts = [o.apply(v[offs[i] : offs[i + 1]], mode) for i, o in enumerate(self.ops)]
        y = parts[0]
        for p in parts[1:]:
            y = y + p
        return y

    def apply_matrix(self, M, mode: str = "N"):
        offs = _offsets([o.nrow for o in self.ops])
        if mode in ("N", "C"):
            return jnp.concatenate([o.apply_matrix(M, mode) for o in self.ops], axis=0)
        parts = [o.apply_matrix(M[offs[i] : offs[i + 1], :], mode) for i, o in enumerate(self.ops)]
        Y = parts[0]
        for p in parts[1:]:
            Y = Y + p
        return Y

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        for o in self.ops:
            o.bump(mode, n)

    def _name(self):
        return "Vertical concatenation"


register_operator(VCatOperator)


class BlockDiagonalOperator(LinearOperator):
    """diag(M1, ..., Mn); flags are ANDs over blocks
    (reference: src/special-operators.jl:249-294)."""

    _fields_children = ("ops",)
    _fields_aux = ()

    def __init__(self, *ops):
        super().__init__()
        if len(ops) == 1 and isinstance(ops[0], (list, tuple)):
            ops = tuple(ops[0])
        ops = tuple(aslinearoperator(o) for o in ops)
        if not ops:
            raise LinearOperatorException("block-diagonal of zero operators")
        self.ops = ops

    @property
    def nrow(self):
        return sum(o.nrow for o in self.ops)

    @property
    def ncol(self):
        return sum(o.ncol for o in self.ops)

    @property
    def dtype(self):
        return jnp.result_type(*[o.dtype for o in self.ops])

    @property
    def symmetric(self):
        return all(o.symmetric for o in self.ops)

    @property
    def hermitian(self):
        return all(o.hermitian for o in self.ops)

    def _resolve(self, mode):
        if mode == "T" and self.symmetric:
            return "N"
        if mode == "H" and self.hermitian:
            return "N"
        return mode

    def apply(self, v, mode: str = "N"):
        mode = self._resolve(mode)
        transposed = mode in ("T", "H")
        in_sizes = [o.nrow if transposed else o.ncol for o in self.ops]
        offs = _offsets(in_sizes)
        return jnp.concatenate(
            [o.apply(v[offs[i] : offs[i + 1]], mode) for i, o in enumerate(self.ops)]
        )

    def apply_matrix(self, M, mode: str = "N"):
        mode = self._resolve(mode)
        transposed = mode in ("T", "H")
        in_sizes = [o.nrow if transposed else o.ncol for o in self.ops]
        offs = _offsets(in_sizes)
        return jnp.concatenate(
            [o.apply_matrix(M[offs[i] : offs[i + 1], :], mode) for i, o in enumerate(self.ops)],
            axis=0,
        )

    def _has_tprod(self):
        return True

    def _has_ctprod(self):
        return True

    def _bump_children(self, mode: str, n: int = 1):
        mode = self._resolve(mode)
        for o in self.ops:
            o.bump(mode, n)

    def _name(self):
        return "Block-diagonal operator"


register_operator(BlockDiagonalOperator)


def hcat(*ops) -> LinearOperator:
    if len(ops) == 1 and isinstance(ops[0], (list, tuple)):
        ops = tuple(ops[0])
    return HCatOperator(ops)


def vcat(*ops) -> LinearOperator:
    if len(ops) == 1 and isinstance(ops[0], (list, tuple)):
        ops = tuple(ops[0])
    return VCatOperator(ops)


def hvcat(rows: Sequence[int], *ops) -> LinearOperator:
    """Block matrix from a flat list of operators with ``rows[i]`` blocks per
    row (reference: src/cat.jl:120-129). Also accepts the nested-list form
    ``hvcat([[A, B], [C, D]])``."""
    if not ops and rows and isinstance(rows[0], (list, tuple)):
        return vcat(*[hcat(*row) for row in rows])
    if sum(rows) != len(ops):
        raise LinearOperatorException(
            f"hvcat: rows {tuple(rows)} sum to {sum(rows)} but {len(ops)} "
            "operators were given"
        )
    out_rows = []
    a = 0
    for r in rows:
        out_rows.append(hcat(*ops[a : a + r]))
        a += r
    return vcat(*out_rows)
