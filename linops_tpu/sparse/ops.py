"""Sparse linear operators over COO / CSR / BSR device storage.

The reference has no sparse kernels of its own — it wraps
``SparseMatrixCSC`` mul! in closures (reference: src/constructors.jl:25-27,
test/test_linop.jl uses sparse wrappers throughout). Here the operator owns
the format (SURVEY.md §2.3):

- COO/CSR apply = gather + ``jax.ops.segment_sum`` — a single fused XLA
  computation; ``indices_are_sorted`` is exploited for CSR (row-major
  build order).
- BSR apply = one batched dense contraction over (bm, bn) blocks — MXU
  work with block-level indexing only; zero pad-blocks contribute nothing.

Adjoint/transpose products reuse the same storage with roles of
rows/cols swapped (no transposed copy is materialized); hermitian applies
conjugate values on the fly, mirroring the reference's conj-trick lattice
(reference: src/adjtrans.jl:90-137).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import LinearOperator, register_operator
from .formats import (
    BSR,
    COO,
    CSR,
    bsr_from_dense,
    coo_from_dense,
    csr_from_dense,
    csr_from_parts,
)

__all__ = [
    "COOOperator",
    "CSROperator",
    "BSROperator",
    "opSparse",
]


def _conj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


# ----------------------------------------------------------------------------
# Pure apply kernels
# ----------------------------------------------------------------------------


def coo_matvec(vals, rows, cols, nrow, x, sorted_rows=False):
    """y[r] = Σ vals[k]·x[cols[k]] over k with rows[k]=r."""
    return jax.ops.segment_sum(
        vals * x[cols], rows, num_segments=nrow, indices_are_sorted=sorted_rows
    )


def coo_matmat(vals, rows, cols, nrow, X, sorted_rows=False):
    return jax.ops.segment_sum(
        vals[:, None] * X[cols], rows, num_segments=nrow, indices_are_sorted=sorted_rows
    )


def bsr_matvec(blocks, block_cols, x_padded_blocks):
    """y-blocks = Σ_k blocks[r,k] @ x_blocks[block_cols[r,k]] — one batched
    contraction (nbrow·kmax small matvecs fused by XLA onto the MXU)."""
    xg = x_padded_blocks[block_cols]  # (nbrow, kmax, bn)
    return jnp.einsum(
        "rkmn,rkn->rm", blocks, xg, preferred_element_type=blocks.dtype
    )


def bsr_matmat(blocks, block_cols, X_blocks):
    """Multi-RHS SpMM: Y-blocks (nbrow, bm, k) = Σ blocks[r,j] @ X[cols[r,j]]
    — one batched MXU contraction (the multi-RHS amortizes each block read
    over k columns)."""
    Xg = X_blocks[block_cols]  # (nbrow, kmax, bn, k)
    return jnp.einsum(
        "rkmn,rknc->rmc", blocks, Xg, preferred_element_type=blocks.dtype
    )


def bsr_rmatvec(blocks, block_cols, u_blocks, nbcol):
    """Transpose apply: scatter blockᵀ·u contributions to column blocks."""
    contrib = jnp.einsum(
        "rkmn,rm->rkn", blocks, u_blocks, preferred_element_type=blocks.dtype
    )  # (nbrow, kmax, bn)
    kflat = contrib.reshape(-1, contrib.shape[-1])
    ids = block_cols.reshape(-1)
    return jax.ops.segment_sum(kflat, ids, num_segments=nbcol)


# ----------------------------------------------------------------------------
# Operator classes
# ----------------------------------------------------------------------------


class _SparseBase(LinearOperator):
    _fields_children = ("data",)
    _fields_aux = ("_symmetric", "_hermitian")
    _sorted_rows = False  # CSR: row ids are sorted (faster segment_sum)

    def __init__(self, data, symmetric: bool = False, hermitian: bool = False):
        super().__init__()
        self.data = data
        self._symmetric = bool(symmetric)
        self._hermitian = bool(hermitian)

    @property
    def nrow(self):
        return self.data.shape[0]

    @property
    def ncol(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.vals.dtype if hasattr(self.data, "vals") else self.data.blocks.dtype

    @property
    def symmetric(self):
        return self._symmetric

    @property
    def hermitian(self):
        return self._hermitian

    @property
    def nnz(self):
        return self.data.nnz


class _IndexedSparse(_SparseBase):
    """Shared applies for COO/CSR (gather + segment_sum); subclasses differ
    only in whether row ids are sorted."""

    def _prod(self, v):
        d = self.data
        return coo_matvec(d.vals, d.rows, d.cols, d.shape[0], v,
                          sorted_rows=self._sorted_rows)

    def _tprod(self, u):
        d = self.data
        return coo_matvec(d.vals, d.cols, d.rows, d.shape[1], u)

    def _ctprod(self, w):
        d = self.data
        return coo_matvec(_conj(d.vals), d.cols, d.rows, d.shape[1], w)

    def apply_matrix(self, M, mode: str = "N"):
        d = self.data
        if mode == "N":
            return coo_matmat(d.vals, d.rows, d.cols, d.shape[0], M,
                              sorted_rows=self._sorted_rows)
        if mode == "C":
            # conj(A) @ M = conj(A @ conj(M)); conjugate the output, not
            # the values as well (that would cancel back to A @ M)
            out = coo_matmat(d.vals, d.rows, d.cols, d.shape[0], _conj(M),
                             sorted_rows=self._sorted_rows)
            return _conj(out)
        vals = d.vals if mode == "T" else _conj(d.vals)
        return coo_matmat(vals, d.cols, d.rows, d.shape[1], M)


class COOOperator(_IndexedSparse):
    """Sparse operator over COO storage."""

    _sorted_rows = False


class CSROperator(_IndexedSparse):
    """Sparse operator over CSR storage (sorted row ids → faster
    segment_sum on the forward apply)."""

    _sorted_rows = True


class BSROperator(_SparseBase):
    """Block-sparse-row operator — the TPU-native format: apply is a batched
    dense block contraction (MXU), indexing is per 8×128 (or larger) block.

    ``backend="pallas"`` uses the fused VMEM-gather kernel for the forward
    apply (kernels/bsr_spmv.py) — requires TPU, x small enough for VMEM, and
    pads nbrow to a multiple of 8; other modes and oversize inputs fall back
    to the XLA path.
    """

    _fields_children = ("data", "_mfirst")
    _fields_aux = ("_symmetric", "_hermitian", "_backend")

    def __init__(self, data, symmetric: bool = False, hermitian: bool = False,
                 backend: str = "xla"):
        super().__init__(data, symmetric, hermitian)
        self._backend = backend
        if backend == "pallas":
            from ..kernels.bsr_spmv import to_mfirst, BSR_PALLAS_ROWS_PER_PROGRAM

            R = BSR_PALLAS_ROWS_PER_PROGRAM
            blocks, cols = data.blocks, data.block_cols
            pad = (-blocks.shape[0]) % R
            if pad:
                blocks = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
                cols = jnp.pad(cols, ((0, pad), (0, 0)))
                self.data = BSR(blocks=blocks, block_cols=cols, shape=data.shape)
            self._mfirst = to_mfirst(self.data.blocks)
        else:
            self._mfirst = None

    def _pad_in(self, v, dim_blocks, bsize):
        need = dim_blocks * bsize
        if v.shape[0] < need:
            v = jnp.pad(v, (0, need - v.shape[0]))
        return v

    def _prod(self, v):
        d = self.data
        bm, bn = d.block_shape
        nbrow = d.blocks.shape[0]
        nbcol = -(-d.shape[1] // bn)
        xb = self._pad_in(v, nbcol, bn).reshape(nbcol, bn)
        # pallas kernel needs x fully VMEM-resident; larger inputs fall back
        # to the XLA path (docstring contract)
        if self._mfirst is not None and xb.size <= 2_000_000:
            from ..kernels.bsr_spmv import bsr_matvec_pallas

            y = bsr_matvec_pallas(self._mfirst, d.block_cols, xb).reshape(nbrow * bm)
        else:
            y = bsr_matvec(d.blocks, d.block_cols, xb).reshape(nbrow * bm)
        return y[: d.shape[0]]

    def _tprod(self, u):
        d = self.data
        bm, bn = d.block_shape
        nbrow = d.blocks.shape[0]
        nbcol = -(-d.shape[1] // bn)
        ub = self._pad_in(u, nbrow, bm).reshape(nbrow, bm)
        x = bsr_rmatvec(d.blocks, d.block_cols, ub, nbcol).reshape(nbcol * bn)
        return x[: d.shape[1]]

    def _ctprod(self, w):
        d = self.data
        if not jnp.iscomplexobj(d.blocks):
            return self._tprod(w)
        bm, bn = d.block_shape
        nbrow = d.blocks.shape[0]
        nbcol = -(-d.shape[1] // bn)
        wb = self._pad_in(w, nbrow, bm).reshape(nbrow, bm)
        x = bsr_rmatvec(jnp.conj(d.blocks), d.block_cols, wb, nbcol).reshape(nbcol * bn)
        return x[: d.shape[1]]

    def apply_matrix(self, M, mode: str = "N"):
        if mode != "N":
            return super().apply_matrix(M, mode)
        d = self.data
        bm, bn = d.block_shape
        nbrow = d.blocks.shape[0]
        nbcol = -(-d.shape[1] // bn)
        k = M.shape[1]
        need = nbcol * bn
        if M.shape[0] < need:
            M = jnp.pad(M, ((0, need - M.shape[0]), (0, 0)))
        Xb = M.reshape(nbcol, bn, k)
        Y = bsr_matmat(d.blocks, d.block_cols, Xb).reshape(nbrow * bm, k)
        return Y[: d.shape[0]]


for _cls in (COOOperator, CSROperator, BSROperator):
    register_operator(_cls)


# ----------------------------------------------------------------------------
# Factory
# ----------------------------------------------------------------------------


# largest tile first: on equal stored bytes the bigger tile streams faster
_BSR_AUTO_CANDIDATES = ((128, 128), (32, 128), (8, 128))


def _auto_block_shape(sp) -> Tuple[int, int]:
    """Pick the BSR block shape minimizing stored (padded) bytes, using the
    native block counter when available. Larger tiles run closer to the MXU
    streaming rate but cost fill-in on scattered patterns; stored bytes is
    the bandwidth-roofline proxy for apply time."""
    try:
        from ..native import _load

        lib = _load()
    except Exception:
        lib = None
    if lib is None:
        return (8, 128)
    cols = np.ascontiguousarray(sp.indices, np.int32)
    indptr = np.ascontiguousarray(sp.indptr, np.int32)
    nrow = sp.shape[0]
    best, best_bytes = (8, 128), None
    for bm, bn in _BSR_AUTO_CANDIDATES:
        nbrow = -(-nrow // bm)
        counts = np.zeros(nbrow, np.int32)
        kmax = max(int(lib.bsr_count(cols, indptr, nrow, bm, bn, counts)), 1)
        stored = nbrow * kmax * bm * bn  # uniform-kmax padded layout
        if best_bytes is None or stored < best_bytes:
            best, best_bytes = (bm, bn), stored
    return best


def opSparse(
    A,
    format: str = "csr",
    block_shape: Union[Tuple[int, int], str] = (8, 128),
    symmetric: bool = False,
    hermitian: bool = False,
    tol: float = 0.0,
    backend: str = "xla",
) -> _SparseBase:
    """Build a sparse operator from a dense array, a scipy sparse matrix, or
    a prebuilt COO/CSR/BSR pytree. ``format`` in {'coo', 'csr', 'bsr'};
    ``block_shape="auto"`` picks the BSR tile minimizing stored bytes."""
    if isinstance(A, COO):
        return COOOperator(A, symmetric, hermitian)
    if isinstance(A, CSR):
        return CSROperator(A, symmetric, hermitian)
    if isinstance(A, BSR):
        return BSROperator(A, symmetric, hermitian, backend=backend)

    # scipy sparse?
    if hasattr(A, "tocsr"):
        sp = A.tocsr()
        if format == "csr":
            data = csr_from_parts(sp.data, sp.indices, sp.indptr, sp.shape)
            return CSROperator(data, symmetric, hermitian)
        if format == "coo":
            from .formats import check_int32_range

            sc = sp.tocoo()
            check_int32_range(sc.shape, sc.nnz)
            data = COO(
                vals=jnp.asarray(sc.data),
                rows=jnp.asarray(sc.row, jnp.int32),
                cols=jnp.asarray(sc.col, jnp.int32),
                shape=tuple(sc.shape),
            )
            return COOOperator(data, symmetric, hermitian)
        if format == "bsr":
            # native packer: no dense materialization (falls back below)
            try:
                from ..native import bsr_pack_csr

                if block_shape == "auto":
                    block_shape = _auto_block_shape(sp)

                blocks, bcols = bsr_pack_csr(
                    sp.data, sp.indices, sp.indptr, sp.shape[0], sp.shape[1],
                    block_shape, pad_rows_to=8,
                )
                import jax.numpy as _jnp

                return BSROperator(
                    BSR(_jnp.asarray(blocks), _jnp.asarray(bcols), tuple(sp.shape)),
                    symmetric,
                    hermitian,
                    backend=backend,
                )
            except Exception:
                pass
        A = sp.toarray()

    A = np.asarray(A)
    if format == "coo":
        return COOOperator(coo_from_dense(A, tol), symmetric, hermitian)
    if format == "csr":
        return CSROperator(csr_from_dense(A, tol), symmetric, hermitian)
    if format == "bsr":
        if block_shape == "auto":
            try:
                import scipy.sparse as sps

                return opSparse(
                    sps.csr_matrix(A), format="bsr", block_shape="auto",
                    symmetric=symmetric, hermitian=hermitian, backend=backend,
                )
            except ImportError:
                block_shape = (8, 128)
        return BSROperator(bsr_from_dense(A, block_shape, tol), symmetric, hermitian, backend=backend)
    raise ValueError(f"unknown sparse format {format!r}")
