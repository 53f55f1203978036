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

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import (LinearOperator, LinearOperatorException,
                         register_operator)
# precision follows storage (HIGHEST for f32+, DEFAULT for bf16 inputs);
# rationale and measurements: core/precision.py and docs/performance.md
from ..core.precision import matmul_precision
from .formats import (
    BSR,
    COO,
    CSR,
    ELL,
    bsr_from_dense,
    coo_from_dense,
    csr_from_dense,
    csr_from_parts,
    ell_from_csr_parts,
    ell_from_dense,
)

__all__ = [
    "COOOperator",
    "CSROperator",
    "RoutedCSROperator",
    "BSROperator",
    "ELLOperator",
    "opSparse",
]


def _conj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


def _on_tpu() -> bool:  # patchable seam for tests
    return jax.default_backend() == "tpu"


# ----------------------------------------------------------------------------
# Pure apply kernels
# ----------------------------------------------------------------------------


# A single gather+segment_sum over ≥16M nnz reproducibly CRASHES the TPU
# worker (measured on v5e through the relay; sometimes less under HBM
# pressure) — the whole process is then dead, every later call fails
# UNAVAILABLE. Above this bound the apply is chunked over the nnz axis
# (static slices under one lax.scan), which bounds the gather/scatter
# transients to one chunk while leaving small operators on the original
# single fused computation.
CSR_CHUNK_NNZ = 8_000_000


def _chunked_segments(vals, rows, cols, nrow, chunk=CSR_CHUNK_NNZ):
    """Pad + reshape the nnz axis to (nchunk, chunk). Padding rows point at
    segment id ``nrow``, which jit-mode scatter-add DROPS (jax
    FILL_OR_DROP), so padding contributes exactly nothing."""
    nnz = vals.shape[0]
    nchunk = -(-nnz // chunk)
    pad = nchunk * chunk - nnz
    if pad:
        vals = jnp.pad(vals, (0, pad))
        cols = jnp.pad(cols, (0, pad))
        rows = jnp.pad(rows, (0, pad), constant_values=nrow)
    shape = (nchunk, chunk)
    return vals.reshape(shape), rows.reshape(shape), cols.reshape(shape)


def coo_matvec(vals, rows, cols, nrow, x, sorted_rows=False):
    """y[r] = Σ vals[k]·x[cols[k]] over k with rows[k]=r."""
    if vals.shape[0] <= CSR_CHUNK_NNZ:
        return jax.ops.segment_sum(
            vals * x[cols], rows, num_segments=nrow, indices_are_sorted=sorted_rows
        )
    vc, rc, cc = _chunked_segments(vals, rows, cols, nrow)

    def body(acc, args):
        v, r, c = args
        return acc + jax.ops.segment_sum(
            v * x[c], r, num_segments=nrow, indices_are_sorted=sorted_rows
        ), None

    y0 = jnp.zeros(nrow, jnp.result_type(vals.dtype, x.dtype))
    y, _ = jax.lax.scan(body, y0, (vc, rc, cc))
    return y


def coo_matmat(vals, rows, cols, nrow, X, sorted_rows=False):
    # the gather/scatter transient is nnz * k ELEMENTS — chunk by that, not
    # by nnz alone (the >=16M-element TPU-worker crash bound is on elements).
    # The floor must NOT override the element cap: at k >= 8192 a 2048-row
    # floor would put each segment_sum transient at chunk*k >= 16.8M
    # elements, at the crash bound — so the floor is a small constant and
    # chunk*k never exceeds CSR_CHUNK_NNZ for any k <= CSR_CHUNK_NNZ/256
    k = max(int(X.shape[1]), 1)
    chunk = max(CSR_CHUNK_NNZ // k, 256)
    if vals.shape[0] <= chunk:
        return jax.ops.segment_sum(
            vals[:, None] * X[cols], rows, num_segments=nrow,
            indices_are_sorted=sorted_rows,
        )
    vc, rc, cc = _chunked_segments(vals, rows, cols, nrow, chunk)

    def body(acc, args):
        v, r, c = args
        return acc + jax.ops.segment_sum(
            v[:, None] * X[c], r, num_segments=nrow,
            indices_are_sorted=sorted_rows,
        ), None

    y0 = jnp.zeros((nrow, X.shape[1]), jnp.result_type(vals.dtype, X.dtype))
    y, _ = jax.lax.scan(body, y0, (vc, rc, cc))
    return y


def bsr_matvec(blocks, block_cols, x_padded_blocks):
    """y-blocks = Σ_k blocks[r,k] @ x_blocks[block_cols[r,k]] — one batched
    contraction (nbrow·kmax small matvecs fused by XLA onto the MXU)."""
    xg = x_padded_blocks[block_cols]  # (nbrow, kmax, bn)
    return jnp.einsum(
        "rkmn,rkn->rm", blocks, xg,
        precision=matmul_precision(blocks.dtype, xg.dtype),
        preferred_element_type=jnp.result_type(blocks.dtype, xg.dtype),
    )


def bsr_matmat(blocks, block_cols, X_blocks):
    """Multi-RHS SpMM: Y-blocks (nbrow, bm, k) = Σ blocks[r,j] @ X[cols[r,j]]
    — one batched MXU contraction (the multi-RHS amortizes each block read
    over k columns)."""
    Xg = X_blocks[block_cols]  # (nbrow, kmax, bn, k)
    return jnp.einsum(
        "rkmn,rknc->rmc", blocks, Xg,
        precision=matmul_precision(blocks.dtype, Xg.dtype),
        preferred_element_type=jnp.result_type(blocks.dtype, Xg.dtype),
    )


def bsr_rmatvec(blocks, block_cols, u_blocks, nbcol):
    """Transpose apply: scatter blockᵀ·u contributions to column blocks."""
    contrib = jnp.einsum(
        "rkmn,rm->rkn", blocks, u_blocks,
        precision=matmul_precision(blocks.dtype, u_blocks.dtype),
        preferred_element_type=jnp.result_type(blocks.dtype, u_blocks.dtype),
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

    def apply(self, v, mode: str = "N"):
        # Sparse applies gather (clamping out-of-range indices) or pad to
        # block multiples, so a wrong-length vector would be ACCEPTED
        # silently — validate the true dims up front (dense operators fail
        # loudly via dot shape checks; reference contract:
        # /root/reference/src/operations.jl:9-12).
        if getattr(v, "ndim", 1) != 1 or v.shape[0] != self.in_dim(mode):
            raise LinearOperatorException("shape mismatch")
        return super().apply(v, mode)

    def _check_mat(self, M, mode: str):
        # Same clamping-gather hazard as apply, for the matrix path.
        if getattr(M, "ndim", 2) != 2 or M.shape[0] != self.in_dim(mode):
            raise LinearOperatorException("shape mismatch")

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
        self._check_mat(M, mode)
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


class ELLOperator(_SparseBase):
    """ELLPACK operator: forward apply is gather + per-row sum — NO scatter
    (``(vals · x[cols]).sum(1)``), which measures ~2× the segment-sum CSR
    path on TPU for unstructured patterns. Both remain gather-bound
    (~0.1 Gnnz/s on v5e — fine-grained random access is ~3 orders below
    the streaming roofline), so this format is CORRECTNESS-ONLY on TPU:
    for production throughput use ``format="routed"`` (the Clos-routed
    lane-gather pipeline, 6.7 Gnnz/s measured — conceptually the same
    row-slot layout with the gather replaced by a routing network) or
    ``format="bsr"`` when block structure exists. Transpose still
    scatters (segment_sum over the column ids)."""

    def _prod(self, v):
        d = self.data
        return jnp.sum(d.vals * v[d.cols], axis=1)

    def _tprod_vals(self, vals, u):
        d = self.data
        contrib = (vals * u[:, None]).reshape(-1)
        return jax.ops.segment_sum(
            contrib, d.cols.reshape(-1), num_segments=d.shape[1]
        )

    def _tprod(self, u):
        return self._tprod_vals(self.data.vals, u)

    def _ctprod(self, w):
        return self._tprod_vals(_conj(self.data.vals), w)

    def apply_matrix(self, M, mode: str = "N"):
        self._check_mat(M, mode)
        d = self.data
        if mode == "N":
            return jnp.sum(d.vals[:, :, None] * M[d.cols], axis=1)
        if mode == "C":
            return _conj(
                jnp.sum(d.vals[:, :, None] * _conj(M)[d.cols], axis=1)
            )
        vals = d.vals if mode == "T" else _conj(d.vals)
        contrib = (vals[:, :, None] * M[:, None, :]).reshape(-1, M.shape[1])
        return jax.ops.segment_sum(
            contrib, d.cols.reshape(-1), num_segments=d.shape[1]
        )


class RoutedCSROperator(CSROperator):
    """CSR operator whose matvec runs through the Clos-routed lane-gather
    pipeline (sparse/routed.py) instead of gather+segment_sum — the TPU
    path for genuinely unstructured patterns (measured ~3 orders above the
    XLA gather path on v5e; see docs/performance.md).

    Storage: the plain CSR pytree (matrix RHS, densification and the f64
    CPU reference path reuse it) plus the packed forward routing program.
    The transpose program is DERIVED from the forward pack at construction
    (sparse/routed.py::RoutedTranspose — the inverse network, no second
    router run, ~0.1× the forward pack cost), so ``op.T`` works at full
    speed immediately, including inside jit (reference contract:
    src/adjtrans.jl:32-44 — wrappers always work). ``backend="xla"``
    forces the inherited gather+segment_sum applies (A/B tests).

    When the derived program is unavailable (ReducePass-fallback combine
    layouts, extreme column skew) or ``defer_transpose=True``, the
    transpose falls back to a lazy full CSC re-pack at HOST dispatch
    (``bump``); code that first reaches a T/H apply only INSIDE its own
    jit then sees the slow CSR fallback for that trace and a one-time
    warning naming the fix (``op._ensure_transpose()``).
    """

    _fields_children = ("data", "routed", "routed_t")
    _fields_aux = ("_symmetric", "_hermitian", "_backend", "_w", "_defer_t")

    def __init__(self, data, symmetric=False, hermitian=False,
                 routed=None, routed_t=None, w="auto", backend="auto",
                 defer_transpose=False, host_parts=None):
        super().__init__(data, symmetric, hermitian)
        if backend not in ("auto", "routed", "xla"):
            raise ValueError(f"unknown routed backend {backend!r}")
        self._backend = backend
        self._w = w
        self._defer_t = bool(defer_transpose)
        self.routed = routed
        self.routed_t = routed_t
        # ``host_parts`` = (vals, cols, indptr) as HOST arrays: packing
        # needs host data, and fetching the just-uploaded device copies
        # back is a pure round trip (through the relay it has measured
        # anywhere from 5 to 500+ s at 1M nnz — the link's device->host
        # path is erratic; opSparse passes the scipy arrays through).
        # Transient: dropped after construction, not part of the pytree.
        self._host_parts = host_parts
        try:
            if routed is None and backend != "xla":
                want_t = (routed_t is None and not defer_transpose
                          and not (symmetric or hermitian))
                packed = self._pack(transpose=False, with_transpose=want_t)
                if want_t:
                    self.routed, derived = packed
                    if derived is not None:
                        self.routed_t = derived
                else:
                    self.routed = packed
        finally:
            self._host_parts = None

    def _host_csr(self):
        hp = getattr(self, "_host_parts", None)
        if hp is not None:
            v, c, i = hp
            return np.asarray(v), np.asarray(c), np.asarray(i)
        d = self.data
        # one batched fetch (single transfer) instead of three np.asarray
        return jax.device_get((d.vals, d.cols, d.indptr))

    def _pack(self, transpose: bool, with_transpose: bool = False):
        from .routed import pack_routed_csr

        d = self.data
        vals, cols, indptr = self._host_csr()
        if not transpose:
            return pack_routed_csr(
                vals, cols, indptr, d.shape, w=self._w,
                with_transpose=with_transpose)
        # transpose pack: re-sort by (col, row) — a stable CSC build
        # (row ids derived from indptr host-side; d.rows stays on device)
        rows = cols
        cols = np.repeat(np.arange(d.shape[0], dtype=np.int64),
                         np.diff(indptr))
        shp = (d.shape[1], d.shape[0])
        order = np.argsort(rows, kind="stable")
        indptr = np.zeros(shp[0] + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=shp[0]), out=indptr[1:])
        return pack_routed_csr(vals[order], cols[order], indptr, shp, w=self._w)

    def _use_routed(self):
        return self._backend != "xla"

    def _ensure_transpose(self):
        if self.routed_t is None and self._use_routed():
            if isinstance(self.data.vals, jax.core.Tracer):
                # tracer guard: a traced reconstruction of this operator can
                # reach bump/apply inside someone's jit — packing needs
                # concrete arrays, so that trace keeps the CSR fallback
                import warnings

                warnings.warn(
                    "RoutedCSROperator transpose apply reached inside a jit "
                    "trace before any transpose program existed — this "
                    "trace uses the ~100× slower CSR fallback. Construct "
                    "the operator with defer_transpose=False (default) or "
                    "call op._ensure_transpose() before jitting.",
                    stacklevel=3)
                return
            self.routed_t = self._pack(transpose=True)

    def bump(self, mode: str, n: int = 1):
        # the transpose routing program must exist BEFORE jit dispatch
        # (packing is host-side; a None->pytree swap changes the operator's
        # structure, so it cannot happen at trace time). ``bump`` is the
        # host-side pre-dispatch walk that reaches every node with its
        # effective mode (wrappers/composites cross-map, core/adjoint.py).
        if mode in ("T", "H") and not (self._symmetric or self._hermitian):
            # mode "C" is served by the FORWARD program (conj∘prod∘conj)
            self._ensure_transpose()
        super().bump(mode, n)

    def _prod(self, v):
        if not self._use_routed() or self.routed is None:
            return super()._prod(v)
        from .routed import routed_matvec

        return routed_matvec(self.routed, v)

    def _tprod_routed(self, u, conj_vals):
        if not self._use_routed() or self.routed_t is None:
            if (self._use_routed()
                    and isinstance(self.data.vals, jax.core.Tracer)
                    and not (self._symmetric or self._hermitian)):
                # in-jit T/H apply with no transpose program: this trace
                # gets the slow CSR fallback — tell the user how to fix it
                import warnings

                warnings.warn(
                    "RoutedCSROperator transpose apply traced with no "
                    "transpose program — this jit uses the ~100× slower "
                    "CSR fallback. Construct with defer_transpose=False "
                    "(default) or call op._ensure_transpose() before "
                    "jitting.", stacklevel=3)
            return super()._ctprod(u) if conj_vals else super()._tprod(u)
        from .routed import RoutedTranspose, routed_matvec, routed_rmatvec

        rt = self.routed_t
        if isinstance(rt, RoutedTranspose):
            if conj_vals and jnp.iscomplexobj(rt.vals_pre):
                rt = rt._replace(vals_pre=jnp.conj(rt.vals_pre))
            return routed_rmatvec(rt, u)
        if conj_vals and jnp.iscomplexobj(rt.vals):
            rt = rt._replace(vals=jnp.conj(rt.vals))
        return routed_matvec(rt, u)

    def _tprod(self, u):
        return self._tprod_routed(u, conj_vals=False)

    def _ctprod(self, w):
        return self._tprod_routed(w, conj_vals=True)

    def _matrix_prog(self, mode: str):
        """(prog, conj_vals, conj_io) for a matrix apply in ``mode`` —
        symmetric/hermitian operators serve T/H with the FORWARD program
        (bump never packs routed_t for them)."""
        return {
            "N": (self.routed, False, False),
            "C": (self.routed, False, True),
            "T": ((self.routed, False, False) if self._symmetric
                  else (self.routed_t, False, False)),
            "H": ((self.routed, False, False) if self._hermitian
                  else (self.routed_t, True, False)),
        }[mode]

    def matrix_path(self, mode: str = "N", panel: bool = False) -> str:
        """Which implementation a matrix apply takes on the CURRENT
        backend: ``"routed_panel"`` / ``"routed"`` (the Clos-routed
        rep-grid pipeline) or ``"csr_fallback"`` (gather+segment_sum,
        ~100× slower per column on TPU). Host-side breadcrumb for
        bench/debug — the same conditions the dispatch itself checks."""
        if not (self._use_routed() and _on_tpu()):
            return "csr_fallback"
        if self._matrix_prog(mode)[0] is None:
            return "csr_fallback"
        return "routed_panel" if panel else "routed"

    def _routed_apply_matrix(self, M, mode: str, panel: bool):
        # Shared prog/conj dispatch for apply_matrix / apply_matrix_t.
        # Returns None when the routed path is unavailable (caller falls
        # back to the CSR base paths).
        if not (self._use_routed() and _on_tpu()):
            return None
        from .routed import RoutedTranspose

        prog, conj_vals, conj_io = self._matrix_prog(mode)
        if prog is None:
            return None
        from .routed import routed_matmat, routed_rmatmat

        apply_fn = routed_matmat
        if isinstance(prog, RoutedTranspose):
            apply_fn = routed_rmatmat
            if conj_vals and jnp.iscomplexobj(prog.vals_pre):
                prog = prog._replace(vals_pre=jnp.conj(prog.vals_pre))
        elif conj_vals and jnp.iscomplexobj(prog.vals):
            prog = prog._replace(vals=jnp.conj(prog.vals))
        X = _conj(M) if conj_io else M
        # use_pallas follows the REAL backend (the _on_tpu seam above
        # exists so tests can exercise this branch on CPU). All k columns
        # share ONE routing program (rep-grid kernels) instead of a
        # sequential per-column lax.map.
        up = None if jax.default_backend() == "tpu" else False
        Y = apply_fn(prog, X, use_pallas=up, panel=panel)
        return _conj(Y) if conj_io else Y

    def apply_matrix(self, M, mode: str = "N"):
        # matrix RHS: on TPU, run the routed rep-grid SpMM (one shared
        # routing program across columns) — both this and the inherited
        # gather+segment CSR path scale linearly in k, but the routed
        # path keeps the ~100× per-column advantage. Off-TPU the CSR
        # path wins (vectorized host gather beats a column loop).
        self._check_mat(M, mode)
        Y = self._routed_apply_matrix(M, mode, panel=False)
        return Y if Y is not None else super().apply_matrix(M, mode)

    def apply_matrix_t(self, Mt, mode: str = "N"):
        # Row-panel apply (base.py::apply_matrix_t): (k, n) in, (k, m)
        # out. The routed pipeline is column-outer on BOTH ends, so the
        # panel layout is its NATIVE one — no boundary relayouts. In a
        # closed chain XLA already cancels the dense layout's transpose
        # pair (measured parity at k=8, tools/tpu_r4_batch12.py), but
        # panel-carrying block methods (LOBPCG, multi-RHS Krylov) and
        # open-ended applies skip the relayout structurally rather than
        # relying on that fusion.
        Mt = jnp.asarray(Mt)  # normalize first, matching matmat()
        if Mt.ndim != 2 or Mt.shape[1] != self.in_dim(mode):
            raise LinearOperatorException("shape mismatch")
        Y = self._routed_apply_matrix(Mt, mode, panel=True)
        return Y if Y is not None else super().apply_matrix_t(Mt, mode)


class BSROperator(_SparseBase):
    """Block-sparse-row operator — the TPU-native format: apply is a batched
    dense block contraction (MXU), indexing is per 8×128 (or larger) block.

    Backends (``backend=``):

    - ``"auto"`` (default): on TPU, fine-block (bm < 128) applies route to
      the Pallas VMEM-gather kernels (kernels/bsr_spmv.py) whenever the
      gathered-side vector fits VMEM (≤ ``BSR_PALLAS_MAX_X_ELEMS`` padded
      entries; transpose additionally needs nbcol ≤
      ``BSR_PALLAS_ONEHOT_MAX_NBCOL``) and dtype is f32/bf16. Everything
      else — 128×128 blocks (already at roofline via XLA), oversize x,
      f64/complex, non-TPU — uses the XLA gather+einsum path.
    - ``"pallas"``: force the kernel where structurally possible (runs in
      interpreter mode off-TPU — test use only).
    - ``"pallas_fast"``: like ``"pallas"`` but the forward gather uses the
      2-pass bf16 hi/lo split (~1e-5 relative instead of f32-exact; ~7%
      faster at the bench shape — purely DMA-bound).
    - ``"xla"``: never use the kernel.

    Construction pads nbrow to a multiple of the kernel's rows-per-program
    (zero blocks pointing at block-column 0, which contribute exactly
    nothing); the logical ``shape`` is unchanged.
    """

    _fields_children = ("data", "win_q", "cols_local", "win_q_t",
                        "win_valid_t")
    _fields_aux = ("_symmetric", "_hermitian", "_backend", "_wb",
                   "_x_pad_blocks", "_x_pad_blocks_t", "_win_packed")

    def __init__(self, data, symmetric: bool = False, hermitian: bool = False,
                 backend: str = "auto", win_q=None, cols_local=None,
                 win_q_t=None, win_valid_t=None, _wb=0, _x_pad_blocks=0,
                 _x_pad_blocks_t=0):
        super().__init__(data, symmetric, hermitian)
        if backend not in ("auto", "pallas", "pallas_fast", "xla"):
            raise ValueError(f"unknown BSR backend {backend!r}")
        self._backend = backend
        self.win_q = win_q
        self.cols_local = cols_local
        self.win_q_t = win_q_t
        self.win_valid_t = win_valid_t
        self._wb = _wb
        self._x_pad_blocks = _x_pad_blocks
        self._x_pad_blocks_t = _x_pad_blocks_t
        # packed (bm, R) kernel I/O is lane-legal only when R is
        # 128-divisible or the grid is one step (set during planning)
        self._win_packed = True
        maybe_kernel = backend != "xla" and (
            backend != "auto" or data.block_shape[0] < 128
        )
        if maybe_kernel:
            from ..kernels.bsr_spmv import bsr_pallas_rows_per_program

            R = bsr_pallas_rows_per_program(
                data.block_shape[0],
                data.blocks.shape[1],
                data.block_shape[1],
                jnp.dtype(data.blocks.dtype).itemsize,
            )
            blocks, cols = data.blocks, data.block_cols
            pad = (-blocks.shape[0]) % R
            if pad:
                blocks = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
                cols = jnp.pad(cols, ((0, pad), (0, 0)))
                self.data = BSR(blocks=blocks, block_cols=cols, shape=data.shape)
            # x beyond VMEM residency: plan sliding windows (banded
            # patterns, e.g. after RCM) so the forward apply stays on the
            # Pallas path instead of the 0.70-roofline XLA gather
            if win_q is None and not isinstance(cols, jax.core.Tracer):
                from ..kernels import bsr_spmv as _bk

                bm, bn = self.data.block_shape
                nbcol = -(-data.shape[1] // bn)
                if nbcol * bn > _bk.BSR_PALLAS_MAX_X_ELEMS:
                    Rw = _bk.bsr_windowed_rows_per_program(
                        bm, self.data.blocks.shape[1], bn,
                        jnp.dtype(self.data.blocks.dtype).itemsize,
                        self.data.blocks.shape[0])
                    if (Rw * self.data.blocks.shape[1] * bm * bn
                            * jnp.dtype(self.data.blocks.dtype).itemsize
                            > 4 * 1024 * 1024):
                        return  # tile too big (odd-kmax 128-lane rule)
                    # the packed t_out/t_in (bm, R) kernel I/O blocks obey
                    # Mosaic's lane rule only when R is 128-divisible or
                    # the grid is one step (caught on-chip, batch17) —
                    # otherwise run the kernels with UNPACKED (R, bm)
                    # I/O (measured only a few percent slower at the
                    # bench shape: 541 vs 576 GB/s) instead of losing
                    # the whole Pallas path to the XLA fallback
                    self._win_packed = (not _on_tpu() or Rw % 128 == 0
                                        or self.data.blocks.shape[0] == Rw)
                    # wb_max passed explicitly so the LIVE module constant
                    # governs (a def-time default would pin the value and
                    # make it untestable/untunable)
                    plan = _bk.bsr_window_plan(
                        self.data.block_cols, Rw, nbcol,
                        wb_max=_bk.BSR_PALLAS_MAX_WINDOW_BLOCKS,
                        blocks=self.data.blocks)
                    if plan is not None:
                        q, cl, wb, xpb = plan
                        self.win_q = jnp.asarray(q)
                        self.cols_local = jnp.asarray(cl)
                        self._wb = wb
                        self._x_pad_blocks = xpb
                    else:
                        # mostly-banded (band + outlier column clusters):
                        # up to 4 independently addressed windows keep the
                        # forward on the Pallas path (cols_local None
                        # marks the multi plan)
                        planm = _bk.bsr_window_plan_multi(
                            self.data.block_cols, Rw, nbcol,
                            wb_max=_bk.BSR_PALLAS_MAX_WINDOW_BLOCKS,
                            blocks=self.data.blocks)
                        if planm is not None:
                            qm, wb, xpb = planm
                            self.win_q = jnp.asarray(qm)
                            self._wb = wb
                            self._x_pad_blocks = xpb
                            # transpose: monotone-lane plan over the same
                            # wb — keeps T/H on the Pallas sliding-window
                            # scatter instead of the ~0.25-ceiling XLA
                            # scatter (VERDICT r4 missing #1). The lane
                            # count is independent of the forward's W:
                            # when the forward's W lanes cannot be made
                            # monotone, extra lanes (up to the plan cap)
                            # often can (e.g. a far cluster revisited
                            # after band windows passed it).
                            plant = None
                            for Wt in sorted({int(qm.shape[0]),
                                              _bk.BSR_PALLAS_MAX_WINDOWS}):
                                plant = _bk.bsr_window_plan_multi_t(
                                    self.data.block_cols, Rw, nbcol, wb,
                                    Wt, blocks=self.data.blocks)
                                if plant is not None:
                                    break
                            if plant is not None:
                                qt, vt, xpbt = plant
                                self.win_q_t = jnp.asarray(qt)
                                self.win_valid_t = jnp.asarray(vt)
                                self._x_pad_blocks_t = xpbt

    # --- kernel eligibility (host-side; aux + shapes only, so the decision
    # is baked into the jit cache key via the operator's structure) ---
    def _pallas_eligible(self, gathered_elems: int, nbcol: int, transpose: bool,
                         x_dtype=None) -> bool:
        if self._backend == "xla":
            return False
        if x_dtype is not None:
            # the RESULT dtype must be Mosaic-lowerable too: an f64/complex
            # input vector against f32 blocks would otherwise reach the
            # kernel and fail at compile time instead of using XLA
            res = jnp.dtype(jnp.result_type(self.data.blocks.dtype, x_dtype))
            if res not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
                return False
        from ..kernels.bsr_spmv import (
            BSR_PALLAS_MAX_X_ELEMS,
            BSR_PALLAS_ONEHOT_MAX_NBCOL,
            bsr_pallas_rows_per_program,
        )

        d = self.data
        bm, bn = d.block_shape
        kmax = d.blocks.shape[1]
        itemsize = jnp.dtype(d.blocks.dtype).itemsize
        R = bsr_pallas_rows_per_program(bm, kmax, bn, itemsize)
        if d.blocks.shape[0] % R:
            return False
        # odd kmax forces R=128 for the 128-lane cols rule; refuse when
        # the tile exceeds the ~4 MB pipeline target — these kernels set
        # no vmem_limit_bytes, so a double-buffered oversize tile plus
        # the resident x and selector overflows the 16 MB scoped-VMEM
        # default at Mosaic compile time (opaque HTTP 500 on the relay)
        if R * kmax * bm * bn * itemsize > 4 * 1024 * 1024:
            return False
        if jnp.dtype(d.blocks.dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
            return False
        if gathered_elems > BSR_PALLAS_MAX_X_ELEMS:
            return False
        if nbcol > BSR_PALLAS_ONEHOT_MAX_NBCOL and (
            transpose or self._backend in ("auto", "pallas_fast")
        ):
            # beyond the one-hot window the XLA gather path wins (and the
            # fast variant HAS no loop fallback); the scalar-loop variant
            # exists only for forced-"pallas" callers
            return False
        if self._backend == "auto":
            if jax.default_backend() != "tpu":
                return False
            if d.block_shape[0] >= 128:
                return False  # XLA einsum already at roofline for 128×128
        return True

    def _interpret(self) -> bool:
        return jax.default_backend() != "tpu"

    def _pad_in(self, v, dim_blocks, bsize):
        need = dim_blocks * bsize
        if v.shape[0] < need:
            v = jnp.pad(v, (0, need - v.shape[0]))
        return v

    def _windowed_eligible(self, x_dtype, transpose: bool = False) -> bool:
        if self.win_q is None or self._backend == "xla":
            return False
        if transpose and self.cols_local is None and self.win_q_t is None:
            return False  # multi plan without a monotone-lane T plan
        res = jnp.dtype(jnp.result_type(self.data.blocks.dtype, x_dtype))
        if res not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
            return False
        return self._backend != "auto" or jax.default_backend() == "tpu"

    def _prod(self, v):
        d = self.data
        bm, bn = d.block_shape
        nbrow = d.blocks.shape[0]
        nbcol = -(-d.shape[1] // bn)
        xb = self._pad_in(v, nbcol, bn).reshape(nbcol, bn)
        if self._pallas_eligible(xb.size, nbcol, transpose=False, x_dtype=xb.dtype):
            from ..kernels.bsr_spmv import bsr_matvec_pallas

            # bf16 STORAGE defaults to the 2-pass gather: its ~1e-5 x
            # split error sits 2 orders below the bf16 value quantization
            # (4e-3), and the dropped third MXU pass is the EXPOSED cost
            # at fine blocks (measured 8×128 bf16: 579 vs 444 GB/s,
            # tools/tpu_r5_batch13/14.py — the kernel is gather-MXU-bound
            # there, not DMA-bound; see docs/performance.md)
            variant = ("onehot_fast"
                       if (self._backend == "pallas_fast"
                           or d.blocks.dtype == jnp.bfloat16) else "auto")
            y = bsr_matvec_pallas(
                d.blocks, d.block_cols, xb, interpret=self._interpret(),
                variant=variant,
            ).reshape(nbrow * bm)
        elif self._windowed_eligible(xb.dtype):
            # x beyond VMEM residency on a banded pattern: sliding-window
            # Pallas kernel (kernels/bsr_spmv.py::bsr_matvec_pallas_windowed)
            # t_out: the kernel writes y TRANSPOSED (bm, nbrow) — packed
            # HBM layout; the (nbrow, bm<16) form is 128/bm-lane-padded
            # and its host flatten is a slow relayout (measured 443 vs
            # 626 GB/s at n=4.2M, tools/tpu_r4_batch5/6.py). One packed
            # XLA transpose restores the flat vector.
            pk = self._win_packed  # lane-legal packed I/O (see __init__)
            if self.cols_local is None:  # mostly-banded multi-window plan
                from ..kernels.bsr_spmv import bsr_matvec_pallas_multiwin

                out = bsr_matvec_pallas_multiwin(
                    d.blocks, d.block_cols, self.win_q, xb,
                    wb=self._wb, x_pad_blocks=self._x_pad_blocks,
                    interpret=self._interpret(),
                    fast=(self._backend == "pallas_fast"
                          or d.blocks.dtype == jnp.bfloat16),
                    t_out=pk)
            else:
                from ..kernels.bsr_spmv import bsr_matvec_pallas_windowed

                out = bsr_matvec_pallas_windowed(
                    d.blocks, self.cols_local, self.win_q, xb,
                    wb=self._wb, x_pad_blocks=self._x_pad_blocks,
                    interpret=self._interpret(),
                    fast=(self._backend == "pallas_fast"
                          or d.blocks.dtype == jnp.bfloat16),
                    t_out=pk)
            y = (out.T if pk else out).reshape(nbrow * bm)
        else:
            y = bsr_matvec(d.blocks, d.block_cols, xb).reshape(nbrow * bm)
        return y[: d.shape[0]]

    def _tprod_impl(self, blocks, u):
        d = self.data
        bm, bn = d.block_shape
        nbrow = blocks.shape[0]
        nbcol = -(-d.shape[1] // bn)
        ub = self._pad_in(u, nbrow, bm).reshape(nbrow, bm)
        if self._pallas_eligible(nbcol * bn, nbcol, transpose=True, x_dtype=ub.dtype):
            from ..kernels.bsr_spmv import bsr_rmatvec_pallas

            x = bsr_rmatvec_pallas(
                blocks, d.block_cols, ub, nbcol, interpret=self._interpret()
            ).reshape(nbcol * bn)
        elif self._windowed_eligible(ub.dtype, transpose=True):
            # output beyond VMEM residency on a banded pattern: scatter
            # into sliding output windows (the same plan the forward
            # windowed kernel fetches x through) instead of the
            # ~0.45-of-ceiling XLA scatter path.
            # t_in: hand the kernel u TRANSPOSED (bm, nbrow) — one packed
            # XLA transpose on the host replaces a 128/bm-lane-padded
            # HBM read (same layout economics as the forward t_out)
            pk = self._win_packed  # lane-legal packed I/O (see __init__)
            u_in = ub.T if pk else ub
            if self.cols_local is None:  # multi-window monotone-lane plan
                from ..kernels.bsr_spmv import bsr_rmatvec_pallas_multiwin

                x = bsr_rmatvec_pallas_multiwin(
                    blocks, d.block_cols, self.win_q_t, self.win_valid_t,
                    u_in, wb=self._wb, x_pad_blocks=self._x_pad_blocks_t,
                    nbcol=nbcol, interpret=self._interpret(),
                    t_in=pk).reshape(-1)[: nbcol * bn]
            else:
                from ..kernels.bsr_spmv import bsr_rmatvec_pallas_windowed

                x = bsr_rmatvec_pallas_windowed(
                    blocks, self.cols_local, self.win_q, u_in,
                    wb=self._wb, x_pad_blocks=self._x_pad_blocks,
                    nbcol=nbcol, interpret=self._interpret(),
                    t_in=pk).reshape(-1)[: nbcol * bn]
        else:
            x = bsr_rmatvec(blocks, d.block_cols, ub, nbcol).reshape(nbcol * bn)
        return x[: d.shape[1]]

    def _tprod(self, u):
        return self._tprod_impl(self.data.blocks, u)

    def _ctprod(self, w):
        if not jnp.iscomplexobj(self.data.blocks):
            return self._tprod(w)
        return self._tprod_impl(jnp.conj(self.data.blocks), w)

    def apply_matrix(self, M, mode: str = "N"):
        self._check_mat(M, mode)
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


for _cls in (COOOperator, CSROperator, ELLOperator, BSROperator,
             RoutedCSROperator):
    register_operator(_cls)


# ----------------------------------------------------------------------------
# Factory
# ----------------------------------------------------------------------------


# largest tile first: on equal stored bytes the bigger tile streams faster
_BSR_AUTO_CANDIDATES = ((128, 128), (32, 128), (16, 128), (8, 128))

# format="auto" picks the Clos-routed layout for unstructured patterns up
# to ROUTED_AUTO_MAX_NNZ. Packing costs ~0.9-1.6 s per 1M nnz (native
# router + derived transpose), so above ROUTED_AUTO_WARN_NNZ the choice
# is announced with a host warning naming the pack cost — the alternative
# (gather+segment_sum CSR) measured 0.062 Gnnz/s on v5e, a 180× cliff
# (VERDICT r4 missing #2). Multi-chunk applies validated at 4.2M nnz
# (9.2 Gnnz/s, tools/tpu_r4_batch2.py) and 8.4M nnz (bench r5
# auto_8m section). Beyond the cap, auto falls to chunked CSR WITH a
# warning naming the faster explicit options.
ROUTED_AUTO_WARN_NNZ = 4_000_000
ROUTED_AUTO_MAX_NNZ = 32_000_000


def _auto_block_shape(sp, return_stored: bool = False, dtype=None):
    """Pick the BSR block shape minimizing the STREAMED (padded) bytes per
    apply, using the native block counter when available. Larger tiles run
    closer to the MXU streaming rate but cost fill-in on scattered patterns.

    Streamed bytes is dtype-aware: the Mosaic storage tile has
    ``32 // itemsize * 4`` sublanes (8 for f32, 16 for bf16), so a block
    with bm below that occupies the FULL tile in memory and the DMA sees no
    saving — measured on v5e: 8×128 bf16 streams at f32 speed while 16×128
    bf16 realizes the 2× (kernels/bsr_spmv.py:30-33; bench
    spmv_16x128_bf16 330 vs 8x128 251 Gnnz/s). An auto-built bf16 operator
    therefore lands on bm ≥ 16 unless fill-in outweighs the tile waste."""
    try:
        from ..native import _load

        lib = _load()
    except Exception:
        lib = None
    if lib is None:
        return ((8, 128), None) if return_stored else (8, 128)
    cols = np.ascontiguousarray(sp.indices, np.int32)
    indptr = np.ascontiguousarray(sp.indptr, np.int32)
    nrow = sp.shape[0]
    itemsize = jnp.dtype(dtype or sp.data.dtype).itemsize
    # (8, 16, 32) sublanes per storage tile for 4-, 2-, 1-byte dtypes
    native_sublanes = 8 * max(4 // itemsize, 1)
    best, best_cost, best_stored = (8, 128), None, None
    for bm, bn in _BSR_AUTO_CANDIDATES:
        nbrow = -(-nrow // bm)
        counts = np.zeros(nbrow, np.int32)
        kmax = max(int(lib.bsr_count(cols, indptr, nrow, bm, bn, counts)), 1)
        stored = nbrow * kmax * bm * bn  # uniform-kmax padded layout
        # sub-native-tile bm streams the whole tile's bytes anyway
        tile_waste = max(native_sublanes / bm, 1.0)
        cost = stored * itemsize * tile_waste
        if best_cost is None or cost < best_cost:
            best, best_cost, best_stored = (bm, bn), cost, stored
    if return_stored:
        return best, best_stored
    return best


def opSparse(
    A,
    format: str = "csr",
    block_shape: Union[Tuple[int, int], str] = (8, 128),
    symmetric: bool = False,
    hermitian: bool = False,
    tol: float = 0.0,
    backend: str = "auto",
    dtype=None,
    w="auto",
    reorder=None,
):
    """Build a sparse operator from a dense array, a scipy sparse matrix, or
    a prebuilt COO/CSR/BSR/ELL pytree. ``format`` in {'coo', 'csr', 'bsr',
    'ell', 'routed', 'auto'}; ``block_shape="auto"`` picks the BSR tile
    minimizing stored bytes; ``format="auto"`` routes block-structured
    patterns to BSR (the MXU path) and scattered ones to the Clos-routed
    lane-gather pipeline ('routed', sparse/routed.py — ``w`` selects the
    row-slot width). 'csr'/'coo'/'ell' remain the plain gather/segment-sum
    layouts (correctness-only on TPU: ~3 orders below roofline).
    ``backend`` (BSR only) selects the apply kernels — "auto" (default)
    engages the Pallas VMEM-gather kernels on TPU for fine blocks; see
    ``BSROperator``. ``dtype`` selects the stored value dtype (e.g.
    ``jnp.bfloat16`` — scipy can't carry bf16, so the cast happens at
    device upload); the auto block-shape pick is dtype-aware (a bf16
    operator lands on bm ≥ 16, where the 2× byte saving is real).
    ``reorder="rcm"`` (square matrices) applies a reverse-Cuthill–McKee
    similarity permutation FIRST and returns ``Pᵀ·op(A[perm][:,perm])·P``
    (sparse/reorder.py) — scrambled-but-bandable patterns recover the
    banded BSR/windowed MXU path (order-of-magnitude per-nnz over the
    routed scattered path) at the cost of two Clos-routed permutation
    applies.
    """
    if reorder is not None:
        if reorder != "rcm":
            raise ValueError(f"unknown reorder {reorder!r} (only 'rcm')")
        from .reorder import rcm_reordered_operator

        if not hasattr(A, "tocsr"):
            import scipy.sparse as sps

            if isinstance(A, (COO, CSR, ELL, BSR)):
                raise LinearOperatorException(
                    "reorder='rcm' takes a scipy sparse matrix or a dense "
                    "array (the permutation is computed on the host)")
            Ad = np.asarray(A)
            if tol > 0:
                Ad = np.where(np.abs(Ad) > tol, Ad, 0.0)
            A = sps.csr_matrix(Ad)
        return rcm_reordered_operator(A.tocsr(), dict(
            format=format, block_shape=block_shape, symmetric=symmetric,
            hermitian=hermitian, tol=tol, backend=backend, dtype=dtype, w=w))
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    if dtype is not None and isinstance(A, (COO, CSR, ELL, BSR)):
        if isinstance(A, BSR):
            A = BSR(jnp.asarray(A.blocks, dtype), A.block_cols, A.shape)
        else:
            A = A._replace(vals=jnp.asarray(A.vals, dtype))
    if isinstance(A, COO):
        return COOOperator(A, symmetric, hermitian)
    if isinstance(A, CSR):
        if format == "routed":
            return RoutedCSROperator(A, symmetric, hermitian, w=w)
        return CSROperator(A, symmetric, hermitian)
    if isinstance(A, ELL):
        return ELLOperator(A, symmetric, hermitian)
    if isinstance(A, BSR):
        return BSROperator(A, symmetric, hermitian, backend=backend)

    # dense input with format='auto': route through scipy when available
    if format == "auto" and not hasattr(A, "tocsr"):
        try:
            import scipy.sparse as sps

            Ad = np.asarray(A)
            if tol > 0:  # honor tol like every other dense path
                Ad = np.where(np.abs(Ad) > tol, Ad, 0.0)
            A = sps.csr_matrix(Ad)
        except ImportError:
            format = "csr"

    # scipy sparse?
    if hasattr(A, "tocsr"):
        sp = A.tocsr()
        if format == "auto":
            shape_best, stored = _auto_block_shape(sp, return_stored=True, dtype=dtype)
            itemsize = jnp.dtype(dtype or sp.data.dtype).itemsize
            if stored is not None and stored * itemsize < sp.nnz * (itemsize + 8):
                format, block_shape = "bsr", shape_best
            elif 0 < sp.nnz <= ROUTED_AUTO_MAX_NNZ:
                format = "routed"
                if sp.nnz > ROUTED_AUTO_WARN_NNZ:
                    import warnings

                    warnings.warn(
                        f"opSparse(format='auto'): unstructured pattern with "
                        f"{sp.nnz} nnz routes through the Clos pipeline — "
                        f"one-time pack cost ~{sp.nnz / 1e6 * 1.6:.0f} s "
                        f"(~1.6 s per 1M nnz; applies then run ~150× faster "
                        f"than the gather CSR path). Pass format='csr' to "
                        f"skip packing, or reorder='rcm' if the pattern is "
                        f"bandable.", stacklevel=2)
            else:
                format = "csr"
                if sp.nnz > ROUTED_AUTO_MAX_NNZ:
                    import warnings

                    warnings.warn(
                        f"opSparse(format='auto'): {sp.nnz} nnz exceeds "
                        f"the auto-routing cap ({ROUTED_AUTO_MAX_NNZ}); "
                        f"falling back to the gather+segment_sum CSR path "
                        f"(~0.06 Gnnz/s on TPU, ~150× below the routed "
                        f"pipeline). Pass format='routed' explicitly to "
                        f"pack anyway (~1.6 s per 1M nnz), or "
                        f"reorder='rcm' if the pattern is bandable.",
                        stacklevel=2)
        if format == "csr":
            data = csr_from_parts(sp.data, sp.indices, sp.indptr, sp.shape)
            if dtype is not None:
                data = data._replace(vals=jnp.asarray(data.vals, dtype))
            return CSROperator(data, symmetric, hermitian)
        if format == "routed":
            data = csr_from_parts(sp.data, sp.indices, sp.indptr, sp.shape)
            if dtype is not None:
                data = data._replace(vals=jnp.asarray(data.vals, dtype))
            host_vals = (sp.data if dtype is None
                         else np.asarray(sp.data, dtype))
            return RoutedCSROperator(
                data, symmetric, hermitian, w=w,
                host_parts=(host_vals, sp.indices, sp.indptr))
        if format == "ell":
            data = ell_from_csr_parts(sp.data, sp.indices, sp.indptr, sp.shape)
            if dtype is not None:
                data = data._replace(vals=jnp.asarray(data.vals, dtype))
            return ELLOperator(data, symmetric, hermitian)
        if format == "coo":
            from .formats import check_int32_range

            sc = sp.tocoo()
            check_int32_range(sc.shape, sc.nnz)
            data = COO(
                vals=cast(sc.data),
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
                    block_shape = _auto_block_shape(sp, dtype=dtype)

                from ..kernels.bsr_spmv import bsr_pallas_rows_per_program

                pad_to = bsr_pallas_rows_per_program(
                    block_shape[0], bn=block_shape[1],
                    itemsize=jnp.dtype(dtype or sp.data.dtype).itemsize,
                )
                blocks, bcols = bsr_pack_csr(
                    sp.data, sp.indices, sp.indptr, sp.shape[0], sp.shape[1],
                    block_shape, pad_rows_to=pad_to,
                )
                import jax.numpy as _jnp

                return BSROperator(
                    BSR(cast(blocks), _jnp.asarray(bcols), tuple(sp.shape)),
                    symmetric,
                    hermitian,
                    backend=backend,
                )
            except Exception:
                pass
        A = sp.toarray()

    A = np.asarray(A)
    def _cast_vals(data):
        return data._replace(vals=jnp.asarray(data.vals, dtype)) if dtype is not None else data
    if format == "coo":
        return COOOperator(_cast_vals(coo_from_dense(A, tol)), symmetric, hermitian)
    if format == "csr":
        return CSROperator(_cast_vals(csr_from_dense(A, tol)), symmetric, hermitian)
    if format == "routed":
        return RoutedCSROperator(_cast_vals(csr_from_dense(A, tol)),
                                 symmetric, hermitian, w=w)
    if format == "ell":
        return ELLOperator(_cast_vals(ell_from_dense(A, tol)), symmetric, hermitian)
    if format == "bsr":
        if block_shape == "auto":
            try:
                import scipy.sparse as sps

                return opSparse(
                    sps.csr_matrix(A), format="bsr", block_shape="auto",
                    symmetric=symmetric, hermitian=hermitian, backend=backend,
                    dtype=dtype,
                )
            except ImportError:
                block_shape = (8, 128)
        data = bsr_from_dense(A, block_shape, tol)
        if dtype is not None:
            data = BSR(jnp.asarray(data.blocks, dtype), data.block_cols, data.shape)
        return BSROperator(data, symmetric, hermitian, backend=backend)
    raise ValueError(f"unknown sparse format {format!r}")
