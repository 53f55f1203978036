"""Sparse operator tests: COO/CSR/BSR against dense oracles (reference
test strategy: test/test_linop.jl sparse-wrapper oracles, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import assert_close

import linops_tpu as lo
from linops_tpu.sparse import opSparse, csr_from_dense, bsr_from_dense


def sprand(rng, m, n, density=0.1, complex_=False):
    A = rng.standard_normal((m, n))
    if complex_:
        A = A + 1j * rng.standard_normal((m, n))
    mask = rng.random((m, n)) < density
    return A * mask


@pytest.mark.parametrize("fmt", ["coo", "csr", "bsr"])
@pytest.mark.parametrize("shape", [(40, 40), (30, 50), (50, 30)])
def test_sparse_matvec_oracle(fmt, shape, rng):
    m, n = shape
    A = sprand(rng, m, n, 0.15)
    op = opSparse(A, format=fmt, block_shape=(8, 16))
    assert op.shape == (m, n)
    v = rng.standard_normal(n)
    u = rng.standard_normal(m)
    assert_close(op * v, A @ v)
    assert_close(op.T * u, A.T @ u)
    assert_close(op.H * u, A.T @ u)
    assert_close(op.to_dense(), A, rtol=1e-12)


@pytest.mark.parametrize("fmt", ["coo", "csr"])
def test_sparse_complex(fmt, rng):
    m, n = 25, 35
    A = sprand(rng, m, n, 0.2, complex_=True)
    op = opSparse(A, format=fmt)
    v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    u = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    assert_close(op * v, A @ v)
    assert_close(op.T * u, A.T @ u)
    assert_close(op.H * u, A.conj().T @ u)


def test_bsr_complex(rng):
    m = n = 32
    A = sprand(rng, m, n, 0.2, complex_=True)
    op = opSparse(A, format="bsr", block_shape=(8, 8))
    u = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    assert_close(op.H * u, A.conj().T @ u)


def test_sparse_matmat(rng):
    m, n, k = 30, 40, 7
    A = sprand(rng, m, n, 0.2)
    X = rng.standard_normal((n, k))
    for fmt in ("coo", "csr"):
        op = opSparse(A, format=fmt)
        assert_close(op.matmat(X), A @ X)
        assert_close(op.matmat(rng.standard_normal((m, k)) * 0 + 1.0, mode="T"), A.T @ np.ones((m, k)))


def test_sparse_in_algebra(rng):
    """Sparse operators participate in the lazy algebra graph."""
    n = 48
    A = sprand(rng, n, n, 0.1)
    B = sprand(rng, n, n, 0.1)
    opA = opSparse(A, format="csr")
    opB = opSparse(B, format="bsr", block_shape=(8, 16))
    chain = 2.0 * (opA @ opB) + opA.T - lo.opEye(n)
    dense = 2.0 * (A @ B) + A.T - np.eye(n)
    v = rng.standard_normal(n)
    assert_close(chain * v, dense @ v)


def test_sparse_symmetric_flags(rng):
    n = 20
    A = sprand(rng, n, n, 0.3)
    A = (A + A.T) / 2
    op = opSparse(A, format="csr", symmetric=True, hermitian=True)
    assert op.symmetric and op.hermitian
    assert lo.check_hermitian(op)


def test_scipy_interop(rng):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    m, n = 30, 40
    A = sprand(rng, m, n, 0.2)
    S = scipy_sparse.csr_matrix(A)
    op = opSparse(S)
    v = rng.standard_normal(n)
    assert_close(op * v, A @ v)
    assert op.nnz == S.nnz


def test_bsr_padding_alignment(rng):
    """BSR pads ragged dims with zero blocks; logical shape preserved."""
    m, n = 37, 53  # deliberately unaligned
    A = sprand(rng, m, n, 0.3)
    op = opSparse(A, format="bsr", block_shape=(8, 16))
    assert op.shape == (m, n)
    v = rng.standard_normal(n)
    assert_close(op * v, A @ v)
    u = rng.standard_normal(m)
    assert_close(op.T * u, A.T @ u)


def test_sparse_no_recompile(rng):
    n = 64
    A1 = sprand(rng, n, n, 0.1)
    op = opSparse(A1, format="csr")
    v = rng.standard_normal(n)
    op.matvec(v)
    before = lo.apply_cache_sizes()
    # same structure (same nnz), new values -> cache hit
    op2 = opSparse(np.where(A1 != 0, A1 * 2.0, 0.0), format="csr")
    assert op2.nnz == op.nnz
    op2.matvec(v)
    op.matvec(v)
    assert lo.apply_cache_sizes() == before


def test_pallas_bsr_interpret(rng):
    """Pallas BSR kernels (interpret mode) match the XLA path — forward
    (both gather variants) and transpose."""
    import jax.numpy as jnp
    from linops_tpu.sparse.formats import bsr_from_dense
    from linops_tpu.kernels import (
        bsr_matvec_pallas,
        bsr_rmatvec_pallas,
        bsr_pallas_rows_per_program,
    )

    n = 256
    A = sprand(rng, n, n, 0.1).astype(np.float32)
    bsr = bsr_from_dense(A, (8, 32))
    nbrow = bsr.blocks.shape[0]
    pad = (-nbrow) % bsr_pallas_rows_per_program(8)
    blocks = jnp.pad(bsr.blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
    cols = jnp.pad(bsr.block_cols, ((0, pad), (0, 0)))
    xb = jnp.asarray(rng.standard_normal(n).astype(np.float32)).reshape(-1, 32)
    for variant in ("onehot", "loop"):
        y = bsr_matvec_pallas(blocks, cols, xb, interpret=True, variant=variant)
        ref = A @ np.asarray(xb).ravel()
        got = np.asarray(y).ravel()[:n]
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
    # transpose mode
    ub = jnp.asarray(rng.standard_normal(blocks.shape[0] * 8).astype(np.float32)).reshape(-1, 8)
    out = bsr_rmatvec_pallas(blocks, cols, ub, n // 32, interpret=True)
    reft = A.T @ np.asarray(ub).ravel()[: n]
    np.testing.assert_allclose(np.asarray(out).ravel()[:n], reft, rtol=2e-5, atol=1e-5)


def test_pallas_backend_operator(rng):
    """BSROperator(backend='pallas') (interpreter off-TPU) matches dense,
    forward and transpose, through the operator API."""
    n = 256
    A = sprand(rng, n, n, 0.15).astype(np.float32)
    op = opSparse(A, format="bsr", block_shape=(8, 32), backend="pallas")
    v = rng.standard_normal(n).astype(np.float32)
    assert_close(op * v, A @ v, rtol=1e-4)
    assert_close(op.T * v, A.T @ v, rtol=1e-4)


def test_bsr_auto_block_shape(rng):
    """block_shape='auto' picks the tile minimizing stored bytes and stays
    correct; a dense-ish matrix should prefer large tiles."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from linops_tpu.native import native_available

    if not native_available():
        pytest.skip("native counter unavailable")
    n = 512
    dense_ish = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.5)
    op = lo.opSparse(scipy_sparse.csr_matrix(dense_ish), format="bsr", block_shape="auto")
    assert op.data.block_shape in ((32, 128), (128, 128))
    v = rng.standard_normal(n)
    assert_close(op * v, dense_ish @ v)

    scattered = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.002)
    op2 = lo.opSparse(scipy_sparse.csr_matrix(scattered), format="bsr", block_shape="auto")
    v2 = rng.standard_normal(n)
    assert_close(op2 * v2, scattered @ v2)


def test_sparse_matmat_conj_mode(rng):
    """mode 'C' matmat equals conj(A) @ M (regression: triple-conjugation
    returned A @ M)."""
    m, n, k = 12, 15, 4
    A = sprand(rng, m, n, 0.3, complex_=True)
    M = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    for fmt in ("coo", "csr"):
        op = opSparse(A, format=fmt)
        got = np.asarray(op.matmat(jnp.asarray(M), mode="C"))
        np.testing.assert_allclose(got, np.conj(A) @ M, rtol=1e-10)


def test_scipy_coo_no_densify(rng):
    """scipy input with format='coo' builds directly from the COO triplets."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    S = scipy_sparse.random(50, 40, density=0.1, random_state=2).tocsr()
    op = opSparse(S, format="coo")
    assert type(op).__name__ == "COOOperator"
    v = rng.standard_normal(40)
    assert_close(op * v, S @ v)


def test_bsr_matmat_direct(rng):
    """Direct BSR SpMM path matches dense multi-RHS (and unaligned shapes)."""
    m, n, k = 37, 53, 6
    A = sprand(rng, m, n, 0.3)
    op = opSparse(A, format="bsr", block_shape=(8, 16))
    X = rng.standard_normal((n, k))
    assert_close(op.matmat(X), A @ X)


def test_native_packer_sums_duplicates(rng):
    """Non-canonical CSR with duplicate (row, col) entries is summed (scipy
    convention; regression: last-wins assignment)."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from linops_tpu.native import bsr_pack_csr, native_available
    from linops_tpu.sparse.formats import BSR
    import jax.numpy as jnp

    if not native_available():
        pytest.skip("native packer unavailable")
    rows = np.array([0, 0, 1, 2])
    cols = np.array([1, 1, 2, 0])
    vals = np.array([2.0, 3.0, 1.0, 4.0])
    S = scipy_sparse.coo_matrix((vals, (rows, cols)), shape=(8, 8)).tocsr()
    # keep duplicates: build CSR parts manually from the COO (tocsr sums)
    indptr = np.array([0, 2, 3, 4, 4, 4, 4, 4, 4], np.int32)
    blocks, bcols = bsr_pack_csr(vals, cols, indptr, 8, 8, (4, 4))
    dense = np.zeros((8, 8))
    for i in range(blocks.shape[0]):
        for kk in range(blocks.shape[1]):
            j = bcols[i, kk]
            dense[i*4:(i+1)*4, j*4:(j+1)*4] += blocks[i, kk]
    assert dense[0, 1] == 5.0  # 2 + 3 summed


def test_opsparse_format_auto(rng):
    """format='auto' packs block-structured patterns to BSR (native packer)
    and leaves scattered patterns in CSR (round-1 VERDICT #1 routing)."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from linops_tpu.native import native_available

    if not native_available():
        pytest.skip("native counter unavailable")
    n = 512
    # block-structured: dense 8x128 tiles
    blocky = np.zeros((n, n), np.float64)
    for bi in range(0, n, 8):
        j = ((bi // 8) * 128) % n  # aligned 8x128 tiles
        blocky[bi : bi + 8, j : j + 128] = rng.standard_normal((8, 128))
    opb = lo.opSparse(scipy_sparse.csr_matrix(blocky), format="auto")
    assert type(opb).__name__ == "BSROperator"
    v = rng.standard_normal(n)
    assert_close(opb * v, blocky @ v)

    # scattered: ~2 nnz/row uniform — no recoverable block structure, so
    # auto picks the Clos-routed lane-gather layout (sparse/routed.py)
    scat = rng.standard_normal((n, n)) * (rng.random((n, n)) < 2.0 / n)
    opc = lo.opSparse(scipy_sparse.csr_matrix(scat), format="auto")
    assert type(opc).__name__ == "RoutedCSROperator"
    assert_close(opc * v, scat @ v)

    # above the routed auto-pack budget, scattered falls to plain CSR —
    # but NEVER silently: the 180× cliff is announced with the faster
    # explicit options (VERDICT r4 missing #2)
    import warnings

    from linops_tpu.sparse import ops as sparse_ops

    old = sparse_ops.ROUTED_AUTO_MAX_NNZ
    try:
        sparse_ops.ROUTED_AUTO_MAX_NNZ = 1
        with pytest.warns(UserWarning, match="format='routed'"):
            opd = lo.opSparse(scipy_sparse.csr_matrix(scat), format="auto")
        assert type(opd).__name__ == "CSROperator"
    finally:
        sparse_ops.ROUTED_AUTO_MAX_NNZ = old

    # between the warn threshold and the cap, auto still routes but
    # announces the pack cost
    old_warn = sparse_ops.ROUTED_AUTO_WARN_NNZ
    try:
        sparse_ops.ROUTED_AUTO_WARN_NNZ = 1
        with pytest.warns(UserWarning, match="pack cost"):
            ope = lo.opSparse(scipy_sparse.csr_matrix(scat), format="auto")
        assert type(ope).__name__ == "RoutedCSROperator"
    finally:
        sparse_ops.ROUTED_AUTO_WARN_NNZ = old_warn

    # below the warn threshold: silent routing, no warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        opf = lo.opSparse(scipy_sparse.csr_matrix(scat), format="auto")
    assert type(opf).__name__ == "RoutedCSROperator"


def test_ell_operator(rng):
    """ELL format: forward is gather+row-sum (no scatter); matches dense in
    every mode, participates in algebra, handles ragged rows via padding."""
    m, n = 37, 29
    A = sprand(rng, m, n, 0.2)
    A[3] = 0.0  # empty row
    A[5, :25] = rng.standard_normal(25)  # heavy row (kmax driver)
    for src in (A, __import__("scipy.sparse", fromlist=["csr_matrix"]).csr_matrix(A)):
        op = opSparse(src, format="ell")
        assert type(op).__name__ == "ELLOperator"
        v = rng.standard_normal(n)
        u = rng.standard_normal(m)
        assert_close(op * v, A @ v)
        assert_close(op.T * u, A.T @ u)
        assert_close(op.H * u, A.T @ u)
        assert_close(op.to_dense(), A, rtol=1e-12)
        X = rng.standard_normal((n, 3))
        assert_close(op.matmat(X), A @ X)
        assert_close(op.matmat(rng.standard_normal((m, 3)), mode="T").shape, (n, 3))


def test_ell_complex(rng):
    m = n = 24
    A = sprand(rng, m, n, 0.25, complex_=True)
    op = opSparse(A, format="ell")
    u = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    assert_close(op.H * u, A.conj().T @ u)
    M = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    assert_close(op.matmat(jnp.asarray(M), mode="C"), np.conj(A) @ M)


def test_bsr_bf16_storage(rng):
    """bf16 block storage: applies promote per element (no upcast copy of
    the block array) and stay accurate to bf16 resolution."""
    n = 256
    A = sprand(rng, n, n, 0.2).astype(np.float32)
    from linops_tpu.sparse.formats import bsr_from_dense, BSR as BSRfmt

    b = bsr_from_dense(A, (8, 32))
    op = lo.BSROperator(
        BSRfmt(blocks=b.blocks.astype(jnp.bfloat16), block_cols=b.block_cols,
               shape=b.shape)
    )
    v = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(op * v, dtype=np.float32)
    np.testing.assert_allclose(got, A @ v, rtol=5e-2, atol=5e-2)


def test_sparse_apply_rejects_wrong_length(rng):
    """Sparse applies gather/pad, which would silently ACCEPT wrong-length
    vectors (JAX clamps out-of-range gather indices) — the base-class
    validation must raise instead, for every format and mode."""
    import pytest as _pytest
    n = 64
    A = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3))
    A[np.arange(n), np.arange(n)] = 1.0
    for fmt in ("coo", "csr", "ell", "bsr"):
        op = lo.opSparse(A, format=fmt) if fmt != "bsr" else lo.opSparse(
            A, format="bsr", block_shape=(8, 8))
        for mode in ("N", "T", "C", "H"):
            with _pytest.raises(lo.LinearOperatorException):
                op.apply(jnp.zeros(n - 3), mode)
            with _pytest.raises(lo.LinearOperatorException):
                op.apply(jnp.zeros((n, 2)), mode)

def test_sparse_apply_matrix_rejects_wrong_shape(rng):
    """apply_matrix has the same clamping-gather hazard as apply: a
    wrong-height (or non-2D) matrix must raise, for every format/mode."""
    import pytest as _pytest
    n = 64
    A = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3))
    A[np.arange(n), np.arange(n)] = 1.0
    for fmt in ("coo", "csr", "ell", "bsr"):
        op = lo.opSparse(A, format=fmt) if fmt != "bsr" else lo.opSparse(
            A, format="bsr", block_shape=(8, 8))
        for mode in ("N", "T", "C", "H"):
            with _pytest.raises(lo.LinearOperatorException):
                op.apply_matrix(jnp.zeros((n - 3, 2)), mode)
            with _pytest.raises(lo.LinearOperatorException):
                op.apply_matrix(jnp.zeros(n), mode)


def test_csr_chunked_apply(rng, monkeypatch):
    """nnz above CSR_CHUNK_NNZ routes through the lax.scan chunked path
    (the guard for the ≥16M-nnz TPU-worker crash); results must match the
    single-shot path and the dense oracle exactly, including matrix RHS
    and non-divisible chunk counts."""
    from linops_tpu.sparse import ops as sops

    monkeypatch.setattr(sops, "CSR_CHUNK_NNZ", 37)  # force ~8 chunks
    m, n = 40, 50
    A = sprand(rng, m, n, 0.15)
    nnz = int((A != 0).sum())
    assert nnz > 2 * 37
    for fmt in ("csr", "coo"):
        op = opSparse(A, format=fmt)
        v = rng.standard_normal(n)
        u = rng.standard_normal(m)
        assert_close(op * v, A @ v)
        assert_close(op.T * u, A.T @ u)
        M = rng.standard_normal((n, 3))
        assert_close(op.apply_matrix(jnp.asarray(M)), A @ M)
        U = rng.standard_normal((m, 3))
        assert_close(op.apply_matrix(jnp.asarray(U), "T"), A.T @ U)


def test_bsr_auto_block_shape_bf16(rng):
    """bf16 storage must auto-pick bm >= 16: a (8, 128) bf16 slab occupies
    the full (16, 128) Mosaic tile so the DMA sees no byte saving
    (kernels/bsr_spmv.py:30-33; bench 16x128 bf16 330 vs 8x128 251
    Gnnz/s)."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from linops_tpu.native import native_available

    if not native_available():
        pytest.skip("native counter unavailable")
    n = 1024
    # low-density scattered pattern: distinct-block count grows sublinearly
    # with bm, so f32 strictly prefers 8 rows; the bf16 tile-waste term
    # (an (8,128) bf16 slab fills the whole (16,128) tile) flips it to 16
    rng2 = np.random.default_rng(3)
    nn = 4096
    rows_i = np.repeat(np.arange(nn), 2)
    cols_i = rng2.integers(0, nn, size=nn * 2)
    sp32 = scipy_sparse.csr_matrix(
        (np.ones(nn * 2, np.float32), (rows_i, cols_i)), shape=(nn, nn)
    )
    A = sp32.toarray()
    n = nn
    from linops_tpu.sparse.ops import _auto_block_shape

    (bm32, _bn32) = _auto_block_shape(sp32)
    (bm16, _bn16) = _auto_block_shape(sp32, dtype=jnp.bfloat16)
    assert bm32 == 8, bm32
    assert bm16 >= 16, bm16

    op = lo.opSparse(sp32, format="bsr", block_shape="auto", dtype=jnp.bfloat16)
    assert op.data.block_shape[0] >= 16
    assert op.data.blocks.dtype == jnp.bfloat16
    v = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(op * jnp.asarray(v), np.float32)
    ref = A @ v
    np.testing.assert_allclose(got, ref, rtol=2e-2)

    # dtype kwarg on the other formats casts the stored values too
    for fmt in ("csr", "coo", "ell"):
        opf = lo.opSparse(sp32, format=fmt, dtype=jnp.bfloat16)
        assert opf.data.vals.dtype == jnp.bfloat16
        gotf = np.asarray(opf * jnp.asarray(v), np.float32)
        np.testing.assert_allclose(gotf, ref, rtol=2e-2)


def test_bsr_windowed_forward(monkeypatch, rng):
    """x beyond the VMEM residency bound on a banded pattern routes to the
    sliding-window Pallas kernel (interpret mode on CPU) and matches the
    XLA path exactly-ish (same 3-pass split contract)."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    import linops_tpu.kernels.bsr_spmv as BK

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    n = 40 * 128  # nbcol = 40 > 16 blocks over the shrunken bound
    A = np.zeros((n, n), np.float32)
    # block-banded: each 8-row stripe touches a narrow sliding column window
    for bi in range(n // 8):
        j0 = min(max((bi * 8 * 40 // (n // 128)) // 1, 0), 39 - 3)
        j0 = int(bi * 37 / (n // 8))  # slowly sliding window start
        for k in range(3):
            A[bi * 8:(bi + 1) * 8, (j0 + k) * 128:(j0 + k + 1) * 128] = (
                rng.standard_normal((8, 128)).astype(np.float32))
    op = lo.opSparse(scipy_sparse.csr_matrix(A), format="bsr",
                     block_shape=(8, 128), backend="pallas")
    assert op.win_q is not None and op._wb > 0
    v = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(op * v)
    ref = A @ v
    np.testing.assert_allclose(y, ref, rtol=3e-6, atol=3e-5)
    # scattered pattern (not banded): plan refuses, falls back to XLA
    S = np.zeros((n, n), np.float32)
    idx = rng.integers(0, 40, n // 8)
    S[np.arange(n), ((idx.repeat(8) * 997) % 40) * 128 + rng.integers(0, 128, n)] = 1.0
    op2 = lo.opSparse(scipy_sparse.csr_matrix(S), format="bsr",
                      block_shape=(8, 128), backend="pallas")
    v2 = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op2 * v2), S @ v2, rtol=3e-6, atol=3e-5)


def test_bsr_multiwindow_forward(monkeypatch, rng):
    """Mostly-banded pattern (band + a far-off column cluster per stripe,
    e.g. RCM leftovers): the banded plan refuses (span exceeds its single
    window cap) but the multi-window plan keeps the forward on the Pallas
    path with independently addressed windows; the transpose runs the
    monotone-lane sliding-window scatter kernel (round-5: multi plans are
    no longer forward-only)."""
    import linops_tpu.kernels.bsr_spmv as BK
    from linops_tpu.sparse.formats import BSR
    from linops_tpu.sparse.ops import BSROperator

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    nbrow, kmax, bm, bn = 256, 3, 8, 128
    nbcol = 4608  # span to the far cluster > banded wb_max (4096)
    cols = np.zeros((nbrow, kmax), np.int32)
    for bi in range(nbrow):
        j0 = bi // 8                      # slow band
        jc = 4400 + (bi % 16) * 8         # far-off outlier cluster
        cols[bi] = sorted([j0, j0 + 1, jc])
    blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
    data = BSR(blocks=jnp.asarray(blocks), block_cols=jnp.asarray(cols),
               shape=(nbrow * bm, nbcol * bn))
    op = BSROperator(data, backend="pallas")
    assert op.win_q is not None and op.cols_local is None
    assert op.win_q.ndim == 2 and op._wb > 0
    # the monotone-lane transpose plan must exist for this pattern (a
    # slow band lane + a revisiting outlier-cluster lane)
    assert op.win_q_t is not None and op.win_valid_t is not None
    qt = np.asarray(op.win_q_t)
    assert (np.diff(qt, axis=1) >= 0).all(), "lanes must be monotone"
    x = rng.standard_normal(nbcol * bn).astype(np.float32)
    ref = np.zeros(nbrow * bm, np.float32)
    for bi in range(nbrow):
        for k in range(kmax):
            c = cols[bi, k]
            ref[bi * bm:(bi + 1) * bm] += (
                blocks[bi, k] @ x[c * bn:(c + 1) * bn])
    np.testing.assert_allclose(np.asarray(op * x), ref,
                               rtol=3e-6, atol=3e-5)
    u = rng.standard_normal(nbrow * bm).astype(np.float32)
    reft = np.zeros(nbcol * bn, np.float32)
    for bi in range(nbrow):
        for k in range(kmax):
            c = cols[bi, k]
            reft[c * bn:(c + 1) * bn] += (
                blocks[bi, k].T @ u[bi * bm:(bi + 1) * bm])
    np.testing.assert_allclose(np.asarray(op.T @ u), reft,
                               rtol=3e-6, atol=3e-5)


def test_bsr_window_plan_multi_units():
    """Planner unit cases: dump-window lanes must be collision-free, W
    must fit, scattered patterns must refuse under a tight window cap."""
    from linops_tpu.kernels.bsr_spmv import bsr_window_plan_multi

    # two clusters far apart -> W=2 at small wb
    cols = np.stack([np.full(16, 3), np.full(16, 900)], axis=1).astype(
        np.int32)
    plan = bsr_window_plan_multi(cols, R=8, nbcol=1024, wb_max=64)
    assert plan is not None
    q, wb, xpb = plan
    assert q.shape[0] <= 4 and xpb % wb == 0
    # every real col is covered by some lane's window
    for g in range(q.shape[1]):
        for c in (3, 900):
            assert any(q[w, g] * wb <= c < (q[w, g] + 1) * wb
                       for w in range(q.shape[0]))
    # scattered: >4 clusters per group under a tight cap -> refuse
    cols_s = (np.arange(16)[:, None] * 977 % 8000).astype(np.int32)
    assert bsr_window_plan_multi(cols_s, R=16, nbcol=8192, wb_max=8,
                                 max_windows=4) is None


def test_bsr_window_plan_multi_t_units():
    """Monotone-lane transpose planner: a fixed outlier cluster gets a
    constant lane, a sliding band a monotone lane; a strictly descending
    window sequence longer than the lane count must refuse."""
    from linops_tpu.kernels.bsr_spmv import bsr_window_plan_multi_t

    # band window rises 0,0,1,1 while cluster stays at window 50; group 2
    # skips the cluster (forces a valid=0 lane repeat)
    R = 8
    cols = np.zeros((4 * R, 2), np.int32)
    for g in range(4):
        band = g // 2
        clus = 50 if g != 2 else band  # group 2: band only
        for r in range(R):
            cols[g * R + r] = sorted([band * 8 + 1, clus * 8 + 1])
    plan = bsr_window_plan_multi_t(cols, R=R, nbcol=512, wb=8, W=2)
    assert plan is not None
    q_t, valid, xpb = plan
    assert (np.diff(q_t, axis=1) >= 0).all()
    # every real window of every group is served by a valid lane
    for g in range(4):
        wins = set(np.unique(cols[g * R:(g + 1) * R] // 8))
        served = {int(q_t[w, g]) for w in range(q_t.shape[0]) if valid[w, g]}
        assert wins == served
    assert xpb % 8 == 0 and xpb >= 512

    # descending windows through more lanes than available: refuse
    cols_d = np.zeros((6 * R, 1), np.int32)
    for g in range(6):
        cols_d[g * R:(g + 1) * R, 0] = (10 - g) * 8 + 1
    assert bsr_window_plan_multi_t(cols_d, R=R, nbcol=512, wb=8, W=4) is None


def test_bsr_multiwindow_transpose_groups(monkeypatch, rng):
    """Multi-window transpose kernel across SEVERAL row groups: lane
    repeats with valid=0, window revisit-with-accumulate within a lane,
    and unvisited window blocks coming out exactly zero."""
    import linops_tpu.kernels.bsr_spmv as BK
    from linops_tpu.sparse.formats import BSR
    from linops_tpu.sparse.ops import BSROperator

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    monkeypatch.setattr(BK, "_TILE_BYTES_TARGET", 65536)  # R=16 -> 4 groups
    # shrink the single-window cap so the banded plan refuses (span ~57
    # blocks) and the multi-window plan fires with small windows.
    # kmax=8 keeps R*kmax = 128 — the lane-major cols BlockSpec must be
    # 128-divisible on real TPUs (bsr_pallas_rows_per_program snaps R)
    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_WINDOW_BLOCKS", 16)
    nbrow, kmax, bm, bn = 64, 8, 8, 128
    nbcol = 64
    cols = np.zeros((nbrow, kmax), np.int32)
    for bi in range(nbrow):
        g = bi // 16
        band = g * 3  # sliding 7-wide band
        clus = 56 if g != 2 else band + 7  # cluster absent in group 2
        cols[bi] = sorted(list(range(band, band + 7)) + [clus])
    blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
    data = BSR(blocks=jnp.asarray(blocks), block_cols=jnp.asarray(cols),
               shape=(nbrow * bm, nbcol * bn))
    op = BSROperator(data, backend="pallas")
    assert op.win_q is not None and op.cols_local is None
    assert op.win_q_t is not None
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    for bi in range(nbrow):
        for k in range(kmax):
            c = cols[bi, k]
            dense[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += blocks[bi, k]
    u = rng.standard_normal(nbrow * bm).astype(np.float32)
    yt = np.asarray(op.T @ u)
    ref = dense.T @ u
    np.testing.assert_allclose(yt, ref, rtol=3e-6, atol=3e-5)
    dead = np.abs(ref) == 0
    assert np.abs(yt[dead]).max(initial=0.0) == 0.0
    # forward stays correct through the same plan family
    x = rng.standard_normal(nbcol * bn).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op @ x), dense @ x,
                               rtol=3e-6, atol=3e-5)


def test_bsr_window_plan_refuses_real_col0_in_pad_slot():
    """Regression: a hand-built BSR can carry a REAL block at block-col 0
    in a non-first slot, which looks identical to padding from the cols
    alone; the plan must consult the block values (pads are all-zero) and
    refuse instead of silently misrouting."""
    from linops_tpu.kernels.bsr_spmv import bsr_window_plan

    cols = np.array([[30, 0]] * 16, np.int32)
    real0 = np.ones((16, 2, 8, 16), np.float32)         # slot 1 NONZERO
    padded = real0.copy(); padded[:, 1] = 0.0            # slot 1 = true pad
    assert bsr_window_plan(cols, R=8, nbcol=64) is None  # no ground truth
    assert bsr_window_plan(cols, R=8, nbcol=64, blocks=real0) is None
    assert bsr_window_plan(cols, R=8, nbcol=64, blocks=padded) is not None
    unsorted = np.array([[30, 5]] * 16, np.int32)        # plainly unsorted
    assert bsr_window_plan(unsorted, R=8, nbcol=64,
                           blocks=real0) is None


def test_bsr_windowed_transpose(monkeypatch, rng):
    """Transpose with output beyond the VMEM residency bound on a banded
    pattern routes to the sliding-window scatter kernel (interpret mode on
    CPU); unvisited window blocks must come out exactly zero (where-mask,
    not multiply) and visited ones must match the XLA path."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    import linops_tpu.kernels.bsr_spmv as BK

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    n = 40 * 128
    A = np.zeros((n, n), np.float32)
    for bi in range(n // 8):
        j0 = int(bi * 37 / (n // 8))
        for k in range(3):
            A[bi * 8:(bi + 1) * 8, (j0 + k) * 128:(j0 + k + 1) * 128] = (
                rng.standard_normal((8, 128)).astype(np.float32))
    op = lo.opSparse(scipy_sparse.csr_matrix(A), format="bsr",
                     block_shape=(8, 128), backend="pallas")
    assert op.win_q is not None and op._wb > 0
    u = rng.standard_normal(n).astype(np.float32)
    yt = np.asarray(op.T @ u)
    ref = A.T @ u
    np.testing.assert_allclose(yt, ref, rtol=3e-6, atol=3e-5)

    # a matrix whose band skips some windows: unvisited blocks stay zero
    B = np.zeros((n, n), np.float32)
    for bi in range(n // 8):
        j0 = (0 if bi < n // 16 else 30)  # jump in q
        B[bi * 8:(bi + 1) * 8, j0 * 128:(j0 + 2) * 128] = (
            rng.standard_normal((8, 256)).astype(np.float32))
    opB = lo.opSparse(scipy_sparse.csr_matrix(B), format="bsr",
                      block_shape=(8, 128), backend="pallas")
    if opB.win_q is not None:
        ytB = np.asarray(opB.T @ u)
        refB = B.T @ u
        np.testing.assert_allclose(ytB, refB, rtol=3e-6, atol=3e-5)
        dead = np.abs(refB) == 0
        assert np.abs(ytB[dead]).max(initial=0.0) == 0.0


def test_bsr_all_bf16_apply(monkeypatch, rng):
    """All-bf16 applies (bf16 blocks AND bf16 vector) through the Pallas
    kernels: the dots must accumulate f32 (Mosaic rejects bf16 matmul
    accumulators — crashed on TPU before r5) and the result keeps the
    promoted bf16 dtype."""
    from linops_tpu.sparse.formats import BSR
    from linops_tpu.sparse.ops import BSROperator

    nbrow, kmax, bm, bn = 16, 2, 8, 128
    nbcol = 4
    blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
    cols = rng.integers(0, nbcol, (nbrow, kmax)).astype(np.int32)
    data = BSR(blocks=jnp.asarray(blocks).astype(jnp.bfloat16),
               block_cols=jnp.asarray(cols), shape=(nbrow * bm, nbcol * bn))
    op = BSROperator(data, backend="pallas")
    v = rng.standard_normal(nbcol * bn).astype(np.float32)
    v16 = jnp.asarray(v).astype(jnp.bfloat16)
    y = op @ v16
    assert y.dtype == jnp.bfloat16
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    b16 = np.asarray(jnp.asarray(blocks).astype(jnp.bfloat16), np.float32)
    for bi in range(nbrow):
        for kk in range(kmax):
            dense[bi * bm:(bi + 1) * bm,
                  cols[bi, kk] * bn:(cols[bi, kk] + 1) * bn] += b16[bi, kk]
    ref = dense @ np.asarray(v16, np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               rtol=3e-2, atol=3e-1)
    u16 = jnp.asarray(rng.standard_normal(nbrow * bm).astype(np.float32)
                      ).astype(jnp.bfloat16)
    yt = op.T @ u16
    assert yt.dtype == jnp.bfloat16
    reft = dense.T @ np.asarray(u16, np.float32)
    np.testing.assert_allclose(np.asarray(yt, np.float32), reft,
                               rtol=3e-2, atol=3e-1)


def test_bsr_multiwindow_transpose_bf16(monkeypatch, rng):
    """Regression (r5 review): the multi-window transpose kernel crashed
    on bf16 blocks ('Invalid dtype for swap') because the lane-validity
    multiply re-promoted the update to f32 after the output-dtype cast."""
    import linops_tpu.kernels.bsr_spmv as BK
    from linops_tpu.sparse.formats import BSR
    from linops_tpu.sparse.ops import BSROperator

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    monkeypatch.setattr(BK, "_TILE_BYTES_TARGET", 65536)
    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_WINDOW_BLOCKS", 16)
    nbrow, kmax, bm, bn = 64, 8, 8, 128
    nbcol = 64
    cols = np.zeros((nbrow, kmax), np.int32)
    for bi in range(nbrow):
        g = bi // 16
        clus = 56 if g != 2 else g * 3 + 7
        cols[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus])
    blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
    data = BSR(blocks=jnp.asarray(blocks).astype(jnp.bfloat16),
               block_cols=jnp.asarray(cols), shape=(nbrow * bm, nbcol * bn))
    op = BSROperator(data, backend="pallas")
    assert op.win_q_t is not None
    u = rng.standard_normal(nbrow * bm).astype(np.float32)
    yt = op.T @ jnp.asarray(u).astype(jnp.bfloat16)
    assert yt.dtype == jnp.bfloat16
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    b16 = np.asarray(data.blocks, np.float32)
    for bi in range(nbrow):
        for kk in range(kmax):
            c = cols[bi, kk]
            dense[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += b16[bi, kk]
    ref = dense.T @ np.asarray(jnp.asarray(u).astype(jnp.bfloat16), np.float32)
    np.testing.assert_allclose(np.asarray(yt, np.float32), ref,
                               rtol=5e-2, atol=5e-1)


def test_rows_per_program_lane_rule():
    """R*kmax must be 128-divisible (Mosaic lane rule for the lane-major
    cols BlockSpec) for every kmax, and R stays a multiple of 8."""
    from linops_tpu.kernels.bsr_spmv import bsr_pallas_rows_per_program

    for kmax in (1, 2, 3, 5, 7, 8, 10, 16, 25, 32):
        for bm in (8, 16, 32):
            R = bsr_pallas_rows_per_program(bm, kmax, 128, 4)
            assert (R * kmax) % 128 == 0, (kmax, bm, R)
            assert R % 8 == 0 and R >= 8


def test_bsr_multiwindow_transpose_fuzz(monkeypatch, rng):
    """Property fuzz for the monotone-lane transpose planner: random
    mostly-banded patterns either get a plan whose lanes are monotone and
    cover every real window, or refuse; when planned, the interpret-mode
    kernel matches the dense oracle exactly-ish."""
    import linops_tpu.kernels.bsr_spmv as BK
    from linops_tpu.sparse.formats import BSR
    from linops_tpu.sparse.ops import BSROperator

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    monkeypatch.setattr(BK, "_TILE_BYTES_TARGET", 65536)  # R=16
    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_WINDOW_BLOCKS", 16)
    nbrow, kmax, bm, bn = 64, 8, 8, 128
    nbcol = 64
    planned = 0
    for trial in range(6):
        cols = np.zeros((nbrow, kmax), np.int32)
        base_step = int(rng.integers(1, 4))
        n_clusters = int(rng.integers(0, 3))
        clusters = rng.integers(40, nbcol - 1, size=max(n_clusters, 1))
        for bi in range(nbrow):
            g = bi // 16
            band0 = min(g * base_step, nbcol - kmax - 1)
            row = list(range(band0, band0 + kmax - n_clusters))
            for c in clusters[:n_clusters]:
                # clusters drop out for a random group (lane repeats)
                row.append(int(c) if g != int(rng.integers(0, 4))
                           else band0 + kmax)
            cols[bi] = sorted(row)[:kmax]
        blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(
            np.float32)
        op = BSROperator(
            BSR(blocks=jnp.asarray(blocks), block_cols=jnp.asarray(cols),
                shape=(nbrow * bm, nbcol * bn)), backend="pallas")
        if op.win_q_t is None:
            continue  # refusal is a legal outcome
        planned += 1
        qt = np.asarray(op.win_q_t)
        vt = np.asarray(op.win_valid_t)
        assert (np.diff(qt, axis=1) >= 0).all(), (trial, qt)
        # every real window of every group served by a valid lane
        wb = op._wb
        ngroups = qt.shape[1]
        R = nbrow // ngroups
        for g in range(ngroups):
            wins = set(np.unique(cols[g * R:(g + 1) * R] // wb))
            served = {int(qt[w, g]) for w in range(qt.shape[0])
                      if vt[w, g]}
            assert wins <= served, (trial, g, wins, served)
        u = rng.standard_normal(nbrow * bm).astype(np.float32)
        yt = np.asarray(op.T @ jnp.asarray(u))
        dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
        for bi in range(nbrow):
            for kk in range(kmax):
                c = cols[bi, kk]
                dense[bi * bm:(bi + 1) * bm,
                      c * bn:(c + 1) * bn] += blocks[bi, kk]
        ref = dense.T @ u
        np.testing.assert_allclose(yt, ref, rtol=3e-6, atol=3e-5)
    assert planned >= 2, f"only {planned} of 6 trials planned"


def test_bsr_windowed_unpacked_io(monkeypatch, rng):
    """When R is not 128-divisible (Mosaic lane rule forbids the packed
    (bm, R) kernel I/O on TPU), the windowed paths downgrade to unpacked
    (R, bm) I/O instead of losing the Pallas plan — both directions must
    stay correct through the unpacked layout."""
    import linops_tpu.kernels.bsr_spmv as BK
    from linops_tpu.sparse import ops as sparse_ops
    from linops_tpu.sparse.formats import BSR
    from linops_tpu.sparse.ops import BSROperator

    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_X_ELEMS", 2048)
    monkeypatch.setattr(BK, "_TILE_BYTES_TARGET", 65536)  # R=16
    monkeypatch.setattr(BK, "BSR_PALLAS_MAX_WINDOW_BLOCKS", 16)
    monkeypatch.setattr(sparse_ops, "_on_tpu", lambda: True)
    nbrow, kmax, bm, bn = 64, 8, 8, 128
    nbcol = 64
    cols = np.zeros((nbrow, kmax), np.int32)
    for bi in range(nbrow):
        g = bi // 16
        clus = 56 if g != 2 else g * 3 + 7
        cols[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus])
    blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
    op = BSROperator(BSR(blocks=jnp.asarray(blocks),
                         block_cols=jnp.asarray(cols),
                         shape=(nbrow * bm, nbcol * bn)), backend="pallas")
    assert op.win_q is not None, "plan must survive the lane rule"
    assert op._win_packed is False  # R=16 % 128 != 0 under the seam
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    for bi in range(nbrow):
        for kk in range(kmax):
            c = cols[bi, kk]
            dense[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += blocks[bi, kk]
    v = rng.standard_normal(nbcol * bn).astype(np.float32)
    u = rng.standard_normal(nbrow * bm).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op @ v), dense @ v,
                               rtol=3e-6, atol=3e-5)
    np.testing.assert_allclose(np.asarray(op.T @ u), dense.T @ u,
                               rtol=3e-6, atol=3e-5)
