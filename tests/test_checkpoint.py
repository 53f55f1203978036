"""Checkpoint/resume tests (capability upgrade over the reference, which has
none — SURVEY.md §5)."""

import numpy as np
import pytest

import linops_tpu as lo
from linops_tpu.utils.checkpoint import save_operator, load_operator_state


def test_lbfgs_checkpoint_roundtrip(tmp_path, rng):
    n = 20
    B = lo.LBFGSOperator(n, mem=5)
    for _ in range(7):
        B.push(rng.random(n), rng.random(n))
    ref = np.asarray(B.to_dense())

    path = str(tmp_path / "lbfgs.npz")
    save_operator(path, B)

    B2 = lo.LBFGSOperator(n, mem=5)
    load_operator_state(path, B2)
    np.testing.assert_array_equal(np.asarray(B2.to_dense()), ref)
    assert B2.insert == B.insert
    # resumed operator keeps accepting pushes
    B.push(rng.random(n), rng.random(n))
    B2.push(*(lambda s, y: (s, y))(np.zeros(n) + 0.0, np.zeros(n)))  # rejected
    assert B2.insert == B.insert - 1 if B.insert > 0 else True


def test_structure_mismatch_rejected(tmp_path, rng):
    B = lo.LBFGSOperator(10, mem=3)
    path = str(tmp_path / "b.npz")
    save_operator(path, B)
    with pytest.raises(ValueError):
        load_operator_state(path, lo.LSR1Operator(10, mem=3))
    with pytest.raises(ValueError):
        load_operator_state(path, lo.LBFGSOperator(12, mem=3))


def test_sparse_checkpoint(tmp_path, rng):
    A = (rng.random((30, 30)) < 0.2) * rng.standard_normal((30, 30))
    op = lo.opSparse(A, format="csr")
    path = str(tmp_path / "csr.npz")
    save_operator(path, op)
    op2 = lo.opSparse(A * 0.0 + np.where(A != 0, 1.0, 0.0), format="csr")  # same pattern
    load_operator_state(path, op2)
    v = rng.standard_normal(30)
    np.testing.assert_allclose(np.asarray(op2 * v), A @ v, rtol=1e-10)


def test_bfloat16_checkpoint_roundtrip(tmp_path, rng):
    """bf16 (ml_dtypes) state round-trips bit-exactly."""
    import jax.numpy as jnp

    d = jnp.asarray(rng.random(16), jnp.bfloat16)
    op = lo.opDiagonal(d)
    path = str(tmp_path / "bf16.npz")
    save_operator(path, op)
    op2 = lo.opDiagonal(jnp.zeros(16, jnp.bfloat16))
    load_operator_state(path, op2)
    assert op2.d.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(op2.d).view(np.uint16), np.asarray(d).view(np.uint16)
    )
