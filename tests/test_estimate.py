"""Stochastic trace/diagonal estimation (capability upgrade; no reference
counterpart — LinearOperators.jl leaves probe loops to clients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import linops_tpu as lo
from helpers import simple_matrix

KEY = jax.random.PRNGKey(7)


def test_hutchinson_trace_matches_dense(rng):
    A = simple_matrix(np.float64, 60, 60, rng)
    op = lo.LinearOperator(A)
    true_tr = float(np.trace(A))
    est, se = lo.estimate_trace(op, probes=4000, key=KEY, method="hutchinson")
    assert isinstance(est, float)
    assert abs(est - true_tr) < 6 * max(se, 1e-12)


def test_hutchpp_exact_on_low_rank(rng):
    # Hutch++'s sketch captures a rank-r operator exactly once the sketch
    # width exceeds r: the deflated residual is the zero operator.
    n, r = 80, 5
    U = rng.standard_normal((n, r))
    V = rng.standard_normal((n, r))
    A = U @ V.T
    op = lo.LinearOperator(A)
    est, se = lo.estimate_trace(op, probes=3 * 12, key=KEY, method="hutchpp")
    true_tr = float(np.trace(A))
    assert abs(est - true_tr) < 1e-8 * max(abs(true_tr), 1.0)
    assert se < 1e-8


def test_hutchpp_beats_hutchinson_on_decaying_spectrum(rng):
    n = 120
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = 1.0 / (1.0 + np.arange(n)) ** 2
    A = (Q * lam) @ Q.T
    op = lo.LinearOperator(A)
    true_tr = float(np.trace(A))
    errs_pp, errs_h = [], []
    for s in range(5):
        k = jax.random.PRNGKey(100 + s)
        e1, _ = lo.estimate_trace(op, probes=30, key=k, method="hutchpp")
        e2, _ = lo.estimate_trace(op, probes=30, key=k, method="hutchinson")
        errs_pp.append(abs(e1 - true_tr))
        errs_h.append(abs(e2 - true_tr))
    assert np.median(errs_pp) <= np.median(errs_h)


def test_trace_on_lazy_graph(rng):
    # estimators see only apply(): any graph node works
    n = 50
    d = jnp.asarray(rng.standard_normal(n))
    A = simple_matrix(np.float64, n, n, rng)
    graph = 2.0 * lo.opDiagonal(d) + lo.LinearOperator(A) @ lo.opEye(n, dtype=jnp.float64)
    true_tr = float(2.0 * np.sum(np.asarray(d)) + np.trace(A))
    est, se = lo.estimate_trace(graph, probes=3000, key=KEY, method="hutchinson")
    assert abs(est - true_tr) < 6 * max(se, 1e-12)


def test_trace_complex(rng):
    n = 40
    A = simple_matrix(np.complex128, n, n, rng)
    op = lo.LinearOperator(A)
    est, se = lo.estimate_trace(op, probes=3 * 20, key=KEY, method="hutchpp")
    assert isinstance(est, complex)
    true_tr = complex(np.trace(A))
    assert abs(est - true_tr) < 10 * max(se, 1e-10) + 0.3 * abs(true_tr)


def test_trace_rejects_rectangular(rng):
    A = simple_matrix(np.float64, 10, 7, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.estimate_trace(lo.LinearOperator(A))
    with pytest.raises(lo.LinearOperatorException):
        lo.estimate_diagonal(lo.LinearOperator(A))
    with pytest.raises(ValueError):
        lo.estimate_trace(lo.LinearOperator(simple_matrix(np.float64, 5, 5, rng)),
                          probes=0)
    with pytest.raises(ValueError):
        lo.estimate_trace(lo.LinearOperator(simple_matrix(np.float64, 5, 5, rng)),
                          method="nope")


def test_diagonal_exact_on_diagonal_operator(rng):
    # zero off-diagonal mass -> zero estimator variance: exact at 1 probe
    d = jnp.asarray(rng.standard_normal(64))
    est, se = lo.estimate_diagonal(lo.opDiagonal(d), probes=1, key=KEY)
    np.testing.assert_allclose(np.asarray(est), np.asarray(d), rtol=1e-12)
    assert float(jnp.max(se)) == 0.0


def test_diagonal_converges_on_dense(rng):
    A = simple_matrix(np.float64, 48, 48, rng)
    op = lo.LinearOperator(A)
    est, se = lo.estimate_diagonal(op, probes=6000, key=KEY)
    err = np.abs(np.asarray(est) - np.diag(A))
    tol = 6 * np.maximum(np.asarray(se), 1e-12)
    assert np.all(err < tol)


def test_estimators_accept_bare_matrices(rng):
    A = simple_matrix(np.float64, 16, 16, rng)
    est, _ = lo.estimate_trace(A, probes=2000, key=KEY, method="hutchinson")
    assert abs(est - np.trace(A)) < 2.0
    d, _ = lo.estimate_diagonal(A, probes=2000, key=KEY)
    assert d.shape == (16,)


def test_trace_fresh_keys_differ(rng):
    # default key=None draws OS entropy: two calls should (overwhelmingly)
    # not collide on a noisy operator
    A = simple_matrix(np.float64, 30, 30, rng)
    op = lo.LinearOperator(A)
    e1, _ = lo.estimate_trace(op, probes=4, method="hutchinson")
    e2, _ = lo.estimate_trace(op, probes=4, method="hutchinson")
    assert e1 != e2


# ---------------------------------------------------------------------------
# Stochastic Lanczos quadrature
# ---------------------------------------------------------------------------


def _spd_op(n, rng, lo_ev=0.5, hi_ev=10.0):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(lo_ev, hi_ev, n)
    A = (Q * lam) @ Q.T
    return lo.LinearOperator(A, symmetric=True, hermitian=True), lam


def test_logdet_matches_dense(rng):
    op, lam = _spd_op(120, rng)
    true_ld = float(np.sum(np.log(lam)))
    est, se = lo.estimate_logdet(op, probes=64, lanczos_steps=40, key=KEY)
    assert abs(est - true_ld) < 6 * max(se, 1e-10)


def test_spectral_sum_trace_inverse(rng):
    op, lam = _spd_op(100, rng)
    true_ti = float(np.sum(1.0 / lam))
    est, se = lo.estimate_spectral_sum(op, lambda x: 1.0 / x, probes=64,
                                       lanczos_steps=40, key=KEY)
    assert abs(est - true_ti) < 6 * max(se, 1e-10)


def test_slq_exact_on_scaled_identity():
    # Lanczos terminates at step 1 on c*I; the early-termination guard
    # must zero the decoupled nodes instead of evaluating log(0)
    op = lo.LinearOperator(3.0 * np.eye(20), symmetric=True, hermitian=True)
    est, se = lo.estimate_logdet(op, probes=2, lanczos_steps=5, key=KEY)
    assert abs(est - 20 * np.log(3.0)) < 1e-10
    assert se < 1e-10


def test_logdet_nan_on_indefinite(rng):
    S = rng.standard_normal((30, 30))
    S = S + S.T  # indefinite
    op = lo.LinearOperator(S, symmetric=True, hermitian=True)
    est, _ = lo.estimate_logdet(op, probes=4, lanczos_steps=20, key=KEY)
    assert np.isnan(est)


def test_slq_no_reorth_path(rng):
    op, lam = _spd_op(80, rng)
    true_ld = float(np.sum(np.log(lam)))
    est, se = lo.estimate_logdet(op, probes=32, lanczos_steps=40, key=KEY,
                                 reorth=False)
    # no-reorth tolerates some bias; just demand the right ballpark
    assert abs(est - true_ld) < 0.1 * abs(true_ld)


def test_spectral_sum_validation(rng):
    A = simple_matrix(np.float64, 10, 7, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.estimate_spectral_sum(lo.LinearOperator(A), jnp.log)
    S = simple_matrix(np.float64, 10, 10, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.estimate_logdet(lo.LinearOperator(S))  # hermitian flag not set


def test_hutchpp_budget_is_exact(rng):
    # review finding: probes < 3 used to silently exceed the apply budget
    A = simple_matrix(np.float64, 20, 20, rng)
    with pytest.raises(ValueError):
        lo.estimate_trace(lo.LinearOperator(A), probes=2, method="hutchpp")
    # exact budget split: m_s (A S) + m_s (A Q) + m_g (A G) block columns
    from linops_tpu.utils import estimate as est_mod

    seen = {}
    orig = est_mod._hutchpp

    def spy(op_, S, G):
        seen["cols"] = S.shape[1] * 2 + G.shape[1]
        return orig(op_, S, G)

    est_mod._hutchpp = spy
    try:
        lo.estimate_trace(lo.LinearOperator(A), probes=7, method="hutchpp", key=KEY)
    finally:
        est_mod._hutchpp = orig
    assert seen["cols"] == 7  # 2 (S) + 2 (Q) + 3 (G)


# ---------------------------------------------------------------------------
# Matrix-function action
# ---------------------------------------------------------------------------


def test_funm_apply_expm_matches_scipy(rng):
    import scipy.linalg as sla

    op, lam = _spd_op(40, rng, 0.5, 4.0)
    A = np.asarray(lo.to_dense(op))
    b = rng.standard_normal(40)
    y = lo.funm_apply(op, jnp.exp, b, lanczos_steps=40)
    y_true = sla.expm(A) @ b
    assert np.linalg.norm(np.asarray(y) - y_true) < 1e-10 * np.linalg.norm(y_true)
    # Krylov convergence: error decays fast with steps for smooth f
    errs = [np.linalg.norm(np.asarray(
        lo.funm_apply(op, jnp.exp, b, lanczos_steps=m)) - y_true)
        for m in (5, 10, 20)]
    assert errs[2] < 1e-6 * errs[0]


def test_funm_apply_inverse_equals_solve(rng):
    op, lam = _spd_op(36, rng)
    A = np.asarray(lo.to_dense(op))
    b = rng.standard_normal(36)
    y = lo.funm_apply(op, lambda x: 1.0 / x, b, lanczos_steps=36)
    np.testing.assert_allclose(np.asarray(y), np.linalg.solve(A, b),
                               rtol=1e-9, atol=1e-11)


def test_funm_apply_early_termination_guard():
    # c*I terminates Lanczos at step 1; log(0) on the decoupled nodes must
    # not poison the combination
    op = lo.LinearOperator(3.0 * np.eye(20), symmetric=True, hermitian=True)
    y = lo.funm_apply(op, jnp.log, np.ones(20), lanczos_steps=5)
    np.testing.assert_allclose(np.asarray(y), np.log(3.0) * np.ones(20),
                               rtol=1e-12)


def test_funm_apply_complex_hermitian(rng):
    import scipy.linalg as sla

    B = rng.standard_normal((20, 20)) + 1j * rng.standard_normal((20, 20))
    H = B + B.conj().T + 20 * np.eye(20)
    op = lo.LinearOperator(H, hermitian=True)
    b = rng.standard_normal(20) + 1j * rng.standard_normal(20)
    y = lo.funm_apply(op, jnp.exp, b, lanczos_steps=20)
    y_true = sla.expm(H) @ b
    assert np.linalg.norm(np.asarray(y) - y_true) < 1e-10 * np.linalg.norm(y_true)


def test_funm_apply_validation(rng):
    A = simple_matrix(np.float64, 10, 7, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.funm_apply(lo.LinearOperator(A), jnp.exp, np.ones(7))
    S = simple_matrix(np.float64, 10, 10, rng)
    with pytest.raises(lo.LinearOperatorException):
        lo.funm_apply(lo.LinearOperator(S), jnp.exp, np.ones(10))  # no flag
    op = lo.LinearOperator(S + S.T, symmetric=True, hermitian=True)
    with pytest.raises(lo.LinearOperatorException):
        lo.funm_apply(op, jnp.exp, np.ones(7))  # wrong length


def test_funm_apply_complex_b_on_real_operator(rng):
    # review finding: complex b used to be silently cast to real
    import scipy.linalg as sla

    op, lam = _spd_op(16, rng, 0.5, 3.0)
    A = np.asarray(lo.to_dense(op))
    b = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    y = lo.funm_apply(op, jnp.exp, b, lanczos_steps=16)
    y_true = sla.expm(A) @ b
    assert np.iscomplexobj(np.asarray(y))
    assert np.linalg.norm(np.asarray(y) - y_true) < 1e-9 * np.linalg.norm(y_true)


def test_funm_apply_complex_valued_f(rng):
    # review finding: exp(iA)b output used to be cast back to real
    import scipy.linalg as sla

    op, lam = _spd_op(14, rng, 0.5, 3.0)
    A = np.asarray(lo.to_dense(op))
    b = rng.standard_normal(14)
    y = lo.funm_apply(op, lambda x: jnp.exp(1j * x), b, lanczos_steps=14)
    y_true = sla.expm(1j * A) @ b
    assert np.iscomplexobj(np.asarray(y))
    assert np.linalg.norm(np.asarray(y) - y_true) < 1e-9 * np.linalg.norm(y_true)


def test_funm_apply_zero_vector_is_zero(rng):
    # review finding: b == 0 with singular f (log) returned NaN
    op, _ = _spd_op(20, rng)
    y = lo.funm_apply(op, jnp.log, np.zeros(20), lanczos_steps=10)
    np.testing.assert_array_equal(np.asarray(y), np.zeros(20))
