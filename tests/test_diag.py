"""Diagonal quasi-Newton family tests (reference: test/test_diag.jl)."""

import numpy as np
import pytest

import linops_tpu as lo
from linops_tpu.qn.diagonal import (
    DiagonalPSB,
    DiagonalAndrei,
    SpectralGradient,
    DiagonalBFGS,
)

# Points (reference test/test_diag.jl:40-41)
x0 = np.array([-1.0, 1.0, -1.0])
x1 = x0 + np.array([1.0, 0.0, 1.0])


def grad_f(x):
    return 2 * np.array([x[0], x[1], x[2]])


def grad_g(x):
    return np.array([np.exp(x[0]), 1.0, -np.sin(x[2])])


def grad_h(x):
    return np.array(
        [
            2 * x[0] * x[1] * x[2] ** 3,
            x[0] ** 2 * x[2] ** 3,
            3 * x[0] ** 2 * x[1] * x[2] ** 2,
        ]
    )


GRADS = [grad_f, grad_g, grad_h]


@pytest.mark.parametrize("grad", GRADS)
@pytest.mark.parametrize("cls", [DiagonalAndrei, DiagonalPSB])
def test_weak_secant_equation(grad, cls):
    """⟨s, Bs⟩ = ⟨s, y⟩ after one push (reference test/test_diag.jl:53-74)."""
    s = x1 - x0
    y = grad(x1) - grad(x0)
    B = cls(np.array([1.0, -1.0, 1.0]))
    B.push(s, y)
    assert abs(np.dot(s, np.asarray(B * s)) - np.dot(s, y)) <= 1e-10


def test_hardcoded_values():
    """Hard-coded update results (reference test/test_diag.jl:76-109)."""
    Bref = {
        "f": {
            DiagonalPSB: [2, -1, 2],
            DiagonalAndrei: [2, -2, 2],
        },
        "g": {
            DiagonalPSB: [
                1 + (np.sin(-1) - np.exp(-1) - 1) / 2,
                -1,
                1 + (np.sin(-1) - np.exp(-1) - 1) / 2,
            ],
            DiagonalAndrei: [
                (1 + np.sin(-1) - np.exp(-1)) / 2,
                -2,
                (1 + np.sin(-1) - np.exp(-1)) / 2,
            ],
        },
        "h": {
            DiagonalPSB: [-5 / 2, -1, -5 / 2],
            DiagonalAndrei: [-5 / 2, -2, -5 / 2],
        },
    }
    Bref_spg = {
        "f": 2,
        "g": (1 - np.exp(-1) + np.sin(-1)) / 2,
        "h": -5 / 2,
    }

    for name, grad in [("f", grad_f), ("g", grad_g), ("h", grad_h)]:
        s = x1 - x0
        y = grad(x1) - grad(x0)
        for cls in (DiagonalPSB, DiagonalAndrei):
            B = cls(np.array([1.0, -1.0, 1.0]))
            B.push(s, y)
            assert np.linalg.norm(np.asarray(B.d) - np.asarray(Bref[name][cls])) <= 1e-10
        B = SpectralGradient(1.0, 3)
        B.push(s, y)
        assert abs(B.sigma - Bref_spg[name]) <= 1e-10


def test_reset():
    """reset → identity apply (reference test/test_diag.jl:130-144)."""
    B = DiagonalAndrei(np.array([1.0, -1.0, 1.0]))
    s = x1 - x0
    y = grad_f(x1) - grad_f(x0)
    B.push(s, y)
    B.reset()
    np.testing.assert_array_equal(np.asarray(B * x0), x0)

    B = SpectralGradient(2.5, 3)
    B.push(s, y)
    B.reset()
    np.testing.assert_array_equal(np.asarray(B * x0), x0)


def test_push_zero_s_errors():
    B = DiagonalPSB(np.ones(3))
    with pytest.raises(ValueError):
        B.push(np.zeros(3), np.ones(3))
    S = SpectralGradient(1.0, 3)
    with pytest.raises(ValueError):
        S.push(np.zeros(3), np.ones(3))


def test_dbfgs_update(rng):
    """DiagonalBFGS: d = |y|·Σ|y|/(sᵀy/‖s‖²)
    (reference src/DiagonalHessianApproximation.jl:234-248)."""
    n = 5
    d = rng.random(n)
    B = DiagonalBFGS(d)
    s = rng.random(n) + 0.5
    y = rng.random(n) + 0.5
    B.push(s, y)
    sT_y = np.dot(s, y) / np.dot(s, s)
    expected = np.abs(y) * (np.sum(np.abs(y)) / sT_y)
    np.testing.assert_allclose(np.asarray(B.d), expected, rtol=1e-12)


def test_no_recompile_across_pushes(rng):
    """Pushes and applies hit the jit cache (reference allocation tests,
    test/test_diag.jl:111-128)."""
    n = 16
    ops = [
        DiagonalAndrei(rng.random(n)),
        DiagonalPSB(rng.random(n)),
        SpectralGradient(rng.random() + 0.1, n),
        DiagonalBFGS(rng.random(n)),
    ]
    v = rng.random(n)
    for op in ops:
        op.push(rng.random(n) + 0.1, rng.random(n))
        op.matvec(v)
    before = lo.apply_cache_sizes()
    for op in ops:
        op.push(rng.random(n) + 0.1, rng.random(n))
        op.matvec(v)
    assert lo.apply_cache_sizes() == before


def test_spectral_gradient_invalid_sigma():
    with pytest.raises(ValueError):
        SpectralGradient(0.0, 3)
    with pytest.raises(ValueError):
        SpectralGradient(-1.0, 3)


def test_diag_qn_is_operator(rng):
    """Participates in lazy algebra; symmetric/hermitian flags set."""
    n = 6
    B = DiagonalPSB(rng.random(n))
    assert B.symmetric and B.hermitian
    dense = np.diag(np.asarray(B.d))
    v = rng.random(n)
    np.testing.assert_allclose(np.asarray((2.0 * B.T) * v), 2 * dense @ v, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(B.to_dense()), dense, rtol=1e-12)
