"""Rectangular operators + on-device LSQR: matrix-free least squares.

A downsampling measurement model is written as an operator graph
R @ Blur (no dense matrix is ever formed); the damped least-squares
reconstruction runs as ONE compiled while_loop via lo.lsqr — only
forward and adjoint applies of the graph are needed.

Run: PYTHONPATH=/root/repo python examples/05_least_squares.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import linops_tpu as lo

n = 4096          # signal length
m = n // 2        # number of measurements

# Blur: symmetric tridiagonal smoothing as a DIA (banded) operator
blur = lo.opDIA(jnp.stack([jnp.full((n,), 0.25),
                           jnp.full((n,), 0.5),
                           jnp.full((n,), 0.25)]),
                offsets=(-1, 0, 1))

# Subsampling: every 2nd sample, as a restriction operator (neighboring
# measurements share blur support, so the normal equations are coupled)
rows = jnp.arange(0, n, 2)
A = lo.opRestriction(rows, n) @ blur          # (m, n) lazy graph
print("model:", A.shape, "graph:", type(A).__name__)

# Ground truth: a few steps
rng = np.random.default_rng(0)
x_true = np.zeros(n)
for _ in range(12):
    i, j = sorted(rng.integers(0, n, 2))
    x_true[i:j] += rng.standard_normal()
b = A.apply(jnp.asarray(x_true), "N")
b = b + 0.01 * jnp.asarray(rng.standard_normal(m))   # measurement noise

# Damped LSQR, entirely on device
x, iters, arnorm = lo.lsqr(A, b, damp=0.05, tol=1e-10, maxiter=400)
res = float(jnp.linalg.norm(A.apply(x, "N") - b))
print(f"lsqr: {int(iters)} iterations, ||Ax-b|| = {res:.4f}, "
      f"||A'r|| est = {float(arnorm):.2e}")

# Oracle check against the dense normal equations
Ad = np.asarray(A.to_dense())
x_ref = np.linalg.solve(Ad.T @ Ad + 0.05**2 * np.eye(n), Ad.T @ np.asarray(b))
err = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
print(f"vs dense Tikhonov oracle: rel err {err:.2e}")
assert err < 1e-6
print("ok")
