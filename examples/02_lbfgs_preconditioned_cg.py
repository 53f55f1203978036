"""Quasi-Newton operators: L-BFGS as a CG preconditioner, shifted solves.

Run: PYTHONPATH=.. python 02_lbfgs_preconditioned_cg.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo

n = 400
rng = np.random.default_rng(1)
Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
A_dense = Q @ np.diag(np.linspace(1, 200, n)) @ Q.T  # SPD, cond 200
A = lo.LinearOperator(jnp.asarray(A_dense), symmetric=True, hermitian=True)
b = jnp.asarray(rng.standard_normal(n))

# Plain CG
x0, it0, res0 = lo.cg(A, b, tol=1e-8, maxiter=500)
print(f"CG:              {int(it0):3d} iterations, residual {float(res0):.2e}")

# Build an inverse L-BFGS preconditioner from (s, As) probes
H = lo.InverseLBFGSOperator(n, mem=20)
for _ in range(20):
    s = rng.standard_normal(n)
    H.push(s, A_dense @ s)  # y = A s  (secant pairs of the quadratic)

x1, it1, res1 = lo.cg(A, b, tol=1e-8, maxiter=500, M=H)
print(f"L-BFGS-PCG:      {int(it1):3d} iterations, residual {float(res1):.2e}")

# Forward L-BFGS models A itself; solve a shifted trust-region system
B = lo.LBFGSOperator(n, mem=20)
for _ in range(20):
    s = rng.standard_normal(n)
    B.push(s, A_dense @ s)
sigma = 0.5
x = lo.solve_shifted_system(B, b, sigma)
resid = jnp.linalg.norm(B * x + sigma * x - b) / jnp.linalg.norm(b)
print(f"(B + sigma I)x=b residual: {float(resid):.2e}")

# State is a pytree: checkpoint and restore
lo.save_operator("/tmp/lbfgs_state.npz", B)
B2 = lo.LBFGSOperator(n, mem=20)
lo.load_operator_state("/tmp/lbfgs_state.npz", B2)
print("restored push count:", B2.insert, "== original:", B.insert)
