"""Trust-region subproblem loop running END-TO-END on device.

Demonstrates the jit-composable shifted solves (round-2 capability): the
whole σ-search — L-BFGS model, shifted solve, radius check — is one
compiled program; σ is a traced value produced by the loop itself, so no
host sync happens per iteration (the consumer round-1's `float(sigma)`
blocked).

Run: JAX_PLATFORMS=cpu python examples/04_trust_region_on_device.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.qn.shifted_solve import solve_shifted_system

n, mem = 200, 8
rng = np.random.default_rng(0)

# build a forward L-BFGS model of a convex quadratic's Hessian
A = rng.standard_normal((n, n))
H_true = A @ A.T / n + np.eye(n)
B = lo.LBFGSOperator(n, mem=mem)
x = np.zeros(n)
g = H_true @ x - np.ones(n)
for _ in range(12):
    step = -0.1 * g
    x_new = x + step
    g_new = H_true @ x_new - np.ones(n)
    B.push(step, g_new - g)
    x, g = x_new, g_new


@jax.jit
def tr_subproblem(op, grad, radius):
    """Solve min gᵀp + ½pᵀBp s.t. ‖p‖ ≤ radius by a tiny on-device
    Levenberg search: grow σ until the shifted step fits the radius."""

    def cond(carry):
        _, p = carry
        return jnp.linalg.norm(p) > radius

    def body(carry):
        sigma, _ = carry
        sigma = sigma * 2.0 + 0.1
        return (sigma, solve_shifted_system(op, -grad, sigma))

    p0 = solve_shifted_system(op, -grad, 0.0)
    sigma, p = jax.lax.while_loop(cond, body, (jnp.asarray(0.0), p0))
    return p, sigma


p, sigma = tr_subproblem(B, jnp.asarray(g), 0.5)
print(f"step norm {float(jnp.linalg.norm(p)):.4f} (radius 0.5), final sigma {float(sigma):.3f}")
assert float(jnp.linalg.norm(p)) <= 0.5 + 1e-9
# the step solves the shifted system for the returned sigma
resid = (np.asarray(B.to_dense()) + float(sigma) * np.eye(n)) @ np.asarray(p) + g
assert np.linalg.norm(resid) < 1e-8 * max(1.0, np.linalg.norm(g))
print("on-device trust-region subproblem: OK")
