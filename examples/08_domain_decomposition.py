"""2-D domain decomposition: a Poisson solve and eigenmodes across a mesh.

The (ny, nx) grid tiles over a (gy, gx) device mesh; each apply moves
only four one-cell edge strips between neighbors (4 ppermutes, zero
gathers — the compiled-HLO audit below proves it). CG and LOBPCG run
their whole loops on-device over the decomposed operator.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
         python examples/08_domain_decomposition.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.parallel import (collective_counts, make_mesh2d,
                                 stencil_partition_2d)

mesh = make_mesh2d(4, 2)  # 8 devices as a (gy=4, gx=2) grid
ny, nx = 64, 32
L = stencil_partition_2d([4.0, -1.0, -1.0, -1.0, -1.0], ny, nx, mesh)
print(L)

# the apply's collective schedule is an explicit, testable contract
counts = collective_counts(lambda o, x: o @ x, L, jnp.ones((ny * nx,)))
print(f"collectives per apply: {counts['collective-permute']} permutes, "
      f"{counts['all-gather']} gathers")

# Poisson problem: point source in grid space -> blocked vector layout
F = jnp.zeros((ny, nx)).at[ny // 2, nx // 2].set(1.0)
b = L.grid_to_vec(F)
x, iters, res = lo.cg(L, b, tol=1e-10, maxiter=2000)
U = L.vec_to_grid(x)
print(f"poisson: {int(iters)} CG iterations, residual {float(res):.2e}, "
      f"peak potential {float(jnp.max(U)):.4f}")

# lowest eigenmodes of the decomposed Laplacian vs the analytic spectrum
theta, X, _, it = lo.lobpcg(L, k=2, tol=1e-8, maxiter=800,
                            key=jax.random.PRNGKey(0))
hy, hx = np.pi / (ny + 1), np.pi / (nx + 1)
lam0 = 4 - 2 * np.cos(hy) - 2 * np.cos(hx)
print(f"ground modes: {np.asarray(theta)} (analytic lambda_0 = {lam0:.6f}, "
      f"{it} iterations)")
