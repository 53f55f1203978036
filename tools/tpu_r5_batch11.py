"""Round-5 TPU batch 11: LOBPCG gram-basis per-iteration cost (bench
methodology) + convergence sanity on-chip, then the bf16 flat-2D probe.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch11.py > tools/tpu_r5_batch11.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

ng = 2048
Ast = lo.laplacian_2d(ng, ng, dtype=jnp.float32)


def run(mi, basis):
    t1 = time.perf_counter()
    sync(lo.lobpcg(Ast, k=2, largest=True, tol=0.0, maxiter=mi,
                   key=jax.random.PRNGKey(0), basis=basis)[0])
    return time.perf_counter() - t1


for basis in ("gram", "direct"):
    run(10, basis); run(310, basis)
    ds = []
    for _ in range(3):
        a = run(10, basis)
        b = run(310, basis)
        ds.append(max(b - a, 1e-9) / 300)
    print(f"lobpcg_us_per_iter_k2[{basis}] {sorted(ds)[1]*1e6:.1f}"
          f"  (r4: 7488; target <=5000)", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# convergence sanity on-chip (f32, tol>0): largest eigs of the stencil
th, X, res, it = lo.lobpcg(Ast, k=2, largest=True, tol=1e-4, maxiter=300,
                           key=jax.random.PRNGKey(1))
print("gram converged:", np.asarray(th), "res", np.asarray(res),
      "iters", int(it), flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch11 done", flush=True)
