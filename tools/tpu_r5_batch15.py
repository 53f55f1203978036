"""Round-5 TPU batch 15: stencil panel apply via lax.map (sequential
VMEM-fused per-vector applies) + the resulting LOBPCG gram-iteration cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch15.py > tools/tpu_r5_batch15.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import linops_tpu as lo
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

ng = 2048
op = lo.laplacian_2d(ng, ng, dtype=jnp.float32)
n = ng * ng

for width in (2, 6, 8):
    M0 = jnp.ones((width, n), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def ap_chain(op, M, iters):
        def stepa(_, Mc):
            Mc = op.apply_matrix_t(Mc, "N")
            return Mc * lax.rsqrt(jnp.sum(Mc * Mc) / n)

        return lax.fori_loop(0, iters, stepa, M)

    sync(ap_chain(op, M0, 10)); sync(ap_chain(op, M0, 110))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(ap_chain(op, M0, 10)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(ap_chain(op, M0, 110)); b = time.perf_counter() - t1
        ds.append(b - a)
    t = sorted(ds)[1] / 100
    print(f"apply_t width {width}: {t*1e6:8.1f} us"
          f"  (r5-pre: w2 430, w6 2054; flat matvec 57.9)", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)


def run(mi):
    t1 = time.perf_counter()
    sync(lo.lobpcg(op, k=2, largest=True, tol=0.0, maxiter=mi,
                   key=jax.random.PRNGKey(0))[0])
    return time.perf_counter() - t1


run(10); run(310)
ds = []
for _ in range(3):
    a = run(10)
    b = run(310)
    ds.append(max(b - a, 1e-9) / 300)
print(f"lobpcg_us_per_iter_k2[gram+map] {sorted(ds)[1]*1e6:.1f}"
      f"  (gram pre-map: 4467; direct: 7482)", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch15 done", flush=True)
