"""Round-5 TPU batch 22: (a) lane-shift via jnp.roll in Mosaic (retry of
the misaligned-slice probe without scatter-add); (b) lobpcg basis
crossover: gram vs direct at k=4 (k=2: gram 4.5 vs direct 7.5 ms;
k=8: gram 17.7 vs direct ~13.2).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch22.py > tools/tpu_r5_batch22.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import linops_tpu as lo
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()


def k_roll(x_ref, y_ref):
    x = x_ref[...]
    xl = jnp.roll(x, -1, axis=1)
    xr = jnp.roll(x, 1, axis=1)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xl = jnp.where(ids < x.shape[1] - 1, xl, 0.0)
    xr = jnp.where(ids > 0, xr, 0.0)
    y_ref[...] = 2.0 * x + xl + xr


try:
    x = jnp.asarray(np.arange(8 * 512, dtype=np.float32).reshape(8, 512))
    out = pl.pallas_call(
        k_roll,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(x)
    sync(out)
    xh = np.asarray(x)
    ref = xh * 2.0
    ref[:, :-1] += xh[:, 1:]
    ref[:, 1:] += xh[:, :-1]
    print(f"in-kernel lane roll+mask: COMPILES, "
          f"correct={np.allclose(np.asarray(out), ref)}", flush=True)
except Exception as e:
    print(f"in-kernel lane roll: FAIL {type(e).__name__}: "
          f"{str(e)[:200]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

ng = 2048
Ast = lo.laplacian_2d(ng, ng, dtype=jnp.float32)
for k in (4,):
    for basis in ("gram", "direct"):
        def run(mi):
            t1 = time.perf_counter()
            sync(lo.lobpcg(Ast, k=k, largest=True, tol=0.0, maxiter=mi,
                           key=jax.random.PRNGKey(0), basis=basis)[0])
            return time.perf_counter() - t1

        run(10); run(160)
        ds = []
        for _ in range(3):
            a = run(10)
            b = run(160)
            ds.append(max(b - a, 1e-9) / 150)
        print(f"lobpcg_us_per_iter_k{k}[{basis}] {sorted(ds)[1]*1e6:.1f}",
              flush=True)
        print(f"[t+{time.time()-t0:.0f}s]", flush=True)
# also direct at k=8 for a same-session number
for k in (8,):
    def run(mi):
        t1 = time.perf_counter()
        sync(lo.lobpcg(Ast, k=k, largest=True, tol=0.0, maxiter=mi,
                       key=jax.random.PRNGKey(0), basis="direct")[0])
        return time.perf_counter() - t1

    run(10); run(160)
    ds = []
    for _ in range(3):
        a = run(10)
        b = run(160)
        ds.append(max(b - a, 1e-9) / 150)
    print(f"lobpcg_us_per_iter_k8[direct] {sorted(ds)[1]*1e6:.1f}",
          flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch22 done", flush=True)
