"""Round-5 TPU batch 21: Mosaic primitive probes for a future stencil
panel kernel + LOBPCG k-sweep with the gram basis.

(a) does an in-kernel MISALIGNED LANE SLICE (x[:, 1:]) compile? (the r4
    lore covers .T yes / lane-crossing reshape no; offset lane slices
    untested — they are the key primitive for an axis-blocked 2-D
    stencil panel kernel)
(b) lobpcg gram per-iter at k=8 (doc refresh; old direct numbers: 13.2ms)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch21.py > tools/tpu_r5_batch21.log 2>&1 &
"""
import functools
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


def k_slice(x_ref, y_ref):
    x = x_ref[...]
    # shifted-add with a misaligned lane slice: y[:, :-1] uses x[:, 1:]
    y = x * 2.0
    y = y.at[:, :-1].add(x[:, 1:])
    y = y.at[:, 1:].add(x[:, :-1])
    y_ref[...] = y


try:
    x = jnp.asarray(np.arange(8 * 512, dtype=np.float32).reshape(8, 512))
    out = pl.pallas_call(
        k_slice,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(x)
    sync(out)
    xh = np.asarray(x)
    ref = xh * 2.0
    ref[:, :-1] += xh[:, 1:]
    ref[:, 1:] += xh[:, :-1]
    ok = np.allclose(np.asarray(out), ref)
    print(f"misaligned lane slice: COMPILES, correct={ok}", flush=True)
except Exception as e:
    print(f"misaligned lane slice: FAIL {type(e).__name__}: "
          f"{str(e)[:250]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# (b) lobpcg k-sweep with gram basis
ng = 2048
Ast = lo.laplacian_2d(ng, ng, dtype=jnp.float32)
for k in (8,):
    def run(mi):
        t1 = time.perf_counter()
        sync(lo.lobpcg(Ast, k=k, largest=True, tol=0.0, maxiter=mi,
                       key=jax.random.PRNGKey(0))[0])
        return time.perf_counter() - t1

    run(10); run(160)
    ds = []
    for _ in range(3):
        a = run(10)
        b = run(160)
        ds.append(max(b - a, 1e-9) / 150)
    print(f"lobpcg_us_per_iter_k{k}[gram] {sorted(ds)[1]*1e6:.1f}"
          f"  (direct r3: k8=13200)", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch21 done", flush=True)
