"""Round-5 TPU batch 25: bisect the gridded stencil-panel failure.
(1) gridded main block only (no slivers); (2) + slivers with PLAIN index
maps; (3) + clamped (max/min) index maps = the batch23 config.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch25.py > tools/tpu_r5_batch25.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

k, nx, ny, Rg = 8, 1024, 512, 128
nsteps = nx // Rg
nb8 = nx // 8
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (k, nx, ny)).astype(np.float32))


def run_case(name, kern, in_specs, args):
    try:
        out = pl.pallas_call(
            kern,
            grid=(nsteps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, nx, ny), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(*args)
        sync(out)
        print(f"{name}: OK", flush=True)
        return np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:180]}", flush=True)
        return None


def k_main(x_ref, y_ref):
    xm = x_ref[...]
    ids2 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 2)
    xe = jnp.where(ids2 < ny - 1, jnp.roll(xm, -1, axis=2), 0.0)
    ids1 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 1)
    xn = jnp.where(ids1 < Rg - 1, jnp.roll(xm, -1, axis=1), 0.0)
    y_ref[...] = 4.0 * xm - xe - xn


run_case("gridded main only     ", k_main,
         [pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)], [x])


def k_sliv(x_ref, hi_ref, y_ref):
    xm = x_ref[...]
    ids1 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 1)
    xn = jnp.where(ids1 < Rg - 1, jnp.roll(xm, -1, axis=1),
                   hi_ref[:, :1, :])
    y_ref[...] = 4.0 * xm - xn


run_case("grid + sliver plain   ", k_sliv,
         [pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((k, 8, ny), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)], [x, x])

run_case("grid + sliver clamped ", k_sliv,
         [pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((k, 8, ny),
                       lambda i: (0, jnp.minimum((i + 1) * (Rg // 8),
                                                 nb8 - 1), 0),
                       memory_space=pltpu.VMEM)], [x, x])
print(f"[t+{time.time()-t0:.0f}s] batch25 done", flush=True)
