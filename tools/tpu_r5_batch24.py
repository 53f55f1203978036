"""Round-5 TPU batch 24: bisect the stencil-panel Mosaic HTTP 500.

Five micro-kernels on a (8, 128, 512) block: (1) 3-D lane roll axis=2,
(2) 3-D sublane roll axis=1, (3) where-broadcast of a (8, 1, 512) row,
(4) multi-size in_specs on the same array, (5) all combined.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch24.py > tools/tpu_r5_batch24.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

k, R, ny = 8, 128, 512
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (k, R, ny)).astype(np.float32))


def try_kernel(name, kern, n_in=1):
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, R, ny), jnp.float32),
        )(*([x] * n_in))
        sync(out)
        return np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        return None


def k1(x_ref, y_ref):
    y_ref[...] = jnp.roll(x_ref[...], -1, axis=2)


o = try_kernel("3-D lane roll axis=2 ", k1)
if o is not None:
    print("3-D lane roll axis=2 : OK correct=",
          np.allclose(o, np.roll(np.asarray(x), -1, axis=2)), flush=True)


def k2(x_ref, y_ref):
    y_ref[...] = jnp.roll(x_ref[...], -1, axis=1)


o = try_kernel("3-D sublane roll ax=1", k2)
if o is not None:
    print("3-D sublane roll ax=1: OK correct=",
          np.allclose(o, np.roll(np.asarray(x), -1, axis=1)), flush=True)


def k3(x_ref, y_ref):
    xm = x_ref[...]
    ids1 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 1)
    y_ref[...] = jnp.where(ids1 < R - 1, xm, xm[:, :1, :])


o = try_kernel("where-broadcast row  ", k3)
if o is not None:
    ref = np.asarray(x).copy()
    ref[:, R - 1, :] = np.asarray(x)[:, 0, :]
    print("where-broadcast row  : OK correct=", np.allclose(o, ref),
          flush=True)


def k5(xa, xb, y_ref):
    xm = xa[...]
    ids2 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 2)
    xe = jnp.where(ids2 < ny - 1, jnp.roll(xm, -1, axis=2), 0.0)
    ids1 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 1)
    xn = jnp.where(ids1 < R - 1, jnp.roll(xm, -1, axis=1), xb[:, :1, :])
    y_ref[...] = 4.0 * xm - xe - xn


o = try_kernel("combined no-sliver   ", k5, n_in=2)
if o is not None:
    print("combined no-sliver   : OK", flush=True)

print(f"[t+{time.time()-t0:.0f}s] batch24 done", flush=True)
