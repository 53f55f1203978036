"""Round-5 TPU batch 26: final bisection of the stencil-panel 500.
(a) batch25 geometry + lo sliver (max-clamp, 7:8 row) + both slivers;
(b) same kernel at ny=2048 with Rg=128 (8 MB main block);
(c) same at ny=2048 with Rg=32 (2 MB main block).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch26.py > tools/tpu_r5_batch26.log 2>&1 &
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
k = 8


def full_kernel(Rg, ny, nsteps, x_ref, lo_ref, hi_ref, y_ref):
    i = pl.program_id(0)
    xm = x_ref[...]
    ids2 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 2)
    xe = jnp.where(ids2 < ny - 1, jnp.roll(xm, -1, axis=2), 0.0)
    xw = jnp.where(ids2 > 0, jnp.roll(xm, 1, axis=2), 0.0)
    ids1 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 1)
    nmask = jnp.where(i < nsteps - 1, 1.0, 0.0)
    xn = jnp.where(ids1 < Rg - 1, jnp.roll(xm, -1, axis=1),
                   nmask * hi_ref[:, :1, :])
    smask = jnp.where(i > 0, 1.0, 0.0)
    xs = jnp.where(ids1 > 0, jnp.roll(xm, 1, axis=1),
                   smask * lo_ref[:, 7:8, :])
    y_ref[...] = 4.0 * xm - xe - xw - xn - xs


def run_case(name, nx, ny, Rg):
    nsteps = nx // Rg
    nb8 = nx // 8
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (k, nx, ny)).astype(np.float32))
    try:
        out = pl.pallas_call(
            functools.partial(full_kernel, Rg, ny, nsteps),
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 8, ny),
                             lambda i: (0, jnp.maximum(
                                 i * (Rg // 8) - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 8, ny),
                             lambda i: (0, jnp.minimum(
                                 (i + 1) * (Rg // 8), nb8 - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, nx, ny), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, x, x)
        sync(out)
        # numpy oracle
        xh = np.asarray(x)
        ref = 4.0 * xh
        ref[:, :, :-1] -= xh[:, :, 1:]
        ref[:, :, 1:] -= xh[:, :, :-1]
        ref[:, :-1, :] -= xh[:, 1:, :]
        ref[:, 1:, :] -= xh[:, :-1, :]
        ok = np.allclose(np.asarray(out), ref, atol=1e-5)
        print(f"{name}: OK correct={ok}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        return False
    finally:
        print(f"[t+{time.time()-t0:.0f}s]", flush=True)


run_case("both-slivers ny=512 Rg=128 ", 1024, 512, 128)
run_case("full ny=2048 Rg=32 (2MB)   ", 2048, 2048, 32)
run_case("full ny=2048 Rg=128 (8MB)  ", 2048, 2048, 128)
print("batch26 done", flush=True)
