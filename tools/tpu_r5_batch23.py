"""Round-5 TPU batch 23: STANDALONE prototype of a 2-D stencil panel
kernel (5-point, k=8 rows) — axis-blocked over grid rows with 8-row
boundary slivers, lane shifts via roll+iota-mask (the primitive batch22
confirmed), row shifts via sublane slices + sliver rows.

Target: the LOBPCG panel-apply floor (current shift path: 2,054 µs for
width 6; ideal ~1.13 read + 1 write passes = ~382 µs at k=8).
NOT wired into the library — feasibility + perf measurement only.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch23.py > tools/tpu_r5_batch23.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import linops_tpu as lo
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

k, nx, ny = 8, 2048, 2048
Rg = 128
nsteps = nx // Rg


def kernel(main_ref, lo_ref, hi_ref, y_ref):
    # NO .at[].add anywhere: scatter-add does not lower in Mosaic
    # (batch21); neighbors come from rolls + where-substituted boundary
    # rows (batch22 confirmed roll+mask compiles exactly)
    i = pl.program_id(0)
    xm = main_ref[...]  # (k, Rg, ny)
    ids2 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 2)
    xe = jnp.where(ids2 < ny - 1, jnp.roll(xm, -1, axis=2), 0.0)
    xw = jnp.where(ids2 > 0, jnp.roll(xm, 1, axis=2), 0.0)
    ids1 = jax.lax.broadcasted_iota(jnp.int32, xm.shape, 1)
    # north neighbor (row r+1): interior from a sublane roll, the last
    # row from the hi sliver's first row (zeroed at the global top edge)
    nmask = jnp.where(i < nsteps - 1, 1.0, 0.0)
    xn = jnp.where(ids1 < Rg - 1, jnp.roll(xm, -1, axis=1),
                   nmask * hi_ref[:, :1, :])
    # south neighbor (row r-1): interior roll, first row from the lo
    # sliver's last row (zeroed at the global bottom edge)
    smask = jnp.where(i > 0, 1.0, 0.0)
    xs = jnp.where(ids1 > 0, jnp.roll(xm, 1, axis=1),
                   smask * lo_ref[:, 7:8, :])
    y_ref[...] = 4.0 * xm - xe - xw - xn - xs


@jax.jit
def stencil_panel(X3):  # (k, nx, ny)
    nb8 = nx // 8

    def lo_map(i):
        return (0, jnp.maximum(i * (Rg // 8) - 1, 0), 0)

    def hi_map(i):
        return (0, jnp.minimum((i + 1) * (Rg // 8), nb8 - 1), 0)

    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, ny), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, ny), hi_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, Rg, ny), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, nx, ny), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(X3, X3, X3)


rng = np.random.default_rng(0)
L = lo.laplacian_2d(nx, ny, dtype=jnp.float32)
Mt = jnp.asarray(rng.standard_normal((k, nx * ny)).astype(np.float32))
try:
    Y = stencil_panel(Mt.reshape(k, nx, ny)).reshape(k, nx * ny)
    sync(Y)
    ref = L.apply_matrix_t(Mt, "N")
    rel = float(jnp.linalg.norm(Y - ref) / jnp.linalg.norm(ref))
    print(f"stencil panel kernel: COMPILES, relerr vs library {rel:.2e}",
          flush=True)

    @jax.jit
    def chain(M, iters):
        def body(_, Mc):
            Y = stencil_panel(Mc.reshape(k, nx, ny)).reshape(k, nx * ny)
            return Y * lax.rsqrt(jnp.sum(Y * Y) / (nx * ny))

        return lax.fori_loop(0, iters, body, M)

    sync(chain(Mt, 10)); sync(chain(Mt, 110))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(chain(Mt, 10)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(chain(Mt, 110)); b = time.perf_counter() - t1
        ds.append(b - a)
    t = sorted(ds)[1] / 100
    print(f"panel apply width {k}: {t*1e6:.1f} us (library shift path: "
          f"w8 ~2600, ideal ~382)", flush=True)
except Exception as e:
    print(f"stencil panel kernel FAIL: {type(e).__name__}: "
          f"{str(e)[:400]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch23 done", flush=True)
