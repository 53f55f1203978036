"""Round-5 TPU batch 10: bf16 8x128 fine-block floor (VERDICT r4 weak #6).

Hypothesis: an (RK, 8, 128) bf16 block array is tile-padded to (16, 128)
Mosaic tiles (2x physical bytes), so the DMA moves f32-sized volume and
logical throughput halves (measured 447 GB/s vs 733 f32). Test: flatten
blocks HOST-side to 2-D (RK*8, 128) — sublane dim divisible by 16, no
padding — and reshape back in-kernel ((RK*8, 128) -> (RK, 8, 128) splits
the SUBLANE dim only; the Mosaic-rejected reshapes cross the LANE dim).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch10.py > tools/tpu_r5_batch10.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linops_tpu.kernels.bsr_spmv import (
    _onehot_gather, _group_ksum, bsr_pallas_rows_per_program)
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

ns = 65536
bm, bn, kmax = 8, 128, 8
nbrow = ns // bm
nbcol = ns // bn
blocks = jnp.asarray(
    rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
).astype(jnp.bfloat16)
cols = jnp.asarray(rng.integers(0, nbcol, size=(nbrow, kmax)).astype(np.int32))
x = jnp.ones((nbcol, bn), jnp.float32)

R = bsr_pallas_rows_per_program(bm, kmax, bn, 2)
print(f"R={R}", flush=True)


def kernel_flat(kmax, cols_ref, x_ref, blocks2_ref, y_ref):
    RKbm, _bn = blocks2_ref.shape
    RK = RKbm // bm
    xg = _onehot_gather(cols_ref, x_ref, y_ref.dtype, False)  # (RK, bn)
    b3 = blocks2_ref[...].reshape(RK, bm, _bn)  # sublane-split reshape
    z = jnp.sum(b3 * xg[:, None, :], axis=2)
    y_ref[...] = _group_ksum(z, kmax, y_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def spmv_flat(blocks2, cols_flat, xb):
    return pl.pallas_call(
        functools.partial(kernel_flat, kmax),
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((R * kmax * bm, bn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, bm), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbrow, bm), jnp.float32),
    )(cols_flat, xb, blocks2)


blocks2 = blocks.reshape(nbrow * kmax * bm, bn)
cols_flat = cols.reshape(1, nbrow * kmax)
try:
    out = spmv_flat(blocks2, cols_flat, x)
    sync(out)
    print("flat-2D bf16 kernel COMPILES", flush=True)
    # correctness vs XLA oracle
    from linops_tpu.sparse.ops import bsr_matvec

    ref = bsr_matvec(blocks, cols, x)
    rel = float(jnp.linalg.norm((out.astype(jnp.float32)
                                 - ref.astype(jnp.float32)))
                / jnp.linalg.norm(ref.astype(jnp.float32)))
    print(f"relerr vs XLA bf16 path: {rel:.2e}", flush=True)

    @jax.jit
    def chain(blocks2, cols_flat, xb, iters):
        def body(_, v):
            y = spmv_flat(blocks2, cols_flat, v)
            return (y / jnp.float32(kmax)).reshape(nbcol, bn)

        return lax.fori_loop(0, iters, body, xb)

    sync(chain(blocks2, cols_flat, x, 50))
    sync(chain(blocks2, cols_flat, x, 1050))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(chain(blocks2, cols_flat, x, 50)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(chain(blocks2, cols_flat, x, 1050)); b = time.perf_counter() - t1
        ds.append(b - a)
    t = sorted(ds)[1] / 1000
    gbs = blocks.size * 2 / t / 1e9
    print(f"flat-2D bf16 8x128: {t*1e6:.1f} us = {gbs:.1f} GB/s logical "
          f"(r4 3-D form: 447; f32: 733)", flush=True)
except Exception as e:
    print(f"flat-2D kernel FAILED: {type(e).__name__}: {str(e)[:300]}",
          flush=True)

# control: current 3-D path via the library kernel
from linops_tpu.kernels.bsr_spmv import bsr_matvec_pallas


@jax.jit
def chain3(blocks, cols, xb, iters):
    def body(_, v):
        y = bsr_matvec_pallas(blocks, cols, v)
        return (y / jnp.float32(kmax)).reshape(nbcol, bn)

    return lax.fori_loop(0, iters, body, xb)


sync(chain3(blocks, cols, x, 50))
sync(chain3(blocks, cols, x, 1050))
ds = []
for _ in range(3):
    t1 = time.perf_counter(); sync(chain3(blocks, cols, x, 50)); a = time.perf_counter() - t1
    t1 = time.perf_counter(); sync(chain3(blocks, cols, x, 1050)); b = time.perf_counter() - t1
    ds.append(b - a)
t = sorted(ds)[1] / 1000
print(f"3-D ctrl bf16 8x128: {t*1e6:.1f} us = "
      f"{blocks.size*2/t/1e9:.1f} GB/s logical", flush=True)

# regression: ALL-bf16 apply must now COMPILE (f32 accumulators patch) —
# it used to crash Mosaic with 'matmul acc must be 32-bit'
xb16 = jnp.ones((nbcol, bn), jnp.bfloat16)
try:
    yb = bsr_matvec_pallas(blocks, cols, xb16)
    sync(yb)
    print("all-bf16 apply compiles OK, out dtype", yb.dtype, flush=True)
except Exception as e:
    print(f"all-bf16 apply STILL FAILS: {type(e).__name__}: {str(e)[:200]}",
          flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch10 done", flush=True)
