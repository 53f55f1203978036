"""Round-5 TPU batch 14: one-hot gather with EXPLICIT bf16 operands.

The 3-pass hi/mid/lo split terms are all exactly bf16-representable
(8-mantissa-bit pieces) and the 0/1 selector is trivially so — casting
them to bf16 forces one TRUE MXU pass per dot instead of whatever
multi-pass decomposition DEFAULT-on-f32 lowers to. Bit-identical output,
potentially 3x less MXU gather work (the exposed cost at bf16 8x128).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch14.py > tools/tpu_r5_batch14.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import linops_tpu.kernels.bsr_spmv as BK
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

ns = 65536
bm, bn, kmax = 8, 128, 8
nbrow, nbcol = ns // bm, ns // bn
blocks_f32 = jnp.asarray(
    rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32))
blocks_b16 = blocks_f32.astype(jnp.bfloat16)
cols = jnp.asarray(rng.integers(0, nbcol, size=(nbrow, kmax)).astype(np.int32))
x = jnp.ones((nbcol, bn), jnp.float32)


def onehot_gather_b16(cols_ref, x_ref, out_dtype, fast, col_offset=0):
    c = cols_ref[...]
    if c.shape[0] == 1:
        c = c.T
    RK = c.shape[0]
    wb = x_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (RK, wb), 1) + col_offset
    sel = (ids == c).astype(jnp.bfloat16)

    def dot(m):
        return jax.lax.dot_general(
            sel, m.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    xv = x_ref[...]
    x_hi = xv.astype(jnp.bfloat16).astype(xv.dtype)
    r1 = xv - x_hi
    x_mid = r1.astype(jnp.bfloat16).astype(xv.dtype)
    out = dot(x_hi) + dot(x_mid)
    if fast:
        return out
    x_lo = r1 - x_mid
    return out + dot(x_lo)


def kernel_b16(kmax, fast, cols_ref, x_ref, blocks_ref, y_ref):
    RK, bm_, bn_ = blocks_ref.shape
    xg = onehot_gather_b16(cols_ref, x_ref, jnp.float32, fast)
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)
    y_ref[...] = BK._group_ksum(z, kmax, jnp.float32).astype(y_ref.dtype)


def spmv(blocks, fast):
    R = BK.bsr_pallas_rows_per_program(bm, kmax, bn, blocks.dtype.itemsize)
    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    cols_flat = cols.reshape(1, nbrow * kmax)

    @jax.jit
    def run(xb):
        return pl.pallas_call(
            functools.partial(kernel_b16, kmax, fast),
            grid=(nbrow // R,),
            in_specs=[
                pl.BlockSpec((1, R * kmax), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((R * kmax, bm, bn), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, bm), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nbrow, bm), jnp.float32),
        )(cols_flat, xb, blocks_flat)

    return run


def timeit(run):
    @jax.jit
    def chain(xb, iters):
        def body(_, v):
            return (run(v) / jnp.float32(kmax)).reshape(nbcol, bn)

        return lax.fori_loop(0, iters, body, xb)

    sync(chain(x, 50)); sync(chain(x, 1050))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(chain(x, 50)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(chain(x, 1050)); b = time.perf_counter() - t1
        ds.append(b - a)
    return sorted(ds)[1] / 1000


# bit-exactness vs the library path first
xr = jnp.asarray(rng.standard_normal((nbcol, bn)).astype(np.float32))
run_b16 = spmv(blocks_b16, fast=False)
y_new = run_b16.__wrapped__(xr) if hasattr(run_b16, "__wrapped__") else run_b16(xr)
y_lib = BK.bsr_matvec_pallas(blocks_b16, cols, xr)
print("bitexact vs library kernel:",
      bool(jnp.all(y_new == y_lib)), flush=True)

for name, blocks in (("bf16", blocks_b16), ("f32 ", blocks_f32)):
    for fast in (False, True):
        t = timeit(spmv(blocks, fast))
        gbs = blocks.size * blocks.dtype.itemsize / t / 1e9
        print(f"{name} fast={fast!s:5s} {t*1e6:7.1f} us = {gbs:6.1f} GB/s"
              f" (r4: bf16 447/579fast, f32 733)", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)
print("batch14 done", flush=True)
