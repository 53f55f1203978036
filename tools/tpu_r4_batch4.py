"""Round-4 TPU batch 4: windowed-FORWARD gap attack (440 -> >=600 GB/s?).

Variants at n=4.2M banded (kmax=2, same operator as batch 3):
  A. current kernel (cols as (RK,1): 128x lane padding in HBM = ~0.5 MB/step)
  B. cols lane-major (1, RK) + in-kernel transpose (the T kernel's layout;
     8x sublane padding only)
  C. B + fast=True (2-pass bf16 gather split)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch4.py > /tmp/r4b4.log 2>&1 &
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import linops_tpu as lo
from linops_tpu.kernels.bsr_spmv import (
    _fwd_kernel_onehot_win, _group_ksum, _onehot_gather_offset,
    bsr_windowed_rows_per_program)
from linops_tpu.sparse.formats import BSR
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)

n = 1 << 22
bm, bn, kmax = 8, 128, 2
nbrow = n // bm
nbcol = n // bn
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
block_cols = (q0[:, None] + np.arange(kmax)[None, :]).astype(np.int32)
block_cols = np.minimum(block_cols, nbcol - 1)


@functools.partial(jax.jit, donate_argnums=0)
def _fill(buf, piece, start):
    return jax.lax.dynamic_update_slice(buf, piece, (start, 0, 0, 0))


PIECES = 8
blocks = jnp.zeros((nbrow, kmax, bm, bn), jnp.float32)
step = nbrow // PIECES
for i in range(PIECES):
    piece = jax.random.normal(jax.random.PRNGKey(i), (step, kmax, bm, bn),
                              jnp.float32)
    blocks = _fill(blocks, piece, i * step)
    del piece
sync(blocks)

data = BSR(blocks=blocks, block_cols=jnp.asarray(block_cols), shape=(n, n))
op = BSROperator(data)
assert op.win_q is not None
wb, xpb = op._wb, op._x_pad_blocks
R = bsr_windowed_rows_per_program(bm, kmax, bn, 4, nbrow)
print(f"wb={wb} xpb={xpb} R={R}", flush=True)

x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
xb = x.reshape(nbcol, bn)
if xb.shape[0] < xpb:
    xb = jnp.pad(xb, ((0, xpb - xb.shape[0]), (0, 0)))

blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
cols_rk1 = op.cols_local.reshape(nbrow * kmax, 1)
cols_1rk = op.cols_local.reshape(1, nbrow * kmax)
win_q = op.win_q


def kern_lanecols(kmax_, fast, q_ref, cols_ref, xlo_ref, xhi_ref,
                  blocks_ref, y_ref):
    # cols arrive (1, RK) lane-major; transpose to the (RK, 1) selector
    # orientation in-kernel (4 KB relayout vs ~0.5 MB/step of HBM padding)
    c = cols_ref[...].T  # (RK, 1)
    RK, bm_, bn_ = blocks_ref.shape
    wb_ = xlo_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (RK, wb_), 1)
    xg = _onehot_gather_offset_c(c, ids, xlo_ref, y_ref.dtype, fast, 0)
    xg = xg + _onehot_gather_offset_c(c, ids, xhi_ref, y_ref.dtype, fast, wb_)
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)
    y_ref[...] = _group_ksum(z, kmax_, y_ref.dtype)


def _onehot_gather_offset_c(c, ids, x_ref, out_dtype, fast, off):
    sel = ((ids + off) == c).astype(x_ref.dtype)

    def dot(m):
        return jax.lax.dot_general(
            sel, m, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=out_dtype)

    xv = x_ref[...]
    x_hi = xv.astype(jnp.bfloat16).astype(xv.dtype)
    r1 = xv - x_hi
    x_mid = r1.astype(jnp.bfloat16).astype(xv.dtype)
    out = dot(x_hi) + dot(x_mid)
    if fast:
        return out
    return out + dot(r1 - x_mid)


@functools.partial(jax.jit, static_argnames=("fast",))
def fwd_lanecols(blocks_flat, cols_1rk, win_q, xb, fast=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((1, R * kmax), lambda i, q: (0, i)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i], 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i] + 1, 0)),
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, bm), lambda i, q: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(kern_lanecols, kmax, fast),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow, bm), jnp.float32),
    )(win_q, cols_1rk, xb, xb, blocks_flat)


@jax.jit
def fwd_current(blocks_flat, cols_rk1, win_q, xb):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((R * kmax, 1), lambda i, q: (i, 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i], 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i] + 1, 0)),
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, bm), lambda i, q: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_onehot_win, kmax, False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow, bm), jnp.float32),
    )(win_q, cols_rk1, xb, xb, blocks_flat)


yA = fwd_current(blocks_flat, cols_rk1, win_q, xb)
yB = fwd_lanecols(blocks_flat, cols_1rk, win_q, xb)
yC = fwd_lanecols(blocks_flat, cols_1rk, win_q, xb, fast=True)
sync(yA)
dB = float(jnp.linalg.norm(yB - yA) / jnp.linalg.norm(yA))
dC = float(jnp.linalg.norm(yC - yA) / jnp.linalg.norm(yA))
print(f"rel B-vs-A: {dB:.2e}  C-vs-A: {dC:.2e}", flush=True)

bytes_blocks = blocks.size * 4


def time_variant(name, fn, *args):
    # XLA would hoist a loop-invariant apply; perturb x by the carry
    @jax.jit
    def chain2(bf, cf, wq, xv, iters):
        def body(_, carry):
            y = fn(bf, cf, wq, xv + carry * 1e-30)
            return y[0, :1].reshape(())
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    sync(chain2(*args, 1))  # compile + warm OUTSIDE the timed pair
    pers = []
    for _ in range(2):
        t0 = time.perf_counter()
        sync(chain2(*args, 5))
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain2(*args, 55))
        t55 = time.perf_counter() - t0
        pers.append((t55 - t5) / 50)
    per = min(pers)
    print(f"{name}: {per*1e3:.2f} ms = {bytes_blocks/per/1e9:.0f} GB/s",
          flush=True)


time_variant("A cols(RK,1)      ", fwd_current, blocks_flat, cols_rk1,
             win_q, xb)
time_variant("B cols(1,RK)      ", lambda b, c, w, x: fwd_lanecols(b, c, w, x),
             blocks_flat, cols_1rk, win_q, xb)
time_variant("C cols(1,RK)+fast ", lambda b, c, w, x: fwd_lanecols(
    b, c, w, x, fast=True), blocks_flat, cols_1rk, win_q, xb)
print("DONE", flush=True)
