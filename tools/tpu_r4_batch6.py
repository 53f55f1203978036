"""Round-4 TPU batch 6: flat-layout kernel OUTPUT.

The forward kernels write y as (nbrow, bm=8): lane-padded 16x in HBM
(268 MB at n=4.2M instead of 16.8 MB) and the host-side flatten is a slow
relayout copy (~2.4 ms at n=4.2M — the whole 626-vs-443 GB/s gap between
driving the kernel directly and going through the operator).

Variant: in-kernel reshape (R, bm) -> (R*bm/128, 128) so the out array is
(nbrow*bm/128, 128) — unpadded tiles, and .reshape(-1) on the host is
layout-free. Probes compile + correctness + perf for (a) the windowed
kmax=2 kernel at n=4.2M via the op path, (b) the resident kmax=8 bench
shape (65536, one-hot).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch6.py > /tmp/r4b6.log 2>&1 &
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
    _group_ksum, _onehot_gather, _onehot_gather_offset,
    bsr_pallas_rows_per_program, bsr_windowed_rows_per_program)
from linops_tpu.sparse.formats import BSR
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)


# --- (a) windowed kmax=2 at n=4.2M -----------------------------------------
n = 1 << 22
bm, bn, kmax = 8, 128, 2
nbrow, nbcol = n // bm, n // bn
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
block_cols = np.minimum(q0[:, None] + np.arange(kmax)[None, :],
                        nbcol - 1).astype(np.int32)
blocks = jax.random.normal(jax.random.PRNGKey(0), (nbrow, kmax, bm, bn),
                           jnp.float32)
sync(blocks)
op = BSROperator(BSR(blocks=blocks, block_cols=jnp.asarray(block_cols),
                     shape=(n, n)))
wb, xpb = op._wb, op._x_pad_blocks
R = bsr_windowed_rows_per_program(bm, kmax, bn, 4, nbrow)
OL = R * bm // 128  # flat out rows per step
print(f"wb={wb} xpb={xpb} R={R} OL={OL}", flush=True)

x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
xb = x.reshape(nbcol, bn)
if xb.shape[0] < xpb:
    xb = jnp.pad(xb, ((0, xpb - xb.shape[0]), (0, 0)))
blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
cols_rk1 = op.cols_local.reshape(nbrow * kmax, 1)
win_q = op.win_q
bytes_blocks = blocks.size * 4


def kern_win_flat(kmax_, fast, q_ref, cols_ref, xlo_ref, xhi_ref,
                  blocks_ref, y_ref):
    RK, bm_, bn_ = blocks_ref.shape
    wb_ = xlo_ref.shape[0]
    xg = _onehot_gather_offset(cols_ref, xlo_ref, jnp.float32, fast, 0)
    xg = xg + _onehot_gather_offset(cols_ref, xhi_ref, jnp.float32, fast, wb_)
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)
    y = _group_ksum(z, kmax_, jnp.float32)          # (R, bm)
    y_ref[...] = y.reshape(y_ref.shape)             # (R*bm/128, 128)


@jax.jit
def fwd_win_flat(blocks_flat, cols_rk1, win_q, xb):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbrow // R,),
        in_specs=[
            pl.BlockSpec((R * kmax, 1), lambda i, q: (i, 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i], 0)),
            pl.BlockSpec((wb, bn), lambda i, q: (q[i] + 1, 0)),
            pl.BlockSpec((R * kmax, bm, bn), lambda i, q: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((OL, 128), lambda i, q: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(kern_win_flat, kmax, False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow * bm // 128, 128), jnp.float32),
    )(win_q, cols_rk1, xb, xb, blocks_flat)


try:
    yF = fwd_win_flat(blocks_flat, cols_rk1, win_q, xb)
    sync(yF)
    ref = op @ x
    d = float(jnp.linalg.norm(yF.reshape(-1) - ref) / jnp.linalg.norm(ref))
    print(f"windowed flat-out rel: {d:.2e}", flush=True)

    @jax.jit
    def chain_flat(bf, cf, wq, xv, iters):
        def body(_, carry):
            y = fwd_win_flat(bf, cf, wq, xv + carry * 1e-30)
            return y[0, :1].reshape(())
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    sync(chain_flat(blocks_flat, cols_rk1, win_q, xb, 1))
    pers = []
    for _ in range(2):
        t0 = time.perf_counter()
        sync(chain_flat(blocks_flat, cols_rk1, win_q, xb, 5))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain_flat(blocks_flat, cols_rk1, win_q, xb, 55))
        b = time.perf_counter() - t0
        pers.append((b - a) / 50)
    per = min(pers)
    print(f"windowed flat-out: {per*1e3:.2f} ms = "
          f"{bytes_blocks/per/1e9:.0f} GB/s", flush=True)
except Exception as e:
    print(f"windowed flat-out FAILED: {type(e).__name__}: {str(e)[:300]}",
          flush=True)

del blocks, blocks_flat, op, xb
import gc
gc.collect()

# --- (b) resident kmax=8 bench shape ---------------------------------------
ns = 65536
rng = np.random.default_rng(0)
blocks8 = jax.random.normal(jax.random.PRNGKey(2), (ns // 8, 8, 8, 128),
                            jnp.float32)
cols8 = jnp.asarray(rng.integers(0, ns // 128, size=(ns // 8, 8))
                    .astype(np.int32))
sync(blocks8)
nbrow8 = ns // 8
R8 = bsr_pallas_rows_per_program(8, 8, 128, 4)
OL8 = R8 * 8 // 128
xs = jax.random.normal(jax.random.PRNGKey(3), (ns // 128, 128), jnp.float32)
blocks8_flat = blocks8.reshape(nbrow8 * 8, 8, 128)
cols8_flat = cols8.reshape(nbrow8 * 8, 1)
bytes8 = blocks8.size * 4


def kern_res_flat(kmax_, cols_ref, x_ref, blocks_ref, y_ref):
    xg = _onehot_gather(cols_ref, x_ref, jnp.float32, False)
    z = jnp.sum(blocks_ref[...] * xg[:, None, :], axis=2)
    y = _group_ksum(z, kmax_, jnp.float32)
    y_ref[...] = y.reshape(y_ref.shape)


@jax.jit
def fwd_res_flat(blocks_flat_, cols_flat_, x_):
    return pl.pallas_call(
        functools.partial(kern_res_flat, 8),
        grid=(nbrow8 // R8,),
        in_specs=[
            pl.BlockSpec((R8 * 8, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((R8 * 8, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OL8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbrow8 * 8 // 128, 128), jnp.float32),
    )(cols_flat_, x_, blocks_flat_)


try:
    from linops_tpu.kernels.bsr_spmv import bsr_matvec_pallas

    y8_ref = bsr_matvec_pallas(blocks8, cols8, xs)
    y8F = fwd_res_flat(blocks8_flat, cols8_flat, xs)
    sync(y8F)
    d8 = float(jnp.linalg.norm(y8F.reshape(-1) - y8_ref.reshape(-1))
               / jnp.linalg.norm(y8_ref.reshape(-1)))
    print(f"resident flat-out rel: {d8:.2e}", flush=True)

    @jax.jit
    def chain8(bf, cf, xv, iters):
        def body(_, carry):
            y = fwd_res_flat(bf, cf, xv + carry * 1e-30)
            return y[0, :1].reshape(())
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def chain8_ref(b_, c_, xv, iters):
        def body(_, carry):
            y = bsr_matvec_pallas(b_, c_, xv + carry * 1e-30)
            return y[0, :1].reshape(())
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    for name, fn, args in (
        ("resident flat-out", chain8, (blocks8_flat, cols8_flat, xs)),
        ("resident current ", chain8_ref, (blocks8, cols8, xs)),
    ):
        sync(fn(*args, 1))
        pers = []
        for _ in range(2):
            t0 = time.perf_counter(); sync(fn(*args, 20))
            a = time.perf_counter() - t0
            t0 = time.perf_counter(); sync(fn(*args, 220))
            b = time.perf_counter() - t0
            pers.append((b - a) / 200)
        per = min(pers)
        print(f"{name}: {per*1e6:.1f} us = {bytes8/per/1e9:.0f} GB/s",
              flush=True)
except Exception as e:
    print(f"resident flat-out FAILED: {type(e).__name__}: {str(e)[:300]}",
          flush=True)

print("DONE", flush=True)
