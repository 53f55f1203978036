"""Round-4 TPU batch 7: on-chip validation of the remaining new paths.

  1. routed matmat/rmatmat k=8 at the 65536^2 bench shape: rep-grid
     kernels must compile on real Mosaic, match scipy, and cost <= ~3x a
     single matvec (VERDICT r3 item 6 bar; sequential was 8x).
  2. in-kernel reshape (OL, 128) -> (R, 8) compile probe (the transpose-
     input analogue of batch 6's flat output).
  3. multi-window forward kernel at n=4.2M (band + far cluster).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch7.py > /tmp/r4b7.log 2>&1 &
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
from linops_tpu.sparse.formats import BSR, csr_from_parts
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)

# --- 1. routed SpMM --------------------------------------------------------
rng = np.random.default_rng(0)
nu, nnz_row = 1 << 16, 16
counts = rng.poisson(nnz_row, nu)
nnzu = int(counts.sum())
indptr_u = np.zeros(nu + 1, np.int64)
np.cumsum(counts, out=indptr_u[1:])
cols_r = rng.integers(0, nu, nnzu)
order = np.lexsort((cols_r, np.repeat(np.arange(nu), counts)))
cols_u = cols_r[order]
vals_u = rng.standard_normal(nnzu).astype(np.float32)

t0 = time.perf_counter()
opR = lo.RoutedCSROperator(csr_from_parts(
    vals_u, cols_u.astype(np.int32), indptr_u.astype(np.int32), (nu, nu)))
print(f"pack fwd+T: {time.perf_counter()-t0:.2f} s", flush=True)

import scipy.sparse as sp
A = sp.csr_matrix((vals_u, cols_u, indptr_u), shape=(nu, nu))
k = 8
Xh = rng.standard_normal((nu, k)).astype(np.float32)
X = jnp.asarray(Xh)
Y = np.asarray(opR.apply_matrix(X, mode="N"))
print("matmat rel:", np.linalg.norm(Y - A @ Xh) / np.linalg.norm(A @ Xh),
      flush=True)
YT = np.asarray(opR.apply_matrix(X, mode="T"))
print("rmatmat rel:",
      np.linalg.norm(YT - A.T @ Xh) / np.linalg.norm(A.T @ Xh), flush=True)

v = jnp.asarray(Xh[:, 0])
t1 = marginal_chain_time(
    lambda o, vv, iters: lo.matvec_chain(o, vv, iters, mode="N"),
    opR, v, iters_short=50, iters_long=1050, reps=2)
print(f"matvec: {t1*1e6:.1f} us = {nnzu/t1/1e9:.2f} Gnnz/s", flush=True)


def spmm_chain(o, Xc, iters, mode):
    def body(_, M):
        return o.apply_matrix(M, mode=mode) * (1.0 / 8.0)
    return jax.lax.fori_loop(0, iters, body, Xc)


tk = marginal_chain_time(
    lambda o, Xc, iters: spmm_chain(o, Xc, iters, "N"),
    opR, X, iters_short=10, iters_long=110, reps=2)
print(f"matmat k=8: {tk*1e6:.1f} us = {tk/t1:.2f}x matvec, "
      f"{8*nnzu/tk/1e9:.2f} Gnnz/s", flush=True)
tkt = marginal_chain_time(
    lambda o, Xc, iters: spmm_chain(o, Xc, iters, "T"),
    opR, X, iters_short=10, iters_long=110, reps=2)
print(f"rmatmat k=8: {tkt*1e6:.1f} us = {tkt/t1:.2f}x matvec, "
      f"{8*nnzu/tkt/1e9:.2f} Gnnz/s", flush=True)

del opR, X, Y, YT
import gc
gc.collect()

# --- 2. transposed-output compile probe ------------------------------------
# jnp.reshape across the lane boundary does NOT compile (batch 6, HTTP
# 500); in-kernel .T does (round-3 facts). A kernel writing y.T as a
# (bm, R) tile gives a PACKED (bm, nbrow) out array (no 16x lane pad),
# leaving one cheap packed XLA transpose on the host.
R2, bm2 = 512, 8


def kern_tout(u_ref, o_ref):
    o_ref[...] = u_ref[...].T  # (R, 8) -> (8, R)


try:
    uin = jax.random.normal(jax.random.PRNGKey(5), (4 * R2, bm2),
                            jnp.float32)
    out = pl.pallas_call(
        kern_tout,
        grid=(4,),
        in_specs=[pl.BlockSpec((R2, bm2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm2, R2), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm2, 4 * R2), jnp.float32),
    )(uin)
    sync(out)
    ref = uin.T
    print("transposed-out rel:",
          float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)),
          flush=True)
except Exception as e:
    print(f"transposed-out FAILED: {type(e).__name__}: {str(e)[:200]}",
          flush=True)

# --- 3. multi-window forward at n=4.2M -------------------------------------
n = 1 << 22
bm, bn, kmax = 8, 128, 2
nbrow, nbcol = n // bm, n // bn
bi = np.arange(nbrow, dtype=np.int64)
# sliding band + far-off cluster that advances in jumps
q0 = (bi * (nbcol // 2 - kmax)) // max(nbrow - 1, 1)
far = (nbcol // 2 + 64 * (bi // 4096)) % (nbcol - 1)
block_cols = np.stack([q0, np.maximum(far, q0 + 1)], axis=1).astype(np.int32)
block_cols = np.sort(np.minimum(block_cols, nbcol - 1), axis=1)
blocks = jax.random.normal(jax.random.PRNGKey(6), (nbrow, kmax, bm, bn),
                           jnp.float32)
sync(blocks)
t0 = time.perf_counter()
op = BSROperator(BSR(blocks=blocks, block_cols=jnp.asarray(block_cols),
                     shape=(n, n)))
kind = ("banded" if op.cols_local is not None else "multi") if (
    op.win_q is not None) else "none"
print(f"plan: {kind} wb={op._wb} "
      f"W={0 if op.win_q is None or op.win_q.ndim < 2 else op.win_q.shape[0]}"
      f" ({time.perf_counter()-t0:.1f} s)", flush=True)
if kind == "multi":
    x = jax.random.normal(jax.random.PRNGKey(7), (n,), jnp.float32)
    y = op @ x
    opx = BSROperator(op.data, backend="xla")
    yx = opx @ x
    print("multiwin rel vs xla:",
          float(jnp.linalg.norm(y - yx) / jnp.linalg.norm(yx)), flush=True)
    t_m = marginal_chain_time(
        lambda o, vv, iters: lo.matvec_chain(o, vv, iters, mode="N"),
        op, x, iters_short=5, iters_long=55, reps=2)
    print(f"multiwin fwd: {t_m*1e3:.2f} ms = "
          f"{blocks.size*4/t_m/1e9:.0f} GB/s", flush=True)
print("DONE", flush=True)
