"""Round-4 TPU batch 1: segsum combine A/B + derived transpose at the
bench shape (65536^2, 16 nnz/row).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch1.py > /tmp/r4b1.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import linops_tpu as lo
from linops_tpu.sparse.formats import csr_from_parts
from linops_tpu.sparse.routed import RoutedTranspose
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
nu = 1 << 16
nnz_row = 16
counts = rng.poisson(nnz_row, nu)
nnzu = int(counts.sum())
indptr_u = np.zeros(nu + 1, np.int64)
np.cumsum(counts, out=indptr_u[1:])
cols_r = rng.integers(0, nu, nnzu)
order = np.lexsort((cols_r, np.repeat(np.arange(nu), counts)))
cols_u = cols_r[order]
vals_u = rng.standard_normal(nnzu).astype(np.float32)

t0 = time.perf_counter()
opF = lo.RoutedCSROperator(
    csr_from_parts(vals_u, cols_u.astype(np.int32), indptr_u.astype(np.int32),
                   (nu, nu)), defer_transpose=True)
t_pack_f = time.perf_counter() - t0
t0 = time.perf_counter()
opR = lo.RoutedCSROperator(
    csr_from_parts(vals_u, cols_u.astype(np.int32), indptr_u.astype(np.int32),
                   (nu, nu)))
t_pack_ft = time.perf_counter() - t0
print(f"pack fwd-only {t_pack_f:.3f}s  fwd+derivedT {t_pack_ft:.3f}s "
      f"(derivation {t_pack_ft - t_pack_f:.3f}s = "
      f"{(t_pack_ft - t_pack_f) / t_pack_f:.2f}x)", flush=True)
assert isinstance(opR.routed_t, RoutedTranspose)

# correctness on-chip vs scipy
import scipy.sparse as sp
A = sp.csr_matrix((vals_u, cols_u, indptr_u), shape=(nu, nu))
x_h = rng.standard_normal(nu).astype(np.float32)
u_h = rng.standard_normal(nu).astype(np.float32)
x = jnp.asarray(x_h)
u = jnp.asarray(u_h)

y = np.asarray(opR @ x)
ref = A @ x_h
print("fwd rel err:", np.linalg.norm(y - ref) / np.linalg.norm(ref), flush=True)

yt = np.asarray(opR.T @ u)
reft = A.T @ u_h
print("derivedT rel err:", np.linalg.norm(yt - reft) / np.linalg.norm(reft),
      flush=True)


def chain(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="N")


def chain_t(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="T")


t_fwd = marginal_chain_time(chain, opR, x, iters_short=50, iters_long=1050,
                            reps=3)
print(f"fwd (segsum combine): {t_fwd*1e6:.1f} us = {nnzu/t_fwd/1e9:.2f} Gnnz/s",
      flush=True)

# A/B: one-hot tiled combine (old path)
opHot = lo.RoutedCSROperator(opR.data, routed=opR.routed._replace(
    comb_lo=None, comb_hi=None), routed_t=opR.routed_t)
t_hot = marginal_chain_time(chain, opHot, x, iters_short=50, iters_long=1050,
                            reps=3)
print(f"fwd (one-hot combine): {t_hot*1e6:.1f} us = {nnzu/t_hot/1e9:.2f} Gnnz/s",
      flush=True)

t_t = marginal_chain_time(chain_t, opR, u, iters_short=50, iters_long=1050,
                          reps=3)
print(f"derived T: {t_t*1e6:.1f} us = {nnzu/t_t/1e9:.2f} Gnnz/s", flush=True)
print("DONE", flush=True)
