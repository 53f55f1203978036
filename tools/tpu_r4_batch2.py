"""Round-4 TPU batch 2: batched multi-chunk routed pipeline at 262144^2
(16 nnz/row, ~4.2M nnz, 3 chunks) — forward + derived transpose.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch2.py > /tmp/r4b2.log 2>&1 &
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
from linops_tpu.utils.timing import marginal_chain_time

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
nu = 1 << 18
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
opR = lo.RoutedCSROperator(
    csr_from_parts(vals_u, cols_u.astype(np.int32), indptr_u.astype(np.int32),
                   (nu, nu)))
print(f"pack fwd+derivedT: {time.perf_counter()-t0:.2f} s, "
      f"chunks={opR.routed.vals.shape[0]}, nnz={nnzu/1e6:.2f}M", flush=True)
assert isinstance(opR.routed_t, RoutedTranspose)

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
print("T rel err:", np.linalg.norm(yt - reft) / np.linalg.norm(reft), flush=True)


def chain(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="N")


def chain_t(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="T")


t_fwd = marginal_chain_time(chain, opR, x, iters_short=20, iters_long=270,
                            reps=3)
print(f"multichunk fwd: {t_fwd*1e6:.1f} us = {nnzu/t_fwd/1e9:.2f} Gnnz/s",
      flush=True)
t_t = marginal_chain_time(chain_t, opR, u, iters_short=20, iters_long=270,
                          reps=3)
print(f"multichunk derived T: {t_t*1e6:.1f} us = {nnzu/t_t/1e9:.2f} Gnnz/s",
      flush=True)
print("DONE", flush=True)
