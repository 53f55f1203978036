"""Round-4 TPU batch 10: routed SpMM k=8 — long-chain timing + stage
breakdown (batches 7b/9 gave deltas too noisy to act on).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch10.py > /tmp/r4b10.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import linops_tpu as lo
from linops_tpu.sparse.formats import csr_from_parts
from linops_tpu.sparse.routed import (RADIX, _route_and_sum_batched,
                                      routed_matmat)
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
nu, nnz_row = 1 << 16, 16
counts = rng.poisson(nnz_row, nu)
nnzu = int(counts.sum())
indptr_u = np.zeros(nu + 1, np.int64)
np.cumsum(counts, out=indptr_u[1:])
cols_r = rng.integers(0, nu, nnzu)
order = np.lexsort((cols_r, np.repeat(np.arange(nu), counts)))
hp = (rng.standard_normal(nnzu).astype(np.float32),
      cols_r[order].astype(np.int32), indptr_u.astype(np.int32))

t0 = time.perf_counter()
opR = lo.RoutedCSROperator(csr_from_parts(*hp, (nu, nu)), host_parts=hp)
print(f"pack fwd+T (host_parts): {time.perf_counter()-t0:.2f} s", flush=True)
p = opR.routed

k = 8
X = jnp.asarray(rng.standard_normal((nu, k)).astype(np.float32))
v = X[:, 0]


def measure(name, chain, *args, iters=(50, 550), reps=5):
    sync(chain(*args, iters[0]))
    sync(chain(*args, iters[1]))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(chain(*args, iters[0]))
        a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(chain(*args, iters[1]))
        b = time.perf_counter() - t0
        pers.append((b - a) / (iters[1] - iters[0]))
    per = float(np.median(pers))
    print(f"{name}: {per*1e6:.1f} us  (deltas "
          + " ".join(f"{q*1e6:.0f}" for q in pers) + ")", flush=True)
    return per


@jax.jit
def mv_chain(o, vv, iters):
    return lo.matvec_chain(o, vv, iters, mode="N")


@jax.jit
def mm_chain(o, M, iters):
    def body(_, Mc):
        return o.apply_matrix(Mc, mode="N") * (1.0 / 8.0)
    return jax.lax.fori_loop(0, iters, body, M)


@jax.jit
def mm_chain_t(o, M, iters):
    def body(_, Mc):
        return o.apply_matrix(Mc, mode="T") * (1.0 / 8.0)
    return jax.lax.fori_loop(0, iters, body, M)


# stage A: RHS transpose + win_block row gather only
C, m = p.vals.shape[0], p.vals.shape[1]
nb = -(-nu // RADIX)


@jax.jit
def stage_gather(M, iters):
    def body(_, carry):
        Mc = M + carry * 1e-30
        X3 = Mc.T.reshape(k, nb, RADIX)
        xw = X3[:, p.win_block.reshape(-1)].reshape(k * C * m, RADIX)
        return xw[0, :1].reshape(())
    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))


t1 = measure("matvec N      ", mv_chain, opR, v, iters=(50, 1050))
tg = measure("stageA gather ", stage_gather, X, iters=(50, 550))
tk = measure("matmat8 N     ", mm_chain, opR, X)
tkt = measure("matmat8 T    ", mm_chain_t, opR, X)
print(f"k=8: N {tk/t1:.2f}x matvec ({8*nnzu/tk/1e9:.2f} Gnnz/s), "
      f"T {tkt/t1:.2f}x ({8*nnzu/tkt/1e9:.2f} Gnnz/s); "
      f"gather stage {tg*1e6:.0f} us", flush=True)
print("DONE", flush=True)
