"""Round-4 TPU batch 12: routed SpMM k=8 via the row-panel protocol.

Batch 10 measured the dense-layout apply_matrix SpMM at 8.89x a matvec
(830 us) — LOSING ~11% to eight separate matvecs because the pipeline's
column-outer layout pays two boundary relayouts per apply. apply_matrix_t
(panel=True) is the pipeline's native layout on both ends; this measures
the panel chain at k=8 for N and T plus correctness vs the matvec path.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch12.py > /tmp/r4b12.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import linops_tpu as lo
from linops_tpu.sparse.formats import csr_from_parts
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

k = 8
Xt = jnp.asarray(rng.standard_normal((k, nu)).astype(np.float32))
v = Xt[0]


def measure(name, fn, *args, iters=(50, 550), reps=5):
    sync(fn(*args, iters[0]))
    sync(fn(*args, iters[1]))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args, iters[0]))
        a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(fn(*args, iters[1]))
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
def panel_chain(o, Mt, iters):
    def body(_, Mc):
        return o.apply_matrix_t(Mc, mode="N") * (1.0 / 8.0)
    return jax.lax.fori_loop(0, iters, body, Mt)


@jax.jit
def panel_chain_t(o, Mt, iters):
    def body(_, Mc):
        return o.apply_matrix_t(Mc, mode="T") * (1.0 / 8.0)
    return jax.lax.fori_loop(0, iters, body, Mt)


# correctness: panel result vs per-column matvecs (on-chip routed path)
Yp = np.asarray(jax.jit(lambda o, M: o.apply_matrix_t(M, mode="N"))(opR, Xt))
Yc = np.stack([np.asarray(jax.jit(lambda o, c: o * c)(opR, Xt[i]))
               for i in range(k)])
rel = np.abs(Yp - Yc).max() / max(np.abs(Yc).max(), 1e-30)
print(f"panel vs per-column rel err: {rel:.2e}", flush=True)

t1 = measure("matvec N       ", mv_chain, opR, v, iters=(50, 1050))
tp = measure("panel8 N       ", panel_chain, opR, Xt)
tpt = measure("panel8 T       ", panel_chain_t, opR, Xt)
print(f"k=8 panel: N {tp/t1:.2f}x matvec ({8*nnzu/tp/1e9:.2f} Gnnz/s), "
      f"T {tpt/t1:.2f}x ({8*nnzu/tpt/1e9:.2f} Gnnz/s)", flush=True)
print("DONE", flush=True)
