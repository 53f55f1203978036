"""Round-4 TPU batch 9: routed SpMM k=8 after the transpose-first gather fix.
timings were nonsense — 0.0 us fwd, 84x T — alongside a 679 s pack,
pointing at a degraded relay stretch; correctness was perfect).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch9.py > /tmp/r4b7b.log 2>&1 &
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
cols_u = cols_r[order]
vals_u = rng.standard_normal(nnzu).astype(np.float32)

t0 = time.perf_counter()
opR = lo.RoutedCSROperator(csr_from_parts(
    vals_u, cols_u.astype(np.int32), indptr_u.astype(np.int32), (nu, nu)))
print(f"pack fwd+T: {time.perf_counter()-t0:.2f} s", flush=True)

k = 8
X = jnp.asarray(rng.standard_normal((nu, k)).astype(np.float32))
v = X[:, 0]


def mv_chain(o, vv, iters, mode):
    return lo.matvec_chain(o, vv, iters, mode=mode)


def mm_chain(o, M, iters, mode):
    def body(_, Mc):
        return o.apply_matrix(Mc, mode=mode) * (1.0 / 8.0)
    return jax.lax.fori_loop(0, iters, body, M)


def measure(name, fn, *args, iters=(20, 220), reps=3):
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
          + " ".join(f"{p*1e6:.0f}" for p in pers) + ")", flush=True)
    return per


t1 = measure("matvec N ", lambda o, vv, it: mv_chain(o, vv, it, "N"),
             opR, v, iters=(50, 1050))
t1t = measure("matvec T ", lambda o, vv, it: mv_chain(o, vv, it, "T"),
              opR, v, iters=(50, 1050))
tk = measure("matmat8 N", lambda o, M, it: mm_chain(o, M, it, "N"), opR, X)
tkt = measure("matmat8 T", lambda o, M, it: mm_chain(o, M, it, "T"), opR, X)
print(f"k=8 cost: N {tk/t1:.2f}x matvec ({8*nnzu/tk/1e9:.2f} Gnnz/s), "
      f"T {tkt/t1t:.2f}x ({8*nnzu/tkt/1e9:.2f} Gnnz/s)", flush=True)
print("DONE", flush=True)
