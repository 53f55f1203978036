"""Round-5 TPU batch 1: verify drive on the real chip + L-BFGS forward
timing with the new Schur-complement middle solve.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch1.py > tools/tpu_r5_batch1.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

# --- verify drive: correctness of the round-5 paths on the real chip ----
t0 = time.time()
n, mem = 8192, 16
B = lo.LBFGSOperator(jnp.float32, n, mem=mem)
H = lo.InverseLBFGSOperator(jnp.float32, n, mem=mem)
for _ in range(mem + 4):
    s = rng.standard_normal(n).astype(np.float32)
    y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
    B.push(s, y)
    H.push(s, y)
v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
bv = B @ v
hbv = np.asarray(H @ bv)
rel = np.linalg.norm(hbv - np.asarray(v)) / np.linalg.norm(np.asarray(v))
print(f"verify lbfgs H(Bv)=v relerr {rel:.2e} (want <1e-4)", flush=True)
from linops_tpu.qn.lbfgs import forward_apply

st = B._materialized_state()
bv_ab = np.asarray(forward_apply(st, v))
rel2 = np.linalg.norm(np.asarray(bv) - bv_ab) / np.linalg.norm(bv_ab)
print(f"verify lbfgs compact==ab relerr {rel2:.2e} (want <1e-5)", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# --- timing: fwd + inv marginal at bench shape (n=1e6, mem=16) ----------
n = 1_000_000
Bt = lo.LBFGSOperator(jnp.float32, n, mem=16)
Ht = lo.InverseLBFGSOperator(jnp.float32, n, mem=16)
for _ in range(16):
    s = rng.standard_normal(n).astype(np.float32)
    y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
    Bt.push(s, y)
    Ht.push(s, y)
vt = jnp.ones((n,), jnp.float32)


def f(o, x, iters):
    return lo.matvec_chain(o, x, iters, mode="N")


for name, op in (("fwd", Bt), ("inv", Ht)):
    t = marginal_chain_time(f, op, vt, iters_short=50, iters_long=1050, reps=3)
    print(f"lbfgs_{name}_us {t*1e6:.1f}  (roofline window [182, 353])", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# --- verify: reorder sandwich correctness on chip (small) ---------------
import scipy.sparse as sps

nrc, bw = 4096, 8
diags = [rng.standard_normal(nrc - abs(k)).astype(np.float32)
         for k in range(-bw, bw + 1)]
A = sps.diags(diags, range(-bw, bw + 1), format="csr")
sig = rng.permutation(nrc)
Asc = A[sig][:, sig].tocsr()
op_re = lo.opSparse(Asc, format="auto", reorder="rcm", dtype=jnp.float32)
x = rng.standard_normal(nrc).astype(np.float32)
Ad = Asc.toarray()
for mode, oracle in (("N", Ad @ x), ("T", Ad.T @ x)):
    got = np.asarray(op_re.matvec(jnp.asarray(x), mode=mode))
    rel = np.linalg.norm(got - oracle) / np.linalg.norm(oracle)
    print(f"verify reorder mode {mode} relerr {rel:.2e} (want <1e-5)", flush=True)

# panel path through the sandwich (round-5 transposed-gather form)
Mt = rng.standard_normal((8, nrc)).astype(np.float32)
Zp = np.asarray(op_re.apply_matrix_t(jnp.asarray(Mt), "N"))
oracle_p = (Ad @ Mt.T).T
rel = np.linalg.norm(Zp - oracle_p) / np.linalg.norm(oracle_p)
print(f"verify reorder panel relerr {rel:.2e} (want <1e-5)", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch1 done", flush=True)
