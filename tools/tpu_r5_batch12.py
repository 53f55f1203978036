"""Round-5 TPU batch 12: multi-window BSR fwd + TRANSPOSE at n=4.2M
mostly-banded (band kb=2 + fixed far column cluster), kmax=3 — validates
VERDICT r4 missing #1 (done-bar: T >= 550 GB/s; r4 XLA scatter: 187).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch12.py > tools/tpu_r5_batch12.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.sparse.formats import BSR
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

nw = 1 << 22
bm, bn, kb, kmax = 8, 128, 2, 3
nbrow, nbcol = nw // bm, nw // bn
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kb - 1)) // max(nbrow - 1, 1)
clus = nbcol - 2
bc = np.concatenate([
    np.minimum(q0[:, None] + np.arange(kb)[None, :], nbcol - 3),
    np.full((nbrow, 1), clus, np.int64)], axis=1)
blocks_w = jax.random.normal(jax.random.PRNGKey(12),
                             (nbrow, kmax, bm, bn), jnp.float32)
sync(blocks_w)
print(f"[t+{time.time()-t0:.0f}s] blocks ready ({blocks_w.size*4/1e9:.1f} GB)",
      flush=True)
op = lo.BSROperator(BSR(blocks=blocks_w,
                        block_cols=jnp.asarray(bc.astype(np.int32)),
                        shape=(nw, nw)))
print("multi plan:", op.win_q is not None and op.cols_local is None,
      "W:", None if op.win_q is None else op.win_q.shape,
      "t-plan:", op.win_q_t is not None, "wb:", op._wb, flush=True)

# small-scale correctness on-chip first (subset rows via a fresh op)
ns = 1 << 16
nbr_s = ns // bm
bc_s = bc[:nbr_s].copy()
bc_s[:, :kb] = np.minimum(bc_s[:, :kb], ns // bn - 3)
bc_s[:, kb] = ns // bn - 2
blk_s = jax.random.normal(jax.random.PRNGKey(5), (nbr_s, kmax, bm, bn),
                          jnp.float32)
op_s = lo.BSROperator(BSR(blocks=blk_s,
                          block_cols=jnp.asarray(bc_s.astype(np.int32)),
                          shape=(ns, ns)))
print("small multi plan:", op_s.win_q is not None
      and op_s.cols_local is None, "t:", op_s.win_q_t is not None, flush=True)
u = jnp.asarray(np.random.default_rng(1).standard_normal(ns).astype(np.float32))
yt = np.asarray(op_s.T @ u)
# oracle via XLA backend
op_x = lo.BSROperator(op_s.data, backend="xla")
yt_ref = np.asarray(op_x.T @ u)
rel = np.linalg.norm(yt - yt_ref) / np.linalg.norm(yt_ref)
print(f"small T relerr vs XLA: {rel:.2e}", flush=True)
yf = np.asarray(op_s @ u)
yf_ref = np.asarray(op_x @ u)
print(f"small N relerr vs XLA: "
      f"{np.linalg.norm(yf-yf_ref)/np.linalg.norm(yf_ref):.2e}", flush=True)

byts = float(blocks_w.size * 4)
vw = jnp.ones((nw,), jnp.float32)


def ch(mode):
    return lambda o, v, iters: lo.matvec_chain(o, v, iters, mode=mode)


tWf = marginal_chain_time(ch("N"), op, vw, iters_short=5, iters_long=35,
                          reps=2)
print(f"multiwin fwd {byts/tWf/1e9:.1f} GB/s ({tWf*1e6:.0f} us)", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)
tWt = marginal_chain_time(ch("T"), op, vw, iters_short=5, iters_long=35,
                          reps=2)
print(f"multiwin T   {byts/tWt/1e9:.1f} GB/s ({tWt*1e6:.0f} us)"
      f"  (bar >= 550; r4 XLA scatter 187)", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch12 done", flush=True)
