"""Round-5 TPU batch 19: (a) the W=4 rescued multi-window transpose plan
compiles + matches on-chip; (b) banded windowed bf16 fwd + transpose
on-chip (f32-accumulator patch path never chip-verified for bf16).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch19.py > tools/tpu_r5_batch19.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu.kernels.bsr_spmv as BK
from linops_tpu.sparse.formats import BSR
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

BK.BSR_PALLAS_MAX_X_ELEMS = 2048
BK.BSR_PALLAS_MAX_WINDOW_BLOCKS = 16

nbrow, kmax, bm, bn = 256, 8, 8, 128
nbcol = 64

# (a) f32 pattern whose T-plan needs the W=4 rescue (batch18: t=False)
cols = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    g = bi // 128
    clus = 56 if g != 1 else g * 3 + 7
    cols[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus])
blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
op = BSROperator(BSR(blocks=jnp.asarray(blocks),
                     block_cols=jnp.asarray(cols),
                     shape=(nbrow * bm, nbcol * bn)), backend="pallas")
print("rescued t-plan:", op.win_q_t is not None,
      "lanes:", None if op.win_q_t is None else int(op.win_q_t.shape[0]),
      flush=True)
u = jnp.asarray(rng.standard_normal(nbrow * bm).astype(np.float32))
try:
    yt = np.asarray(op.T @ u)
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    for bi in range(nbrow):
        for kk in range(kmax):
            c = cols[bi, kk]
            dense[bi * bm:(bi + 1) * bm,
                  c * bn:(c + 1) * bn] += blocks[bi, kk]
    ref = dense.T @ np.asarray(u)
    print(f"rescued W=4 T on-chip: OK relerr "
          f"{np.linalg.norm(yt - ref)/np.linalg.norm(ref):.2e}", flush=True)
except Exception as e:
    print(f"rescued T FAIL: {type(e).__name__}: {str(e)[:250]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# (b) banded ladder, bf16 blocks: single-window plan, fwd + T on-chip
cols_b = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    q0 = min((bi * (nbcol - kmax)) // max(nbrow - 1, 1), nbcol - kmax)
    cols_b[bi] = np.arange(q0, q0 + kmax)
data_b = BSR(blocks=jnp.asarray(blocks).astype(jnp.bfloat16),
             block_cols=jnp.asarray(cols_b),
             shape=(nbrow * bm, nbcol * bn))
op_b = BSROperator(data_b, backend="pallas")
print("banded plan:", op_b.win_q is not None
      and op_b.cols_local is not None, flush=True)
dref = np.zeros((nbrow * bm, nbcol * bn), np.float32)
b16 = np.asarray(data_b.blocks, np.float32)
for bi in range(nbrow):
    for kk in range(kmax):
        c = cols_b[bi, kk]
        dref[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += b16[bi, kk]
x = jnp.asarray(rng.standard_normal(nbcol * bn).astype(np.float32))
for name, fn, ref in (
    ("banded bf16 fwd", lambda: op_b @ x, dref @ np.asarray(x)),
    ("banded bf16 T  ", lambda: op_b.T @ u, dref.T @ np.asarray(u)),
):
    try:
        y = np.asarray(fn(), np.float32)
        print(f"{name}: OK relerr "
              f"{np.linalg.norm(y - ref)/np.linalg.norm(ref):.2e}",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch19 done", flush=True)
