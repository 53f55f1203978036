"""Round-5 TPU batch 16: on-chip compile + correctness checks of the
review-fix paths — bf16 multi-window transpose (crashed Mosaic before
the cast-order fix) and the form-agnostic QN middle.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch16.py > tools/tpu_r5_batch16.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
import linops_tpu.kernels.bsr_spmv as BK
from linops_tpu.sparse.formats import BSR
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

# mostly-banded bf16 multi-window op (small; force multi plan via caps)
BK.BSR_PALLAS_MAX_X_ELEMS = 2048
BK.BSR_PALLAS_MAX_WINDOW_BLOCKS = 16
BK._TILE_BYTES_TARGET = 65536
nbrow, kmax, bm, bn = 64, 2, 8, 128
nbcol = 64
cols = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    g = bi // 16
    cols[bi] = sorted([g * 3, 56 if g != 2 else g * 3 + 1])
blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
data16 = BSR(blocks=jnp.asarray(blocks).astype(jnp.bfloat16),
             block_cols=jnp.asarray(cols), shape=(nbrow * bm, nbcol * bn))
op16 = BSROperator(data16, backend="pallas")
print("multi plan:", op16.win_q is not None and op16.cols_local is None,
      "t-plan:", op16.win_q_t is not None, flush=True)
u = rng.standard_normal(nbrow * bm).astype(np.float32)
try:
    yt = op16.T @ jnp.asarray(u).astype(jnp.bfloat16)
    sync(yt)
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    b16 = np.asarray(data16.blocks, np.float32)
    for bi in range(nbrow):
        for kk in range(kmax):
            c = cols[bi, kk]
            dense[bi * bm:(bi + 1) * bm,
                  c * bn:(c + 1) * bn] += b16[bi, kk]
    u16 = np.asarray(jnp.asarray(u).astype(jnp.bfloat16), np.float32)
    ref = dense.T @ u16
    rel = (np.linalg.norm(np.asarray(yt, np.float32) - ref)
           / np.linalg.norm(ref))
    print(f"bf16 multiwin T compiles on chip; relerr {rel:.2e}", flush=True)
except Exception as e:
    print(f"bf16 multiwin T FAILED on chip: {type(e).__name__}: "
          f"{str(e)[:200]}", flush=True)

# f32 multiwin T too (post cast-order change)
op32 = BSROperator(BSR(blocks=jnp.asarray(blocks),
                       block_cols=jnp.asarray(cols),
                       shape=(nbrow * bm, nbcol * bn)), backend="pallas")
yt32 = np.asarray(op32.T @ jnp.asarray(u))
dense32 = np.zeros((nbrow * bm, nbcol * bn), np.float32)
for bi in range(nbrow):
    for kk in range(kmax):
        c = cols[bi, kk]
        dense32[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += blocks[bi, kk]
ref32 = dense32.T @ u
print(f"f32 multiwin T relerr "
      f"{np.linalg.norm(yt32 - ref32)/np.linalg.norm(ref32):.2e}", flush=True)

# form-agnostic G on chip: forward-pushed state through the inverse apply
n = 65536
B = lo.LBFGSOperator(jnp.float32, n, mem=8)
for _ in range(10):
    s = rng.standard_normal(n).astype(np.float32)
    y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
    B.push(s, y)
from linops_tpu.qn.lbfgs import inverse_apply, inverse_apply_compact

v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
got = np.asarray(inverse_apply_compact(B.state, v))
ref = np.asarray(inverse_apply(B.state, v))
print(f"cross-form inverse relerr "
      f"{np.linalg.norm(got - ref)/np.linalg.norm(ref):.2e}", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch16 done", flush=True)
