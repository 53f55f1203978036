"""Round-5 TPU batch 18: lane-rule closure checks on-chip.

(a) bf16 + f32 multi-window transpose at a LANE-LEGAL small shape
    (R=128, 2 grid steps) must compile and match the dense oracle.
(b) the lane-illegal shape (R would be 16) must now fall back to XLA on
    TPU (plan skipped) and stay correct.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch18.py > tools/tpu_r5_batch18.log 2>&1 &
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

# (a) lane-legal: kmax=8, default tile target -> R=128; nbrow=256 (2 steps)
nbrow, kmax, bm, bn = 256, 8, 8, 128
nbcol = 64
cols = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    g = bi // 128
    clus = 56 if g != 1 else g * 3 + 7
    cols[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus])
blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
u = jnp.asarray(rng.standard_normal(nbrow * bm).astype(np.float32))

dense16 = np.zeros((nbrow * bm, nbcol * bn), np.float32)
b16 = np.asarray(jnp.asarray(blocks).astype(jnp.bfloat16), np.float32)
for bi in range(nbrow):
    for kk in range(kmax):
        c = cols[bi, kk]
        dense16[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += b16[bi, kk]

for name, dt in (("bf16", jnp.bfloat16), ("f32 ", jnp.float32)):
    data = BSR(blocks=jnp.asarray(blocks).astype(dt),
               block_cols=jnp.asarray(cols),
               shape=(nbrow * bm, nbcol * bn))
    op = BSROperator(data, backend="pallas")
    print(f"{name} plan: multi={op.win_q is not None and op.cols_local is None}"
          f" t={op.win_q_t is not None}", flush=True)
    try:
        yt = op.T @ u
        sync(yt)
        dref = dense16 if dt == jnp.bfloat16 else None
        if dref is None:
            dref = np.zeros((nbrow * bm, nbcol * bn), np.float32)
            for bi in range(nbrow):
                for kk in range(kmax):
                    c = cols[bi, kk]
                    dref[bi * bm:(bi + 1) * bm,
                         c * bn:(c + 1) * bn] += blocks[bi, kk]
        ref = dref.T @ np.asarray(u, np.float32)
        rel = (np.linalg.norm(np.asarray(yt, np.float32) - ref)
               / np.linalg.norm(ref))
        print(f"{name} multiwin T (R=128, 2 steps): OK relerr {rel:.2e}",
              flush=True)
    except Exception as e:
        print(f"{name} multiwin T: FAIL {type(e).__name__}: "
              f"{str(e)[:250]}", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# (b) lane-illegal small shape: plan must be SKIPPED on TPU, XLA correct
BK._TILE_BYTES_TARGET = 65536  # would give R=16
nb2 = 64
cols2 = np.zeros((nb2, kmax), np.int32)
for bi in range(nb2):
    g = bi // 16
    clus2 = 56 if g != 2 else g * 3 + 7
    cols2[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus2])
blocks2 = rng.standard_normal((nb2, kmax, bm, bn)).astype(np.float32)
data2 = BSR(blocks=jnp.asarray(blocks2), block_cols=jnp.asarray(cols2),
            shape=(nb2 * bm, nbcol * bn))
op2 = BSROperator(data2, backend="pallas")
print("lane-illegal shape: plan skipped =", op2.win_q is None, flush=True)
u2 = jnp.asarray(rng.standard_normal(nb2 * bm).astype(np.float32))
yt2 = np.asarray(op2.T @ u2)
dref2 = np.zeros((nb2 * bm, nbcol * bn), np.float32)
for bi in range(nb2):
    for kk in range(kmax):
        c = cols2[bi, kk]
        dref2[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += blocks2[bi, kk]
ref2 = dref2.T @ np.asarray(u2)
print(f"XLA fallback relerr "
      f"{np.linalg.norm(yt2 - ref2)/np.linalg.norm(ref2):.2e}", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch18 done", flush=True)
