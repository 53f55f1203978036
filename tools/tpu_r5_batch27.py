"""Round-5 TPU batch 27: lane-illegal R on REAL TPU now keeps a Pallas
plan with UNPACKED kernel I/O (review-2 finding) — compile + parity.
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
BK._TILE_BYTES_TARGET = 65536  # R=16: lane-illegal packed I/O
nbrow, kmax, bm, bn = 64, 8, 8, 128
nbcol = 64
cols = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    g = bi // 16
    clus = 56 if g != 2 else g * 3 + 7
    cols[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus])
blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
op = BSROperator(BSR(blocks=jnp.asarray(blocks),
                     block_cols=jnp.asarray(cols),
                     shape=(nbrow * bm, nbcol * bn)), backend="pallas")
print("plan:", op.win_q is not None, "packed:", op._win_packed, flush=True)
dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
for bi in range(nbrow):
    for kk in range(kmax):
        c = cols[bi, kk]
        dense[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += blocks[bi, kk]
v = jnp.asarray(rng.standard_normal(nbcol * bn).astype(np.float32))
u = jnp.asarray(rng.standard_normal(nbrow * bm).astype(np.float32))
for name, fn, ref in (("fwd", lambda: op @ v, dense @ np.asarray(v)),
                      ("T  ", lambda: op.T @ u, dense.T @ np.asarray(u))):
    try:
        y = np.asarray(fn())
        print(f"unpacked {name}: OK relerr "
              f"{np.linalg.norm(y - ref)/np.linalg.norm(ref):.2e}",
              flush=True)
    except Exception as e:
        print(f"unpacked {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch27 done", flush=True)
