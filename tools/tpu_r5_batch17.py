"""Round-5 TPU batch 17: isolate the bf16 multi-window transpose Mosaic
HTTP-500. Tries: (a) bf16 blocks + f32 u (mixed, common case), (b) the
BANDED windowed transpose with bf16 blocks (shares the kernel family),
(c) all-bf16 multiwin again with a bigger wb (16-lane output windows may
be the trigger: wb=16 blocks -> (16,128) f32 out tile ok but bf16 out
(16,128) is HALF a native (16,128)x2 tile... probe wb).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch17.py > tools/tpu_r5_batch17.log 2>&1 &
"""
import time
import traceback

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
BK._TILE_BYTES_TARGET = 65536
nbrow, kmax, bm, bn = 64, 8, 8, 128
nbcol = 64
cols = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    g = bi // 16
    clus = 56 if g != 2 else g * 3 + 7
    cols[bi] = sorted(list(range(g * 3, g * 3 + 7)) + [clus])
blocks = rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
u = jnp.asarray(rng.standard_normal(nbrow * bm).astype(np.float32))

dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
b16 = np.asarray(jnp.asarray(blocks).astype(jnp.bfloat16), np.float32)
for bi in range(nbrow):
    for kk in range(kmax):
        c = cols[bi, kk]
        dense[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += b16[bi, kk]


def try_case(name, blocks_dt, u_in):
    data = BSR(blocks=jnp.asarray(blocks).astype(blocks_dt),
               block_cols=jnp.asarray(cols),
               shape=(nbrow * bm, nbcol * bn))
    op = BSROperator(data, backend="pallas")
    try:
        yt = op.T @ u_in
        sync(yt)
        ref = dense.T @ np.asarray(u_in, np.float32)
        rel = (np.linalg.norm(np.asarray(yt, np.float32) - ref)
               / np.linalg.norm(ref))
        print(f"{name}: OK out={yt.dtype} relerr {rel:.2e}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:400]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)


try_case("bf16 blocks + f32 u ", jnp.bfloat16, u)
try_case("bf16 blocks + bf16 u", jnp.bfloat16, u.astype(jnp.bfloat16))
try_case("f32 ctrl            ", jnp.float32, u)

# banded windowed transpose with bf16 blocks (different kernel, shares
# the overwrite/accumulate window discipline)
cols_b = np.zeros((nbrow, kmax), np.int32)
for bi in range(nbrow):
    q0 = min((bi * 48) // nbrow, 56)
    cols_b[bi] = np.arange(q0, q0 + kmax)
data_b = BSR(blocks=jnp.asarray(blocks).astype(jnp.bfloat16),
             block_cols=jnp.asarray(cols_b),
             shape=(nbrow * bm, nbcol * bn))
op_b = BSROperator(data_b, backend="pallas")
print("banded plan:", op_b.win_q is not None
      and op_b.cols_local is not None, flush=True)
try:
    ytb = op_b.T @ u
    sync(ytb)
    dref = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    for bi in range(nbrow):
        for kk in range(kmax):
            c = cols_b[bi, kk]
            dref[bi * bm:(bi + 1) * bm, c * bn:(c + 1) * bn] += b16[bi, kk]
    ref = dref.T @ np.asarray(u, np.float32)
    print(f"banded bf16 T: OK relerr "
          f"{np.linalg.norm(np.asarray(ytb, np.float32) - ref)/np.linalg.norm(ref):.2e}",
          flush=True)
except Exception as e:
    print(f"banded bf16 T: FAIL {type(e).__name__}: "
          f"{str(e)[:300]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch17 done", flush=True)
