"""Round-4 TPU batch 14: windowed-forward via-op relayout A/B.

The via-op windowed forward (576 GB/s) trails the direct kernel (626+)
by the host packed->flat relayout `y.T.reshape(-1)`. Candidates, each
timed as the SAME chain (flat x -> reshape -> windowed kernel t_out ->
relayout -> flat y):

  A. y.T.reshape(-1)                      (current, ops.py::_prod)
  B. lax.reshape(y, (N,), dimensions=(1,0))  (fused transpose+reshape)
  C. t_out=False, y.reshape(-1)           (the r3 443 GB/s path, sanity)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch14.py > /tmp/r4b14.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

import linops_tpu as lo
from linops_tpu.sparse.formats import BSR
from linops_tpu.kernels.bsr_spmv import bsr_matvec_pallas_windowed
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)

nw = 1 << 22
bm, bn, kmax = 8, 128, 2
nbrow, nbcol = nw // bm, nw // bn
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
bc = np.minimum((q0[:, None] + np.arange(kmax)[None, :]), nbcol - 1)
blocks = jax.random.normal(jax.random.PRNGKey(11), (nbrow, kmax, bm, bn),
                           jnp.float32)
sync(blocks)
op = lo.BSROperator(BSR(blocks=blocks, block_cols=jnp.asarray(
    bc.astype(np.int32)), shape=(nw, nw)))
assert op.win_q is not None and op.cols_local is not None
cols_local, win_q, wb, xpad = (op.cols_local, op.win_q, op._wb,
                               op._x_pad_blocks)
byts = float(blocks.size * 4)
v = jnp.ones((nw,), jnp.float32)


def chain(relayout, t_out):
    # blocks/cols/win_q MUST be jit ARGS: closing over them embeds 4.3 GB
    # as HLO constants and the relay rejects the body (dev-notes r4)
    @jax.jit
    def f(blk, cl, wq, x, iters):
        def body(_, xc):
            xb = xc.reshape(nbcol, bn)
            y = bsr_matvec_pallas_windowed(blk, cl, wq, xb, wb=wb,
                                           x_pad_blocks=xpad, t_out=t_out)
            return relayout(y) * jnp.float32(1e-3)
        return lax.fori_loop(0, iters, body, x)
    return lambda x, iters: f(blocks, cols_local, win_q, x, iters)


variants = {
    "A .T.reshape    ": chain(lambda y: y.T.reshape(-1), True),
    "B lax.reshape   ": chain(
        lambda y: lax.reshape(y, (nbrow * bm,), dimensions=(1, 0)), True),
    "C t_out=False   ": chain(lambda y: y.reshape(-1), False),
}


def measure(name, fn, iters=(5, 35), reps=3):
    sync(fn(v, iters[0]))
    sync(fn(v, iters[1]))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(v, iters[0]))
        a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(fn(v, iters[1]))
        b = time.perf_counter() - t0
        pers.append((b - a) / (iters[1] - iters[0]))
    per = float(np.median(pers))
    print(f"{name}: {per*1e6:.0f} us = {byts/per/1e9:.0f} GB/s (deltas "
          + " ".join(f"{q*1e6:.0f}" for q in pers) + ")", flush=True)
    return per


# agreement first (one step each)
ya = np.asarray(variants["A .T.reshape    "](v, 1)[:128])
yb = np.asarray(variants["B lax.reshape   "](v, 1)[:128])
yc = np.asarray(variants["C t_out=False   "](v, 1)[:128])
print("B==A:", np.allclose(ya, yb), " C==A:", np.allclose(ya, yc),
      flush=True)

for name, fn in variants.items():
    measure(name, fn)
print("DONE", flush=True)
