"""Round-4 TPU batch 3: windowed BSR transpose + forward at n=8.4M
(banded, kmax=2, blocks 8.6 GB generated ON DEVICE — host uploads through
the relay are too slow).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch3.py > /tmp/r4b3.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import linops_tpu as lo
from linops_tpu.sparse.formats import BSR
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)

n = 1 << 23           # 8.4M rows/cols
bm, bn, kmax = 8, 128, 2
nbrow = n // bm       # 1.05M (multiple of every R)
nbcol = n // bn
# sliding band: group q advances slowly; per-group span <= kmax+1 blocks
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
block_cols = (q0[:, None] + np.arange(kmax)[None, :]).astype(np.int32)
block_cols = np.minimum(block_cols, nbcol - 1)

import functools


@functools.partial(jax.jit, donate_argnums=0)
def _fill(buf, piece, start):
    return jax.lax.dynamic_update_slice(buf, piece, (start, 0, 0, 0))


PIECES = 8
blocks = jnp.zeros((nbrow, kmax, bm, bn), jnp.float32)
step = nbrow // PIECES
for i in range(PIECES):  # bounded peak: buf + one piece (donated update)
    piece = jax.random.normal(jax.random.PRNGKey(i), (step, kmax, bm, bn),
                              jnp.float32)
    blocks = _fill(blocks, piece, i * step)
    del piece
sync(blocks)
print(f"blocks on device: {blocks.size*4/1e9:.2f} GB", flush=True)

data = BSR(blocks=blocks, block_cols=jnp.asarray(block_cols), shape=(n, n))
t0 = time.perf_counter()
op = BSROperator(data)
print(f"construct+plan: {time.perf_counter()-t0:.2f} s, wb={op._wb}, "
      f"windowed={op.win_q is not None}", flush=True)
assert op.win_q is not None

op_xla = BSROperator(op.data, backend="xla", win_q=op.win_q,
                     cols_local=op.cols_local, _wb=op._wb,
                     _x_pad_blocks=op._x_pad_blocks)

x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
u = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)

# cross-check windowed vs XLA paths on-device (small probes)
y_w = op @ x
y_x = op_xla @ x
dy = float(jnp.linalg.norm(y_w - y_x) / jnp.linalg.norm(y_x))
print("fwd windowed-vs-xla rel:", dy, flush=True)
t_w = op.T @ u
t_x = op_xla.T @ u
dt = float(jnp.linalg.norm(t_w - t_x) / jnp.linalg.norm(t_x))
print("T windowed-vs-xla rel:", dt, flush=True)


def chain(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="N")


def chain_t(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="T")


bytes_blocks = blocks.size * 4

t_f = marginal_chain_time(chain, op, x, iters_short=5, iters_long=55, reps=3)
print(f"windowed fwd: {t_f*1e3:.2f} ms = {bytes_blocks/t_f/1e9:.0f} GB/s",
      flush=True)
t_t = marginal_chain_time(chain_t, op, u, iters_short=5, iters_long=55,
                          reps=3)
print(f"windowed T:   {t_t*1e3:.2f} ms = {bytes_blocks/t_t/1e9:.0f} GB/s",
      flush=True)
t_tx = marginal_chain_time(chain_t, op_xla, u, iters_short=5, iters_long=25,
                           reps=2)
print(f"XLA T:        {t_tx*1e3:.2f} ms = {bytes_blocks/t_tx/1e9:.0f} GB/s",
      flush=True)
print("DONE", flush=True)
