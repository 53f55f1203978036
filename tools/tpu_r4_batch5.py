"""Round-4 TPU batch 5: reconcile windowed-forward timings.

Batch 3 measured 440 GB/s through lo.matvec_chain(op, ...) while batch 4
measured 626 GB/s for the identical kernel driven directly. Same chip,
same shape — find the gap (operator-path overhead? relay jitter? median
vs min?).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch5.py > /tmp/r4b5.log 2>&1 &
"""
import functools
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

n = 1 << 22
bm, bn, kmax = 8, 128, 2
nbrow, nbcol = n // bm, n // bn
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
block_cols = np.minimum(q0[:, None] + np.arange(kmax)[None, :],
                        nbcol - 1).astype(np.int32)
blocks = jax.random.normal(jax.random.PRNGKey(0), (nbrow, kmax, bm, bn),
                           jnp.float32)
sync(blocks)
op = BSROperator(BSR(blocks=blocks, block_cols=jnp.asarray(block_cols),
                     shape=(n, n)))
assert op.win_q is not None
x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
bytes_blocks = blocks.size * 4


def chain(o, v, iters):
    return lo.matvec_chain(o, v, iters, mode="N")


# batch-3 style: median of 3
t_med = marginal_chain_time(chain, op, x, iters_short=5, iters_long=55,
                            reps=3)
print(f"op-chain median3: {t_med*1e3:.2f} ms = "
      f"{bytes_blocks/t_med/1e9:.0f} GB/s", flush=True)

# same, but report every delta
sync(chain(op, x, 5)); sync(chain(op, x, 55))
for r in range(4):
    t0 = time.perf_counter(); sync(chain(op, x, 5))
    a = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(chain(op, x, 55))
    b = time.perf_counter() - t0
    per = (b - a) / 50
    print(f"  rep{r}: short {a*1e3:.1f} ms long {b*1e3:.1f} ms -> "
          f"{per*1e3:.2f} ms/iter = {bytes_blocks/per/1e9:.0f} GB/s",
          flush=True)

print("DONE", flush=True)
