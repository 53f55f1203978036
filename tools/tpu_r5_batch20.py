"""Round-5 TPU batch 20: banded WINDOWED kernels with bf16 blocks at
real scale (n=2.1M > the x-residency bound) — the last chip-unverified
kernel/dtype combination after the f32-accumulator patch.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch20.py > tools/tpu_r5_batch20.log 2>&1 &
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

nw = 1 << 21
bm, bn, kmax = 8, 128, 2
nbrow, nbcol = nw // bm, nw // bn
bi = np.arange(nbrow, dtype=np.int64)
q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
bc = np.minimum(q0[:, None] + np.arange(kmax)[None, :], nbcol - 1)
blocks16 = jax.random.normal(jax.random.PRNGKey(3),
                             (nbrow, kmax, bm, bn),
                             jnp.float32).astype(jnp.bfloat16)
sync(blocks16)
op = lo.BSROperator(BSR(blocks=blocks16,
                        block_cols=jnp.asarray(bc.astype(np.int32)),
                        shape=(nw, nw)))
print("banded plan:", op.win_q is not None and op.cols_local is not None,
      "wb:", op._wb, flush=True)

v = jnp.ones((nw,), jnp.float32)
# correctness vs the XLA backend on-chip
opx = lo.BSROperator(op.data, backend="xla")
for name, mode in (("fwd", "N"), ("T  ", "T")):
    try:
        y = np.asarray(op.matvec(v, mode=mode), np.float32)
        ref = np.asarray(opx.matvec(v, mode=mode), np.float32)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        print(f"banded bf16 windowed {name}: OK relerr {rel:.2e}",
              flush=True)
    except Exception as e:
        print(f"banded bf16 windowed {name}: FAIL {type(e).__name__}: "
              f"{str(e)[:250]}", flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

byts = float(blocks16.size * 2)
for name, mode in (("fwd", "N"), ("T", "T")):
    t = marginal_chain_time(
        lambda o, x, iters, m=mode: lo.matvec_chain(o, x, iters, mode=m),
        op, v, iters_short=5, iters_long=55, reps=2)
    print(f"banded bf16 windowed {name}: {byts/t/1e9:.1f} GB/s logical "
          f"({t*1e6:.0f} us)", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch20 done", flush=True)
