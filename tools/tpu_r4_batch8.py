"""Round-4 TPU batch 8: packed-layout A/B for the RESIDENT kernels + the
windowed op-path re-timing with t_out/t_in now wired in ops.py.

  a. 8x128 bench shape (n=65536, kmax=8): fwd lane-major cols with/without
     t_out, transpose with/without t_in — against the r3 baselines
     (fwd 690-712, T 678-689 GB/s).
  b. n=4.2M banded via lo.matvec_chain: fwd (was 443) and T (was 611).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch8.py > /tmp/r4b8.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import linops_tpu as lo
from linops_tpu.kernels.bsr_spmv import (bsr_matvec_pallas,
                                         bsr_rmatvec_pallas)
from linops_tpu.sparse.formats import BSR
from linops_tpu.sparse.ops import BSROperator
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)

# --- a. resident 8x128 bench shape ----------------------------------------
ns = 65536
rng = np.random.default_rng(0)
blocks8 = jax.random.normal(jax.random.PRNGKey(2), (ns // 8, 8, 8, 128),
                            jnp.float32)
cols8 = jnp.asarray(rng.integers(0, ns // 128, size=(ns // 8, 8))
                    .astype(np.int32))
sync(blocks8)
xs = jax.random.normal(jax.random.PRNGKey(3), (ns // 128, 128), jnp.float32)
us = jax.random.normal(jax.random.PRNGKey(4), (ns // 8, 8), jnp.float32)
bytes8 = blocks8.size * 4

# correctness refs via the XLA op
opx = BSROperator(BSR(blocks=blocks8, block_cols=cols8, shape=(ns, ns)),
                  backend="xla")
y_ref = opx @ xs.reshape(-1)
t_ref = opx.T @ us.reshape(-1)

yA = bsr_matvec_pallas(blocks8, cols8, xs)                       # (nbrow, 8)
yB = bsr_matvec_pallas(blocks8, cols8, xs, t_out=True)           # (8, nbrow)
dA = float(jnp.linalg.norm(yA.reshape(-1) - y_ref) / jnp.linalg.norm(y_ref))
dB = float(jnp.linalg.norm(yB.T.reshape(-1) - y_ref) / jnp.linalg.norm(y_ref))
tA = bsr_rmatvec_pallas(blocks8, cols8, us, ns // 128)
tB = bsr_rmatvec_pallas(blocks8, cols8, us.T, ns // 128, t_in=True)
dTA = float(jnp.linalg.norm(tA.reshape(-1) - t_ref) / jnp.linalg.norm(t_ref))
dTB = float(jnp.linalg.norm(tB.reshape(-1) - t_ref) / jnp.linalg.norm(t_ref))
print(f"rels fwd {dA:.1e}/{dB:.1e}  T {dTA:.1e}/{dTB:.1e}", flush=True)


def timeit(name, step):
    @jax.jit
    def chain(iters):
        def body(_, carry):
            y = step(carry)
            return y.reshape(-1)[:1].reshape(()) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    sync(chain(1))
    pers = []
    for _ in range(3):
        t0 = time.perf_counter(); sync(chain(20))
        a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(chain(220))
        b = time.perf_counter() - t0
        pers.append((b - a) / 200)
    per = float(np.median(pers))
    print(f"{name}: {per*1e6:.1f} us = {bytes8/per/1e9:.0f} GB/s", flush=True)


timeit("fwd (nbrow,8) out ",
       lambda c: bsr_matvec_pallas(blocks8, cols8, xs + c))
timeit("fwd (8,nbrow) tout",
       lambda c: bsr_matvec_pallas(blocks8, cols8, xs + c, t_out=True))
timeit("fwd tout + host .T",
       lambda c: bsr_matvec_pallas(blocks8, cols8, xs + c,
                                   t_out=True).T.reshape(-1))
timeit("T   (nbrow,8) in  ",
       lambda c: bsr_rmatvec_pallas(blocks8, cols8, us + c, ns // 128))
timeit("T   (8,nbrow) tin ",
       lambda c: bsr_rmatvec_pallas(blocks8, cols8, (us + c).T, ns // 128,
                                    t_in=True))

del blocks8, cols8, xs, us, opx, y_ref, t_ref, yA, yB, tA, tB
import gc
gc.collect()

# --- b. windowed via-op at n=4.2M ------------------------------------------
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
bw = blocks.size * 4

opx2 = BSROperator(op.data, backend="xla", win_q=op.win_q,
                   cols_local=op.cols_local, _wb=op._wb,
                   _x_pad_blocks=op._x_pad_blocks)
print("win fwd rel:", float(jnp.linalg.norm(op @ x - opx2 @ x)
                            / jnp.linalg.norm(opx2 @ x)), flush=True)
print("win T rel:", float(jnp.linalg.norm(op.T @ x - opx2.T @ x)
                          / jnp.linalg.norm(opx2.T @ x)), flush=True)

for mode, label in (("N", "win fwd via-op"), ("T", "win T via-op  ")):
    t = marginal_chain_time(
        lambda o, v, iters, m=mode: lo.matvec_chain(o, v, iters, mode=m),
        op, x, iters_short=5, iters_long=55, reps=3)
    print(f"{label}: {t*1e3:.2f} ms = {bw/t/1e9:.0f} GB/s", flush=True)
print("DONE", flush=True)
