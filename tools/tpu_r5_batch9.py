"""Round-5 TPU batch 9: confirm the shipped chrono-gathered-W G-form
apply hits ~266 us both directions via the REAL operator path
(lo.matvec_chain, bench methodology), check push cost and on-chip parity.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch9.py > tools/tpu_r5_batch9.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

n, mem = 1_000_000, 16
B = lo.LBFGSOperator(jnp.float32, n, mem=mem)
H = lo.InverseLBFGSOperator(jnp.float32, n, mem=mem)
for _ in range(mem):
    s = rng.standard_normal(n).astype(np.float32)
    y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
    B.push(s, y)
    H.push(s, y)

# on-chip parity first
v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
hbv = np.asarray(H @ (B @ v0))
rel = np.linalg.norm(hbv - np.asarray(v0)) / np.linalg.norm(np.asarray(v0))
print(f"H(Bv)=v relerr {rel:.2e}", flush=True)

vt = jnp.ones((n,), jnp.float32)


def f(o, x, iters):
    return lo.matvec_chain(o, x, iters, mode="N")


for name, op in (("fwd", B), ("inv", H)):
    t = marginal_chain_time(f, op, vt, iters_short=50, iters_long=1050,
                            reps=3)
    print(f"lbfgs_{name}_us {t*1e6:8.1f}  (target ~266-281; window [182, 353])",
          flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# push cost (lazy production default)
from jax import lax as _lax

from linops_tpu.qn.lbfgs import _push_plain

s0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
y0 = s0 + 0.1 * jnp.asarray(rng.standard_normal(n).astype(np.float32))


@jax.jit
def push_chain(state, s, y, iters):
    def body(i, st):
        fs = 1.0 + 0.001 * i.astype(jnp.float32)
        return _push_plain(st, s * fs, y * fs, scaling=True, inverse=False,
                           with_ab=False)

    return _lax.fori_loop(0, iters, body, state)


sync(push_chain(B.state, s0, y0, 5))
sync(push_chain(B.state, s0, y0, 55))
ds = []
for _ in range(3):
    t1 = time.perf_counter(); sync(push_chain(B.state, s0, y0, 5)); a = time.perf_counter() - t1
    t1 = time.perf_counter(); sync(push_chain(B.state, s0, y0, 55)); b = time.perf_counter() - t1
    ds.append(b - a)
print(f"lbfgs_push_lazy_us {sorted(ds)[1]/50*1e6:.1f} (r4 ~459)", flush=True)

# eager one-shot latency (dispatch-inclusive, rough): the gathered W
# costs one extra memory pass outside chains — quantify it
for name, op in (("fwd", B), ("inv", H)):
    _ = np.asarray((op @ v0).ravel()[0])
    reps = []
    for _ in range(5):
        t1 = time.perf_counter()
        _ = np.asarray((op @ v0).ravel()[0])
        reps.append(time.perf_counter() - t1)
    print(f"eager_{name}_ms {sorted(reps)[2]*1e3:.1f} (incl ~30ms relay RTT)",
          flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch9 done", flush=True)
