"""Round-5 TPU batch 2: L-BFGS apply timing with the push-maintained
middle matrix G (zero factorizations at apply), + push cost check.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch2.py > tools/tpu_r5_batch2.log 2>&1 &
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
Bt = lo.LBFGSOperator(jnp.float32, n, mem=mem)
Ht = lo.InverseLBFGSOperator(jnp.float32, n, mem=mem)
for _ in range(mem):
    s = rng.standard_normal(n).astype(np.float32)
    y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
    Bt.push(s, y)
    Ht.push(s, y)
# quick correctness cross-check on chip before timing
v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
bv = Bt @ v0
hbv = np.asarray(Ht @ bv)
rel = np.linalg.norm(hbv - np.asarray(v0)) / np.linalg.norm(np.asarray(v0))
print(f"H(Bv)=v relerr {rel:.2e} (want <1e-3 at n=1e6 f32)", flush=True)

vt = jnp.ones((n,), jnp.float32)


def f(o, x, iters):
    return lo.matvec_chain(o, x, iters, mode="N")


for name, op in (("fwd", Bt), ("inv", Ht)):
    t = marginal_chain_time(f, op, vt, iters_short=50, iters_long=1050, reps=3)
    print(f"lbfgs_{name}_us {t*1e6:.1f}  (window [182, 353]; r4: fwd 397 inv 305)",
          flush=True)
print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# push cost: lazy-ab chain (the production default) — the G refresh adds
# O(mem^3) small ops per push; r4 baseline lbfgs_push_lazy_us ~?
from jax import lax as _lax

from linops_tpu.qn.lbfgs import _push_plain

s0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
y0 = s0 + 0.1 * jnp.asarray(rng.standard_normal(n).astype(np.float32))


def make_push_chain(with_ab):
    @jax.jit
    def chain(state, s, y, iters):
        def body(i, st):
            fscl = 1.0 + 0.001 * i.astype(jnp.float32)
            return _push_plain(st, s * fscl, y * fscl, scaling=True,
                               inverse=False, with_ab=with_ab)

        return _lax.fori_loop(0, iters, body, state)

    return chain


Bp = lo.LBFGSOperator(jnp.float32, n, mem=mem)
for name, with_ab in (("lazy", False), ("eager", True)):
    chain = make_push_chain(with_ab)
    sync(chain(Bp.state, s0, y0, 5))
    sync(chain(Bp.state, s0, y0, 55))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(chain(Bp.state, s0, y0, 5)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(chain(Bp.state, s0, y0, 55)); b = time.perf_counter() - t1
        ds.append(b - a)
    print(f"lbfgs_push_{name}_us {sorted(ds)[1]/50*1e6:.1f}", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch2 done", flush=True)
