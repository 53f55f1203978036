"""Round-5 TPU batch 8: make the 267-us L-BFGS apply form reachable from
inside the operator (defeat LICM on the W concat without a loop handle).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch8.py > tools/tpu_r5_batch8.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import linops_tpu as lo
from linops_tpu.core.precision import pmatmul
from linops_tpu.utils.timing import sync

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


def apply_eps(state, x, inverse):
    """W concat scaled by an x-dependent exact 1.0 (unhoistable)."""
    scale = state.gamma if inverse else 1.0 / state.gamma
    one = 1.0 + 0.0 * x[0]
    W = jnp.concatenate([state.S, state.Y], axis=0) * one
    coef = pmatmul(state.G, pmatmul(W, x))
    return scale * x + pmatmul(W.T, coef)


def apply_barrier(state, x, inverse):
    """W concat behind an optimization_barrier (move-blocked)."""
    scale = state.gamma if inverse else 1.0 / state.gamma
    W = lax.optimization_barrier(
        jnp.concatenate([state.S, state.Y], axis=0))
    coef = pmatmul(state.G, pmatmul(W, x))
    return scale * x + pmatmul(W.T, coef)


def chain_fn(fn, inverse):
    @jax.jit
    def chain(state, x, iters):
        def body(_, v):
            v2 = fn(state, v, inverse)
            return v2 / jnp.linalg.norm(v2)

        return lax.fori_loop(0, iters, body, x)

    return chain


def timeit(ch, args):
    sync(ch(*args, 50))
    sync(ch(*args, 1050))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(ch(*args, 50)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(ch(*args, 1050)); b = time.perf_counter() - t1
        ds.append(b - a)
    return sorted(ds)[1] / 1000


x0 = jnp.ones((n,), jnp.float32)
for name, fn in (("eps", apply_eps), ("barrier", apply_barrier)):
    for label, st_, inv in (("fwd", B.state, False), ("inv", H.state, True)):
        t = timeit(chain_fn(fn, inv), (st_, x0))
        print(f"{name}_{label:3s} {t*1e6:8.1f} us", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# correctness on-chip: eps form vs a/b oracle and two-loop oracle
from linops_tpu.qn.lbfgs import forward_apply, inverse_apply

v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
bv = np.asarray(jax.jit(apply_eps, static_argnums=2)(B.state, v0, False))
bv_ref = np.asarray(forward_apply(B._materialized_state(), v0))
print("fwd eps relerr", np.linalg.norm(bv - bv_ref) / np.linalg.norm(bv_ref),
      flush=True)
hv = np.asarray(jax.jit(apply_eps, static_argnums=2)(H.state, v0, True))
hv_ref = np.asarray(inverse_apply(H.state, v0))
print("inv eps relerr", np.linalg.norm(hv - hv_ref) / np.linalg.norm(hv_ref),
      flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch8 done", flush=True)
