"""Round-5 TPU batch 4: why does a trivial middle stage cost +87 us?

batch3: old_inv (triangular middle) 310 us; g_form / no-middle 396-399;
stacked-W 347; 1-pass floor 178. Hypothesis: XLA fuses the first pass,
small stage, and second pass into a pessimal program unless the middle is
opaque — test with optimization_barrier placements.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch4.py > tools/tpu_r5_batch4.log 2>&1 &
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
H = lo.InverseLBFGSOperator(jnp.float32, n, mem=mem)
for _ in range(mem):
    s = rng.standard_normal(n).astype(np.float32)
    y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
    H.push(s, y)
st = H.state
W2 = jnp.concatenate([st.S, st.Y], axis=0)


def v_g(state, x):
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    return state.gamma * x + pmatmul(state.S.T, coef[:mem]) + pmatmul(
        state.Y.T, coef[mem:])


def v_g_barrier(state, x):
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    ps, qs = lax.optimization_barrier((ps, qs))
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    coef = lax.optimization_barrier(coef)
    return state.gamma * x + pmatmul(state.S.T, coef[:mem]) + pmatmul(
        state.Y.T, coef[mem:])


def v_g_barrier_pre(state, x):
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    ps, qs = lax.optimization_barrier((ps, qs))
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    return state.gamma * x + pmatmul(state.S.T, coef[:mem]) + pmatmul(
        state.Y.T, coef[mem:])


def v_g_barrier_post(state, x):
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    coef = lax.optimization_barrier(coef)
    return state.gamma * x + pmatmul(state.S.T, coef[:mem]) + pmatmul(
        state.Y.T, coef[mem:])


def v_w_barrier(state, x):
    p2 = pmatmul(W2, x)
    coef = pmatmul(state.G, p2)
    coef = lax.optimization_barrier(coef)
    return state.gamma * x + pmatmul(W2.T, coef)


def v_chrono(state, x):
    """G-form with old_inv's gather/scatter around the small stage."""
    order = jnp.mod(state.insert + jnp.arange(mem), mem)
    ps = pmatmul(state.S, x)[order]
    qs = pmatmul(state.Y, x)[order]
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    c1 = jnp.zeros_like(coef[:mem]).at[order].set(coef[:mem])
    c2 = jnp.zeros_like(coef[mem:]).at[order].set(coef[mem:])
    return state.gamma * x + pmatmul(state.S.T, c1) + pmatmul(state.Y.T, c2)


def v_old_inv(state, x):
    from jax.scipy.linalg import solve_triangular

    order = jnp.mod(state.insert + jnp.arange(mem), mem)
    valid = state.ys[order] != 0
    SY_o = state.SY[order][:, order]
    YY_o = state.YY[order][:, order]
    gamma = state.gamma
    vmask2 = valid[:, None] & valid[None, :]
    tri = jnp.triu(jnp.ones((mem, mem), dtype=bool))
    R = jnp.where(tri & vmask2, SY_o, 0.0) + jnp.diag(
        jnp.where(valid, 0.0, 1.0))
    D = jnp.where(valid, jnp.diag(SY_o), 0.0)
    YYm = jnp.where(vmask2, YY_o, 0.0)
    p = pmatmul(state.S, x)[order]
    q = pmatmul(state.Y, x)[order]
    w1 = solve_triangular(R, p, lower=False)
    u = D * w1 + gamma * pmatmul(YYm, w1) - gamma * q
    w2 = solve_triangular(R, u, lower=False, trans=1)
    w2_s = jnp.zeros_like(w2).at[order].set(w2)
    w1_s = jnp.zeros_like(w1).at[order].set(w1)
    return gamma * x + pmatmul(state.S.T, w2_s) - gamma * pmatmul(
        state.Y.T, w1_s)


variants = [
    ("g_barrier_both", v_g_barrier),
    ("g_barrier_pre", v_g_barrier_pre),
    ("g_barrier_post", v_g_barrier_post),
    ("stackedW_barrier", v_w_barrier),
    ("chrono_gather", v_chrono),
    ("old_inv_ctrl", v_old_inv),
    ("g_form_ctrl", v_g),
]


def chain_fn(fn):
    @jax.jit
    def chain(state, x, iters):
        def body(_, v):
            v2 = fn(state, v)
            return v2 * lax.rsqrt(jnp.sum(v2 * v2) / n)

        return lax.fori_loop(0, iters, body, x)

    return chain


x0 = jnp.ones((n,), jnp.float32)
for name, fn in variants:
    ch = chain_fn(fn)
    sync(ch(st, x0, 50))
    sync(ch(st, x0, 1050))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(ch(st, x0, 50)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(ch(st, x0, 1050)); b = time.perf_counter() - t1
        ds.append(b - a)
    print(f"{name:18s} {sorted(ds)[1]/1000*1e6:8.1f} us", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)
print("batch4 done", flush=True)
