"""Round-5 TPU batch 3: L-BFGS apply variant A/B at n=1e6, mem=16.

Isolates where the ~90 us between the r4 inverse (305) and the G-form
applies (395) lives: middle-stage form, concat, or pass structure.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch3.py > tools/tpu_r5_batch3.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import linops_tpu as lo
from linops_tpu.core.precision import pmatmul
from linops_tpu.utils.timing import sync
from linops_tpu.qn.lbfgs import _safe_inv

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
W2 = jnp.concatenate([st.S, st.Y], axis=0)  # prestacked (2mem, n)
coef_fix = jnp.asarray(rng.standard_normal(2 * mem).astype(np.float32))


def v_g(state, x):
    """current G-form apply (what _compact_apply does)."""
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    return state.gamma * x + pmatmul(state.S.T, coef[:mem]) + pmatmul(
        state.Y.T, coef[mem:])


def v_g_noconcat(state, x):
    """G split into blocks — no concat/slice on the coefficient path."""
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    G = state.G
    c1 = pmatmul(G[:mem, :mem], ps) + pmatmul(G[:mem, mem:], qs)
    c2 = pmatmul(G[mem:, :mem], ps) + pmatmul(G[mem:, mem:], qs)
    return state.gamma * x + pmatmul(state.S.T, c1) + pmatmul(state.Y.T, c2)


def v_old_inv(state, x):
    """r4 inverse compact: chrono gathers + two triangular solves."""
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


def v_floor2(state, x):
    """two passes, NO middle stage at all (normalized: not the same map)."""
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    return state.gamma * x + pmatmul(state.S.T, ps) + pmatmul(state.Y.T, qs)


def v_floor2_w(state, x):
    """two passes over ONE prestacked (2mem, n) array + G matvec."""
    p2 = pmatmul(W2, x)
    coef = pmatmul(state.G, p2)
    return state.gamma * x + pmatmul(W2.T, coef)


def v_floor1(state, x):
    """ONE pass (output side only) — the 1-pass streaming floor."""
    return state.gamma * x + pmatmul(W2.T, coef_fix * x[0])


variants = [
    ("g_form", v_g),
    ("g_noconcat", v_g_noconcat),
    ("old_inv", v_old_inv),
    ("floor2_nomiddle", v_floor2),
    ("floor2_stackedW", v_floor2_w),
    ("floor1_outonly", v_floor1),
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
print("batch3 done", flush=True)
