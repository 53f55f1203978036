"""Round-5 TPU batch 6: isolate the +85 us L-BFGS apply mystery.

batch3/4: middles WITH triangular solves (old_inv 309, r2 fwd 279.6) beat
matmul-only/no-middle forms (395-399) in chains. Variants isolate: solve
vs matmul middle at identical structure, dependency chains, sign/scale
shape, the exact r2 form, and stacked-W + solve.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch6.py > tools/tpu_r5_batch6.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import solve_triangular

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

# host-side precomputed small pieces (concrete, closed over)
order_h = np.mod(int(st.insert) + np.arange(mem), mem)
SY_h = np.asarray(st.SY)[order_h][:, order_h]
YY_h = np.asarray(st.YY)[order_h][:, order_h]
R_h = np.triu(SY_h)
Rinv_h = np.linalg.inv(R_h).astype(np.float32)
D_h = np.diag(SY_h).astype(np.float32)
R_cap = jnp.asarray(R_h.astype(np.float32))
Rinv = jnp.asarray(Rinv_h)
RinvT = jnp.asarray(Rinv_h.T.copy())
Dv = jnp.asarray(D_h)
YYm = jnp.asarray(YY_h.astype(np.float32))
W2 = jnp.concatenate([st.S, st.Y], axis=0)
order = jnp.asarray(order_h.astype(np.int32))


def v_old_inv_solve(state, x):
    """control: old_inv with in-apply R build + solves (309 in batch3/4)."""
    gamma = state.gamma
    p = pmatmul(state.S, x)[order]
    q = pmatmul(state.Y, x)[order]
    w1 = solve_triangular(R_cap, p, lower=False)
    u = Dv * w1 + gamma * pmatmul(YYm, w1) - gamma * q
    w2 = solve_triangular(R_cap, u, lower=False, trans=1)
    w2_s = jnp.zeros_like(w2).at[order].set(w2)
    w1_s = jnp.zeros_like(w1).at[order].set(w1)
    return gamma * x + pmatmul(state.S.T, w2_s) - gamma * pmatmul(
        state.Y.T, w1_s)


def v_old_inv_matmul(state, x):
    """same structure, solves replaced by precomputed-inverse matmuls."""
    gamma = state.gamma
    p = pmatmul(state.S, x)[order]
    q = pmatmul(state.Y, x)[order]
    w1 = pmatmul(Rinv, p)
    u = Dv * w1 + gamma * pmatmul(YYm, w1) - gamma * q
    w2 = pmatmul(RinvT, u)
    w2_s = jnp.zeros_like(w2).at[order].set(w2)
    w1_s = jnp.zeros_like(w1).at[order].set(w1)
    return gamma * x + pmatmul(state.S.T, w2_s) - gamma * pmatmul(
        state.Y.T, w1_s)


def v_g_minus(state, x):
    """g_form with old_inv's sign/scale tree on the output pass."""
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    coef = pmatmul(state.G, jnp.concatenate([ps, qs]))
    return state.gamma * x + pmatmul(state.S.T, coef[:mem]) - state.gamma * (
        pmatmul(state.Y.T, -coef[mem:] / state.gamma))


def v_r2_fwd(state, x):
    """exact r2 forward: materialized chrono W + dense K solve."""
    from linops_tpu.qn.lbfgs import _forward_compact_parts

    theta, K, W = _forward_compact_parts(state)
    coef = jnp.linalg.solve(K, pmatmul(W, x))
    return theta * x - pmatmul(W.T, coef)


def v_stackedW_solve(state, x):
    """stacked W2 + triangular-solve middle (structurally nonsense but
    cost-isomorphic: does [stacked + solve] reproduce ~280?)"""
    p2 = pmatmul(W2, x)
    w1 = solve_triangular(R_cap, p2[:mem], lower=False)
    w2 = solve_triangular(R_cap, p2[mem:] + Dv * w1, lower=False, trans=1)
    coef = jnp.concatenate([w1, w2])
    return state.gamma * x + pmatmul(W2.T, coef)


def v_g_chain_dep(state, x):
    """g_form with a two-stage dependency in the middle (no solve)."""
    ps = pmatmul(state.S, x)
    qs = pmatmul(state.Y, x)
    c1 = pmatmul(state.G[:mem, :mem], ps) + pmatmul(state.G[:mem, mem:], qs)
    u = Dv * c1 + state.gamma * pmatmul(YYm, c1) - state.gamma * qs
    c2 = pmatmul(RinvT, u)
    return state.gamma * x + pmatmul(state.S.T, c1) + pmatmul(state.Y.T, c2)


variants = [
    ("old_inv_solve", v_old_inv_solve),
    ("old_inv_matmul", v_old_inv_matmul),
    ("g_minus", v_g_minus),
    ("r2_fwd", v_r2_fwd),
    ("stackedW_solve", v_stackedW_solve),
    ("g_chain_dep", v_g_chain_dep),
]


def chain_fn(fn):
    @jax.jit
    def chain(state, x, iters):
        def body(_, v):
            v2 = fn(state, v)
            return v2 / jnp.linalg.norm(v2)

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
print("batch6 done", flush=True)
