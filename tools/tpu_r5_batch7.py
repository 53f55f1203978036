"""Round-5 TPU batch 7: pin the fast L-BFGS apply form.

batch6: r2_fwd (in-graph materialized W + dense solve) 281; stacked
closure-constant W 350; separate S/Y passes 395-399; old_inv 309.
Candidate fix: W = concat(S, Y) IN-GRAPH (hoisted in chains) + G matvec.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch7.py > tools/tpu_r5_batch7.log 2>&1 &
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
W2c = jnp.concatenate([st.S, st.Y], axis=0)


def v_g_concat_W(state, x):
    """THE candidate fix: in-graph W + G middle, single stacked passes."""
    W = jnp.concatenate([state.S, state.Y], axis=0)
    coef = pmatmul(state.G, pmatmul(W, x))
    return state.gamma * x + pmatmul(W.T, coef)


def v_stackedW_arg(state, W, x):
    coef = pmatmul(state.G, pmatmul(W, x))
    return state.gamma * x + pmatmul(W.T, coef)


def v_r2_gmid(state, x):
    from linops_tpu.qn.lbfgs import _forward_compact_parts

    theta, K, W = _forward_compact_parts(state)
    coef = pmatmul(state.G, pmatmul(W, x))  # algebra nonsense; cost probe
    return theta * x - pmatmul(W.T, coef)


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


def chain_fn(fn, with_w=False):
    @jax.jit
    def chain(state, x, iters):
        def body(_, v):
            v2 = fn(state, W2c, v) if with_w else fn(state, v)
            return v2 / jnp.linalg.norm(v2)

        return lax.fori_loop(0, iters, body, x)

    @jax.jit
    def chain_w(state, W, x, iters):
        def body(_, v):
            v2 = fn(state, W, v)
            return v2 / jnp.linalg.norm(v2)

        return lax.fori_loop(0, iters, body, x)

    return chain_w if with_w else chain


x0 = jnp.ones((n,), jnp.float32)


def timeit(ch, args):
    sync(ch(*args, 50))
    sync(ch(*args, 1050))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(ch(*args, 50)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(ch(*args, 1050)); b = time.perf_counter() - t1
        ds.append(b - a)
    return sorted(ds)[1] / 1000


for name, fn, with_w in (
    ("g_concat_W", v_g_concat_W, False),
    ("stackedW_arg", v_stackedW_arg, True),
    ("r2_gmid", v_r2_gmid, False),
    ("old_inv_ctrl", v_old_inv, False),
):
    ch = chain_fn(fn, with_w)
    args = (st, W2c, x0) if with_w else (st, x0)
    print(f"{name:16s} {timeit(ch, args)*1e6:8.1f} us", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)

# eager one-shot cost of the concat-W form (unhoisted concat): marginal
# over a 2-apply vs 1-apply jit is messy — instead time a chain of the
# UNHOISTABLE variant (concat depends on the loop counter via a 0* term)
def v_g_concat_W_unhoist(state, x, i):
    W = jnp.concatenate([state.S, state.Y + 0.0 * i], axis=0)
    coef = pmatmul(state.G, pmatmul(W, x))
    return state.gamma * x + pmatmul(W.T, coef)


@jax.jit
def chain_u(state, x, iters):
    def body(i, v):
        v2 = v_g_concat_W_unhoist(state, v, i.astype(jnp.float32))
        return v2 / jnp.linalg.norm(v2)

    return lax.fori_loop(0, iters, body, x)


print(f"g_concatW_unhoisted {timeit(chain_u, (st, x0))*1e6:8.1f} us",
      flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch7 done", flush=True)
