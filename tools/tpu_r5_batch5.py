"""Round-5 TPU batch 5: LOBPCG per-iteration decomposition at k=2 on the
2048^2 5-point stencil (n=4.19M) — VERDICT r4 weak #4 / item 7.

Times the current body (control ~7.5 ms/iter), the body with
orthonormalization stripped, with the apply stripped, and the floor of a
redesigned single-Gram iteration (1 apply + 1 joint Gram + 1 update
matmul + small eigh).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch5.py > tools/tpu_r5_batch5.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import linops_tpu as lo
from linops_tpu.core.precision import pmatmul
from linops_tpu.utils.eig import _svqb_t
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
t0 = time.time()

ng = 2048
op = lo.laplacian_2d(ng, ng, dtype=jnp.float32)
n = ng * ng
k = 2

key = jax.random.PRNGKey(0)
X0 = jax.random.normal(key, (k, n), jnp.float32)


def rr_from_H(H, clipped, k):
    H = 0.5 * (H + H.T)
    big = 2.0 * jnp.max(jnp.sum(jnp.abs(H), axis=1)) + 1.0
    H = H + jnp.diag(jnp.where(clipped, big, 0.0)).astype(H.dtype)
    w, C = jnp.linalg.eigh(H)
    idx = jnp.arange(k)
    return jnp.real(w)[idx], C[:, idx]


def gs_t(Yt, Zt, passes=2):
    for _ in range(passes):
        Yt = Yt - pmatmul(pmatmul(Yt, Zt.T), Zt)
    return Yt


def body_full(op, Xt, AXt, Pt, theta):
    Rt = AXt - theta[:, None] * Xt
    Wt = gs_t(Rt, Xt)
    Wt, cW = _svqb_t(Wt)
    XWt = jnp.concatenate([Xt, Wt], axis=0)
    Pbt = gs_t(Pt, XWt)
    Pbt, cP = _svqb_t(Pbt)
    St = jnp.concatenate([XWt, Pbt], axis=0)
    clipped = jnp.concatenate([jnp.zeros((k,), bool), cW, cP])
    ASt = op.apply_matrix_t(St, "N")
    H = pmatmul(St, ASt.T)
    theta_new, C = rr_from_H(H, clipped, k)
    Cp = C.at[:k, :].set(0)
    OUT = pmatmul(jnp.concatenate([C, Cp], axis=1).T, St)
    Xn, Pn = OUT[:k], OUT[k:]
    AXn = pmatmul(C.T, ASt)
    return Xn, AXn, Pn, theta_new


def body_no_orth(op, Xt, AXt, Pt, theta):
    Rt = AXt - theta[:, None] * Xt
    Wt = Rt
    XWt = jnp.concatenate([Xt, Wt], axis=0)
    St = jnp.concatenate([XWt, Pt], axis=0)
    clipped = jnp.zeros((3 * k,), bool)
    ASt = op.apply_matrix_t(St, "N")
    H = pmatmul(St, ASt.T)
    theta_new, C = rr_from_H(H, clipped, k)
    Cp = C.at[:k, :].set(0)
    OUT = pmatmul(jnp.concatenate([C, Cp], axis=1).T, St)
    Xn, Pn = OUT[:k], OUT[k:]
    AXn = pmatmul(C.T, ASt)
    return Xn, AXn, Pn, theta_new


def body_no_apply(op, Xt, AXt, Pt, theta):
    Rt = AXt - theta[:, None] * Xt
    Wt = gs_t(Rt, Xt)
    Wt, cW = _svqb_t(Wt)
    XWt = jnp.concatenate([Xt, Wt], axis=0)
    Pbt = gs_t(Pt, XWt)
    Pbt, cP = _svqb_t(Pbt)
    St = jnp.concatenate([XWt, Pbt], axis=0)
    clipped = jnp.concatenate([jnp.zeros((k,), bool), cW, cP])
    ASt = St * 2.0  # stand-in for the operator apply
    H = pmatmul(St, ASt.T)
    theta_new, C = rr_from_H(H, clipped, k)
    Cp = C.at[:k, :].set(0)
    OUT = pmatmul(jnp.concatenate([C, Cp], axis=1).T, St)
    Xn, Pn = OUT[:k], OUT[k:]
    AXn = pmatmul(C.T, ASt)
    return Xn, AXn, Pn, theta_new


def body_redesign_floor(op, St, ASt, theta):
    """Floor of the single-Gram iteration: 1 apply (3k) + 1 joint Gram
    (6k x 6k over n) + small-space transforms + 1 update matmul.
    Not numerically meaningful — times the big-array term structure."""
    B = jnp.concatenate([St, ASt], axis=0)  # (6k, n)
    G6 = pmatmul(B, B.T)  # ONE traversal of both panels
    # small-space stand-ins: whitening + RR + transform build (all tiny)
    w, V = jnp.linalg.eigh(G6[: 3 * k, : 3 * k])
    T = (V * lax.rsqrt(jnp.abs(w) + 1.0)[None, :])  # (3k, 3k)
    w2, C = jnp.linalg.eigh(G6[: 3 * k, 3 * k:] + G6[3 * k:, : 3 * k].T)
    M = jnp.concatenate([pmatmul(T, C), pmatmul(T, C) * 0.5], axis=1)  # (3k, 6k)
    Sn = pmatmul(M, B)  # ONE update matmul
    ASn = op.apply_matrix_t(Sn, "N")
    theta_new = w2[:k]
    return Sn, ASn, theta_new


def time_chain(mk_chain, *args):
    sync(mk_chain(*args, 10))
    sync(mk_chain(*args, 110))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(mk_chain(*args, 10)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(mk_chain(*args, 110)); b = time.perf_counter() - t1
        ds.append(b - a)
    return sorted(ds)[1] / 100


for name, body in (("full", body_full), ("no_orth", body_no_orth),
                   ("no_apply", body_no_apply)):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(op, Xt, iters, body=body):
        Xt, _ = _svqb_t(Xt)
        AXt = op.apply_matrix_t(Xt, "N")
        theta = jnp.sum(Xt * AXt, axis=1)
        Pt = jnp.zeros_like(Xt)

        def step(_, carry):
            Xt, AXt, Pt, theta = carry
            return body(op, Xt, AXt, Pt, theta)

        out = lax.fori_loop(0, iters, step, (Xt, AXt, Pt, theta))
        return out[0]

    t = time_chain(chain, op, X0)
    print(f"lobpcg_{name:10s} {t*1e6:8.1f} us/iter", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)


@functools.partial(jax.jit, static_argnames=("iters",))
def chain_floor(op, Xt, iters):
    St = jnp.concatenate([Xt, Xt * 0.5, Xt * 0.25], axis=0)
    ASt = op.apply_matrix_t(St, "N")
    theta = jnp.sum(St * ASt, axis=1)[:k]

    def step(_, carry):
        St, ASt, theta = carry
        return body_redesign_floor(op, St, ASt, theta)

    out = lax.fori_loop(0, iters, step, (St, ASt, theta))
    return out[0]


t = time_chain(chain_floor, op, X0)
print(f"lobpcg_redesign_floor {t*1e6:8.1f} us/iter", flush=True)

# raw apply cost at widths 2 and 6 for scale
for width in (k, 3 * k):
    M0 = jnp.ones((width, n), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def ap_chain(op, M, iters):
        def stepa(_, Mc):
            Mc = op.apply_matrix_t(Mc, "N")
            return Mc * lax.rsqrt(jnp.sum(Mc * Mc) / n)

        return lax.fori_loop(0, iters, stepa, M)

    t = time_chain(ap_chain, op, M0)
    print(f"apply_t width {width}: {t*1e6:8.1f} us", flush=True)
print(f"[t+{time.time()-t0:.0f}s] batch5 done", flush=True)
