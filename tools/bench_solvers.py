"""Per-iteration device cost of the on-device solvers at production scale.

Method: with ``tol=0`` the while_loops never exit early, so timing a
solve at two maxiter values and dividing the difference gives the
marginal per-iteration cost with compile + dispatch + setup cancelled
(same marginal-timing scheme as bench.py; forced host fetch because
block_until_ready is a no-op through the relay).

Operator: 5-point Laplacian stencil on a 2048x2048 grid (n = 4.19M) —
a realistic PDE workload whose apply is measured at ~56-60 us.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_solvers.py
"""

import time

import numpy as np
import jax.numpy as jnp

import linops_tpu as lo


def fetch(x):
    np.asarray(x.ravel()[0])


def timed(fn, *args, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    fetch(out[0])
    return time.time() - t0


def per_iter(fn, op, b, lo_it, hi_it, reps=3, **kw):
    ds = []
    for _ in range(reps):
        t_lo = timed(fn, op, b, tol=0.0, maxiter=lo_it, **kw)
        t_hi = timed(fn, op, b, tol=0.0, maxiter=hi_it, **kw)
        ds.append((t_hi - t_lo) / (hi_it - lo_it))
    return sorted(ds)[len(ds) // 2]


def main():
    ngrid = 2048
    n = ngrid * ngrid
    A = lo.laplacian_2d(ngrid, ngrid, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    t = per_iter(lo.cg, A, b, 10, 510)
    # CG touches ~5 n-vectors per iteration (x,r,p,Ap,z) at ~2 passes each
    print(f"cg:       {t*1e6:8.1f} us/iter", flush=True)

    t = per_iter(lo.minres, A, b, 10, 510)
    print(f"minres:   {t*1e6:8.1f} us/iter", flush=True)

    t = per_iter(lo.bicgstab, A, b, 10, 510)
    print(f"bicgstab: {t*1e6:8.1f} us/iter (2 applies/iter)", flush=True)

    t = per_iter(lo.lsqr, A, b, 10, 510)
    print(f"lsqr:     {t*1e6:8.1f} us/iter (fwd+adj applies)", flush=True)

    # Chebyshev: fixed iteration count is a static arg, so the marginal
    # cost comes from two iters values (reduction-free loop body)
    def cheb(op, b_, tol=None, maxiter=None):
        return lo.chebyshev(op, b_, 0.05, 8.05, iters=maxiter)

    t = per_iter(cheb, A, b, 10, 510)
    print(f"chebyshev:{t*1e6:8.1f} us/iter (no reductions in the body)",
          flush=True)

    # multi-RHS minres at k=8: per-iteration-per-column amortization
    B8 = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    t = per_iter(lo.minres, A, B8, 10, 260)
    print(f"minres k=8: {t*1e6:7.1f} us/iter = {t/8*1e6:.1f} us/iter/col",
          flush=True)

    # GMRES: marginal cost per RESTART CYCLE (30 Arnoldi steps + small
    # (31,30) lstsq + true-residual apply). The Krylov basis V is
    # (31, n) = 512 MB; each Arnoldi step reads it twice.
    t = per_iter(lo.gmres, A, b, 1, 5, restart=30)
    v_bytes = 31 * n * 4
    print(f"gmres(30): {t*1e3:7.1f} ms/restart "
          f"({t/30*1e6:.0f} us/Arnoldi step; basis 2x read model -> "
          f"{2*v_bytes*30/t/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
