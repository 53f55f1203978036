"""Headline benchmark for linops_tpu (driver entry point).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Benchmark: BASELINE.json config 1 + 3 combined — the hot apply paths:
  (a) opDiagonal + opEye + scaled-compose chain applied to a 1e6 vector
  (b) L-BFGS (mem=16) forward+inverse apply on n=1e6
Both are HBM-bandwidth-bound; we report achieved effective bandwidth as a
fraction of the chip's HBM roofline (v5e: ~819 GB/s). vs_baseline is the
roofline fraction of the *chain* benchmark (target >= 0.80 per BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo

# HBM roofline by platform. v5e ~819 GB/s; CPU fallback uses a nominal
# 50 GB/s DDR figure so the script stays runnable anywhere.
_ROOFLINE_GBPS = {"tpu": 819.0, "cpu": 50.0}


def _timeit(fn, *args, warmup=3, iters=30):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    platform = jax.devices()[0].platform
    roofline = _ROOFLINE_GBPS.get(platform, 50.0)
    dtype = jnp.float32
    bytes_per = jnp.dtype(dtype).itemsize
    n = 1_000_000

    # --- (a) operator-algebra chain: 3 * (D1 @ (I + D2)) ------------------
    d1 = jnp.linspace(1.0, 2.0, n, dtype=dtype)
    d2 = jnp.linspace(0.5, 1.5, n, dtype=dtype)
    chain = 3.0 * (lo.opDiagonal(d1) @ (lo.opEye(n, dtype=dtype) + lo.opDiagonal(d2)))
    v = jnp.ones((n,), dtype)

    t_chain = _timeit(chain.matvec, v)
    # minimal HBM traffic if perfectly fused: read d1, d2, v; write out = 4n
    chain_gbs = 4 * n * bytes_per / t_chain / 1e9

    # --- (b) L-BFGS forward+inverse apply, mem=16 --------------------------
    mem = 16
    rng = np.random.default_rng(0)
    B = lo.LBFGSOperator(dtype, n, mem=mem)
    H = lo.InverseLBFGSOperator(dtype, n, mem=mem)
    for _ in range(mem):
        s = rng.standard_normal(n).astype(np.float32)
        y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
        B.push(s, y)
        H.push(s, y)

    t_fwd = _timeit(B.matvec, v)
    t_inv = _timeit(H.matvec, v)
    # forward: read A,B (2*mem*n) + v, write out
    fwd_gbs = (2 * mem + 2) * n * bytes_per / t_fwd / 1e9
    # inverse two-loop: read S,Y (2*mem*n) + v, write out
    inv_gbs = (2 * mem + 2) * n * bytes_per / t_inv / 1e9

    vs = chain_gbs / roofline
    print(
        json.dumps(
            {
                "metric": "apply_bandwidth",
                "value": round(chain_gbs, 2),
                "unit": "GB/s",
                "vs_baseline": round(vs, 4),
                "detail": {
                    "platform": platform,
                    "roofline_gbs": roofline,
                    "chain_n1e6_gbs": round(chain_gbs, 2),
                    "lbfgs_fwd_gbs": round(fwd_gbs, 2),
                    "lbfgs_inv_gbs": round(inv_gbs, 2),
                    "chain_us": round(t_chain * 1e6, 1),
                    "lbfgs_fwd_us": round(t_fwd * 1e6, 1),
                    "lbfgs_inv_us": round(t_inv * 1e6, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
