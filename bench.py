"""Headline benchmark for linops_tpu (driver entry point).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the BASELINE.json configs as *compiled chains* (the TPU-idiomatic
usage — the whole Krylov-style loop is one jit, zero per-apply dispatch):

  1. operator-algebra chain (opDiagonal+opEye+scaled-compose) on a 1e6
     vector, 100 applies per jit call
  2. CSR/BSR SpMV 100-matvec chain
  3. L-BFGS (mem=16) forward + inverse apply on n=1e6

All are HBM-bandwidth-bound; value = achieved bandwidth of the operator
chain, vs_baseline = fraction of the chip's HBM roofline (v5e ≈ 819 GB/s;
target ≥ 0.80 per BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo

_ROOFLINE_GBPS = {"tpu": 819.0, "cpu": 50.0}


def _sync(out):
    # On remote TPU relays block_until_ready can be a no-op; a host fetch of
    # one element is the only reliable completion barrier.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    platform = jax.devices()[0].platform
    roofline = _ROOFLINE_GBPS.get(platform, 50.0)
    dtype = jnp.float32
    bpe = jnp.dtype(dtype).itemsize
    n = 1_000_000
    chain_iters = 100

    # --- (1) operator-algebra chain, 100 applies in one jit ---------------
    d1 = jnp.linspace(1.0, 2.0, n, dtype=dtype)
    d2 = jnp.linspace(0.5, 1.5, n, dtype=dtype)
    chain = 3.0 * (lo.opDiagonal(d1) @ (lo.opEye(n, dtype=dtype) + lo.opDiagonal(d2)))
    v = jnp.ones((n,), dtype)

    t_chain = _timeit(lo.matvec_chain, chain, v, chain_iters) / chain_iters
    # per-apply minimal HBM traffic if perfectly fused: d1, d2, v, out = 4n
    chain_gbs = 4 * n * bpe / t_chain / 1e9

    # --- (2) sparse SpMV chain --------------------------------------------
    ns = 65536
    nnz_per_row = 64
    rng = np.random.default_rng(0)
    cols = rng.integers(0, ns // 128, size=(ns // 8, nnz_per_row // 8)).astype(np.int32)
    # synth BSR: 8x128 blocks, 8 block-cols per block-row
    from linops_tpu.sparse.formats import BSR

    blocks = jnp.asarray(rng.standard_normal((ns // 8, 8, 8, 128)).astype(np.float32))
    bsr = BSR(blocks=blocks, block_cols=jnp.asarray(cols[:, :8]), shape=(ns, ns))
    opB = lo.BSROperator(bsr)
    vs = jnp.ones((ns,), dtype)
    t_spmv = _timeit(lo.matvec_chain, opB, vs, chain_iters) / chain_iters
    nnz = int(blocks.size)
    spmv_gnnzs = nnz / t_spmv / 1e9
    spmv_gbs = nnz * bpe / t_spmv / 1e9

    # --- (3) L-BFGS applies ------------------------------------------------
    mem = 16
    B = lo.LBFGSOperator(dtype, n, mem=mem)
    H = lo.InverseLBFGSOperator(dtype, n, mem=mem)
    for _ in range(mem):
        s = rng.standard_normal(n).astype(np.float32)
        y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
        B.push(s, y)
        H.push(s, y)

    t_fwd = _timeit(lo.matvec_chain, B, v, 20) / 20
    t_inv = _timeit(lo.matvec_chain, H, v, 20) / 20
    fwd_gbs = 2 * (2 * mem + 1) * n * bpe / t_fwd / 1e9  # A,B read twice
    inv_gbs = (2 * mem + 2) * n * bpe / t_inv / 1e9

    vs_ratio = chain_gbs / roofline
    print(
        json.dumps(
            {
                "metric": "fused_chain_bandwidth",
                "value": round(chain_gbs, 2),
                "unit": "GB/s",
                "vs_baseline": round(vs_ratio, 4),
                "detail": {
                    "platform": platform,
                    "roofline_gbs": roofline,
                    "chain_us_per_apply": round(t_chain * 1e6, 1),
                    "spmv_gnnz_per_s": round(spmv_gnnzs, 3),
                    "spmv_gbs": round(spmv_gbs, 2),
                    "spmv_us_per_apply": round(t_spmv * 1e6, 1),
                    "lbfgs_fwd_gbs": round(fwd_gbs, 2),
                    "lbfgs_inv_gbs": round(inv_gbs, 2),
                    "lbfgs_fwd_us": round(t_fwd * 1e6, 1),
                    "lbfgs_inv_us": round(t_inv * 1e6, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
