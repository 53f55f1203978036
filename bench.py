"""Headline benchmark for linops_tpu (driver entry point).

Prints ONE COMPACT JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N, "detail": {<the headline keys BASELINE.md names>}} and
writes the FULL detail dict to bench_out.json next to this file. The
compact line stays ~1-2 KB so drivers that capture a bounded output tail
can still parse it (the r2-r4 single fat line exceeded the capture and
recorded "parsed": null three rounds running — VERDICT r4 weak #3).

Measures the BASELINE.json configs as compiled chains (whole Krylov loop in
one jit) using MARGINAL timing — each chain is run at two iteration counts
and the difference divided, which cancels both the per-call dispatch cost
and any relay round-trip overhead. Completion is forced with a host fetch
(block_until_ready can be a no-op on remote relays).

The headline (BSR SpMV, config 2) runs FIRST; remaining sections are
individually fault-tolerant and skipped once the time budget is spent, so a
driver-side timeout still records the headline.

Sections: 2) 128x128-block BSR SpMV chain (headline; + 8x128 variant),
2b) 5-point Laplacian DIA stencil chain, 1) diagonal-algebra chain on 1e6,
3) L-BFGS forward+inverse applies (compact form), 4) algebra-stress SpMM.

value = achieved SpMV bandwidth; vs_baseline = fraction of the chip's HBM
roofline (v5e ≈ 819 GB/s; target ≥ 0.80 per BASELINE.md).
"""

import json
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo

# Partial-result state for the SIGTERM handler: the TPU relay can wedge an
# in-flight RPC (the process sleeps in a socket wait forever, CLAUDE.md),
# and the driver's timeout then SIGTERMs us. The signal interrupts the
# blocked syscall, so we can still print the one JSON line with everything
# measured so far instead of losing the whole run.
_partial = {"metric": "spmv_chain_bandwidth", "value": 0.0, "unit": "GB/s",
            "vs_baseline": 0.0, "detail": {"incomplete": "no sections ran"}}

# keys promoted from the full detail dict into the compact printed line —
# the ones BASELINE.md and the round verdicts track; everything else goes
# to bench_out.json only
_HEADLINE_KEYS = (
    "platform", "roofline_gbs", "spmv_gnnz_per_s", "spmv_us_per_apply",
    "lbfgs_fwd_us", "lbfgs_inv_us", "lsr1_fwd_us", "lbfgs_roofline_us_1to2pass",
    "routed_unstructured_gnnz_per_s", "routed_unstructured_T_gnnz_per_s",
    "routed_spmm_k8_us", "routed_spmm_k8_x_matvec", "routed_spmm_path",
    "routed_spmm_k8_panel_us", "routed_spmm_k8_panel_x_matvec",
    "routed_spmm_panel_path", "routed_spmm_panel_anomaly",
    "routed_spmm_dense_implausible_fast", "routed_spmm_dense_unmeasurable",
    "routed_spmm_panel_implausible_fast", "routed_spmm_panel_unmeasurable",
    "routed_pack_cpu_s", "routed_pack_t_cpu_s", "routed_upload_s",
    "routed_multichunk_gnnz_per_s", "routed_multichunk_T_gnnz_per_s",
    "routed_multichunk_pack_cpu_s", "routed_multichunk_upload_s",
    "spmv_windowed_gbs", "spmv_windowed_T_gbs", "spmv_windowed_multi_gbs",
    "spmv_windowed_multi_T_gbs",
    "spmv_8x128_bf16_gbs", "spmv_16x128_bf16_gbs",
    "reorder_rcm_gbs", "auto_8m_format", "auto_8m_gnnz_per_s",
    "lobpcg_us_per_iter_k2", "scaling_ok", "incomplete",
)


def _emit(detail):
    """Write the full detail to bench_out.json; print the compact line."""
    line = {k: _partial[k] for k in ("metric", "value", "unit", "vs_baseline")}
    line["detail"] = {k: detail[k] for k in _HEADLINE_KEYS if k in detail}
    sc = detail.get("scaling")
    if isinstance(sc, dict):
        pe = sc.get("projected_efficiency_v5e", {})
        line["detail"]["scaling_ok"] = bool(
            pe.get("meets_baseline_75pct_at_production_sizes", False))
    line["detail"]["detail_file"] = "bench_out.json"
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_out.json")
        with open(out, "w") as f:
            json.dump({**line, "detail": detail}, f, indent=1)
    except Exception as e:  # the compact line must still go out
        line["detail"]["detail_file"] = f"unwritable: {e}"
    print(json.dumps(line), flush=True)


def _emit_partial(signum, frame):
    _partial.setdefault("detail", {})["incomplete"] = (
        "killed by signal %d mid-run (wedged relay RPC or timeout); "
        "values recorded are the sections that completed" % signum
    )
    _emit(_partial["detail"])
    os._exit(0)


signal.signal(signal.SIGTERM, _emit_partial)

_ROOFLINE_GBPS = {"tpu": 819.0, "cpu": 50.0}
I_SHORT, I_LONG = 50, 1050  # delta must dwarf per-call jitter (~30 ms)
TIME_BUDGET_S = 2300.0  # skip optional sections beyond this

_t_start = time.time()


def _budget_left() -> bool:
    return time.time() - _t_start < TIME_BUDGET_S


from linops_tpu.utils.timing import marginal_chain_time, sync as _sync


def _marginal_apply_time(op, v, reps: int = 3, mode: str = "N"):
    """Seconds per apply: median of repeated (long - short) chain deltas,
    which cancels per-call dispatch/relay overhead."""

    def f(o, x, iters):
        return lo.matvec_chain(o, x, iters, mode=mode)

    return marginal_chain_time(
        f, op, v, iters_short=I_SHORT, iters_long=I_LONG, reps=reps
    )


def main():
    platform = jax.devices()[0].platform
    roofline = _ROOFLINE_GBPS.get(platform, 50.0)
    dtype = jnp.float32
    bpe = jnp.dtype(dtype).itemsize
    rng = np.random.default_rng(0)
    detail = {
        "platform": platform,
        "roofline_gbs": roofline,
        "measured_streaming_ceiling_gbs": 747.0,  # raw sum-reduction probe (±1% run-to-run)
        "timing": f"marginal ({I_LONG}-{I_SHORT} chain iterations, median of 3)",
    }
    _partial["detail"] = detail  # sections mutate it in place (see _emit_partial)

    # --- (2) BSR SpMV chain — THE HEADLINE, measured first -----------------
    # 128x128 blocks (the MXU-native tile), 1/16 density ≈ 67M nnz.
    # Traffic model: stored block values only (a lower bound on real HBM
    # traffic — excludes gathered x blocks, y, and block_cols; at this
    # block size those add < 2%).
    from linops_tpu.sparse.formats import BSR

    ns = 65536
    blocks = jnp.asarray(
        rng.standard_normal((ns // 128, 4, 128, 128)).astype(np.float32)
    )
    cols = jnp.asarray(rng.integers(0, ns // 128, size=(ns // 128, 4)).astype(np.int32))
    opB = lo.BSROperator(BSR(blocks=blocks, block_cols=cols, shape=(ns, ns)))
    vs = jnp.ones((ns,), dtype)
    t0 = time.time()
    t_spmv = _marginal_apply_time(opB, vs, reps=3)
    # plausibility guard: a reading above the measured streaming ceiling
    # means the marginal deltas came out low (observed once on the relay);
    # re-measure (bounded) and keep the slower (physically admissible)
    # timing, flagging the JSON if it still exceeds the ceiling.
    for _ in range(2):
        if blocks.size * bpe / t_spmv / 1e9 <= 747.0 * 1.02:
            break
        t_spmv = max(t_spmv, _marginal_apply_time(opB, vs, reps=3))
    if blocks.size * bpe / t_spmv / 1e9 > 747.0 * 1.02:
        detail["spmv_implausible_above_ceiling"] = True
    detail["headline_measure_s"] = round(time.time() - t0, 1)  # incl. compiles
    nnz = int(blocks.size)
    spmv_gbs = nnz * bpe / t_spmv / 1e9
    _partial["value"] = round(spmv_gbs, 2)
    _partial["vs_baseline"] = round(spmv_gbs / roofline, 4)
    detail["spmv_traffic_model"] = "stored block values only (lower bound)"
    detail["spmv_precision"] = "f32-exact (HIGHEST; bf16-truncating DEFAULT measured identical: HBM-bound)"
    detail["spmv_gnnz_per_s"] = round(nnz / t_spmv / 1e9, 3)
    detail["spmv_us_per_apply"] = round(t_spmv * 1e6, 1)

    # --- optional sections (fault-tolerant, budget-guarded) ----------------
    def section(name, fn):
        if not _budget_left():
            detail[name] = "skipped (time budget)"
            return
        try:
            fn()
        except Exception as e:  # record, don't die
            detail[name] = f"error: {type(e).__name__}: {str(e)[:200]}"

    def sec_spmv_bf16():
        # bf16 storage tier on the headline 128x128 shape. The 67 MB of
        # bf16 blocks fit the residency budget, so the chain drivers keep
        # them ON-CHIP (utils/residency.py) and this records the
        # MXU-bound resident rate (~27 us, ~1275 Gnnz/s) — NOT a
        # streaming figure (streamed-from-HBM reference: 95.7 us)
        opB16 = lo.BSROperator(
            BSR(blocks=blocks.astype(jnp.bfloat16), block_cols=cols,
                shape=(ns, ns)))
        t16 = _marginal_apply_time(opB16, vs.astype(jnp.bfloat16), reps=2)
        detail["spmv_bf16_gnnz_per_s"] = round(nnz / t16 / 1e9, 3)
        detail["spmv_bf16_us_per_apply"] = round(t16 * 1e6, 1)

    def sec_spmv_resident():
        # on-chip residency tier (utils/residency.py): operators whose
        # arrays fit the ~96 MiB budget run chains MXU-bound, f32-exact
        # (measured 13.6 us = 1230 Gnnz/s vs 94 us streamed at this shape)
        ns2 = 32768
        blocks2 = jnp.asarray(
            rng.standard_normal((ns2 // 128, 4, 128, 128)).astype(np.float32))
        cols2 = jnp.asarray(
            rng.integers(0, ns2 // 128, size=(ns2 // 128, 4)).astype(np.int32))
        op2 = lo.BSROperator(BSR(blocks=blocks2, block_cols=cols2,
                                 shape=(ns2, ns2)))
        t2 = _marginal_apply_time(op2, jnp.ones((ns2,), dtype), reps=2)
        detail["spmv_resident_f32_us"] = round(t2 * 1e6, 1)
        detail["spmv_resident_f32_gnnz_per_s"] = round(blocks2.size / t2 / 1e9, 3)

    def sec_spmv8():
        # fine-block case: default backend="auto" engages the Pallas
        # VMEM-gather kernel on TPU (kernels/bsr_spmv.py); backend="xla"
        # measured alongside for the delta.
        blocks8 = jnp.asarray(
            rng.standard_normal((ns // 8, 8, 8, 128)).astype(np.float32)
        )
        cols8 = jnp.asarray(
            rng.integers(0, ns // 128, size=(ns // 8, 8)).astype(np.int32)
        )
        data8 = BSR(blocks=blocks8, block_cols=cols8, shape=(ns, ns))
        opB8 = lo.BSROperator(data8)
        t8 = _marginal_apply_time(opB8, vs, reps=2)
        detail["spmv_8x128_gbs"] = round(blocks8.size * bpe / t8 / 1e9, 2)
        if _budget_left():
            opB8f = lo.BSROperator(data8, backend="pallas_fast")
            t8f = _marginal_apply_time(opB8f, vs, reps=2)
            detail["spmv_8x128_fast_gbs"] = round(blocks8.size * bpe / t8f / 1e9, 2)
        if _budget_left():
            t8t = _marginal_apply_time(opB8, vs, reps=2, mode="T")
            detail["spmv_8x128_T_gbs"] = round(blocks8.size * bpe / t8t / 1e9, 2)
        if _budget_left():
            opB8x = lo.BSROperator(data8, backend="xla")
            t8x = _marginal_apply_time(opB8x, vs, reps=2)
            detail["spmv_8x128_xla_gbs"] = round(blocks8.size * bpe / t8x / 1e9, 2)
        if _budget_left():
            # bf16 block storage at bm=8: measured at ~f32 speed — each
            # (8, 128) bf16 slab fills only half its native (16, 128)
            # Mosaic tile, so the DMA sees no byte savings (use bm>=16
            # blocks for the 2x; kernels/bsr_spmv.py docstring)
            data8h = BSR(
                blocks=blocks8.astype(jnp.bfloat16),
                block_cols=cols8,
                shape=(ns, ns),
            )
            opB8h = lo.BSROperator(data8h)
            t8h = _marginal_apply_time(opB8h, vs, reps=2)
            detail["spmv_8x128_bf16_gbs"] = round(blocks8.size * 2 / t8h / 1e9, 2)
            detail["spmv_8x128_bf16_gnnz_per_s"] = round(blocks8.size / t8h / 1e9, 2)
        if _budget_left():
            # 16x128 bf16: fills the native (16, 128) bf16 tile exactly, so
            # the halved bytes DO stream — the 2x-capacity configuration
            blocks16 = jnp.asarray(
                rng.standard_normal((ns // 16, 8, 16, 128)).astype(np.float32)
            ).astype(jnp.bfloat16)
            cols16 = jnp.asarray(
                rng.integers(0, ns // 128, size=(ns // 16, 8)).astype(np.int32)
            )
            op16h = lo.BSROperator(BSR(blocks=blocks16, block_cols=cols16, shape=(ns, ns)))
            t16h = _marginal_apply_time(op16h, vs, reps=2)
            detail["spmv_16x128_bf16_gbs"] = round(blocks16.size * 2 / t16h / 1e9, 2)
            detail["spmv_16x128_bf16_gnnz_per_s"] = round(blocks16.size / t16h / 1e9, 2)

    def sec_csr():
        # CSR ingestion path (BASELINE config 2 'partitioned CSR SpMV-chain'):
        # a block-structured 67M-nnz matrix ingested FROM CSR arrays.
        # (a) auto-routed through the native CSR->BSR packer (the default
        #     recommendation for block-structured patterns),
        # (b) the raw gather+segment_sum CSR path on a truly unstructured
        #     16-nnz/row matrix (its nnz/s is gather-bound — recorded
        #     honestly as such).
        # Roofline for the CSR *format* itself is 8 B/nnz (vals+cols):
        # nnz/s_max = roofline_gbs/8.
        import scipy.sparse as sps

        # block-structured: reuse the headline pattern as CSR input
        indptr = np.arange(0, (ns // 128) * 4 + 1, 4, dtype=np.int64)
        # expand block pattern to scipy BSR then CSR without densifying
        sp_bsr = sps.bsr_matrix(
            (
                np.asarray(blocks).reshape(-1, 128, 128),
                np.asarray(cols).ravel(),
                indptr,
            ),
            shape=(ns, ns),
        )
        sp_csr = sp_bsr.tocsr()
        t0 = time.time()
        opA = lo.opSparse(sp_csr, format="bsr", block_shape="auto")
        detail["csr_pack_s"] = round(time.time() - t0, 1)
        detail["csr_auto_block_shape"] = list(opA.data.block_shape)
        tA = _marginal_apply_time(opA, vs, reps=2)
        csr_nnz = sp_csr.nnz
        detail["csr_routed_gnnz_per_s"] = round(csr_nnz / tA / 1e9, 3)
        detail["csr_format_roofline_gnnz_per_s"] = round(roofline / 8, 1)
        detail["csr_routed_vs_csr_roofline"] = round(
            (csr_nnz / tA / 1e9) / (roofline / 8), 3
        )



    def sec_stencil():
        ngrid = 2048
        L = lo.laplacian_2d(ngrid, ngrid, dtype=dtype)  # n ≈ 4.2M
        vl = jnp.ones((ngrid * ngrid,), dtype)
        t = _marginal_apply_time(L, vl, reps=2)
        # APPARENT bandwidth (nominal traffic / time): the working set is
        # VMEM-resident across the chain, so this exceeds the HBM ceiling
        # by design and is not a streaming claim
        detail["stencil_dia_apparent_gbs"] = round(7 * ngrid * ngrid * bpe / t / 1e9, 2)
        detail["stencil_dia_gnnz_per_s"] = round(5 * ngrid * ngrid / t / 1e9, 3)
        detail["stencil_us_per_apply"] = round(t * 1e6, 1)

    def sec_chain():
        n = 1_000_000
        d1 = jnp.linspace(1.0, 2.0, n, dtype=dtype)
        d2 = jnp.linspace(0.5, 1.5, n, dtype=dtype)
        chain = 3.0 * (
            lo.opDiagonal(d1) @ (lo.opEye(n, dtype=dtype) + lo.opDiagonal(d2))
        )
        t = _marginal_apply_time(chain, jnp.ones((n,), dtype), reps=2)
        detail["chain_us_per_apply"] = round(t * 1e6, 1)
        # APPARENT bandwidth (see stencil note): VMEM-resident working set
        detail["chain_apparent_gbs"] = round(4 * n * bpe / t / 1e9, 2)

    def sec_lbfgs():
        n = 1_000_000
        mem = 16
        B = lo.LBFGSOperator(dtype, n, mem=mem)
        H = lo.InverseLBFGSOperator(dtype, n, mem=mem)
        for _ in range(mem):
            s = rng.standard_normal(n).astype(np.float32)
            y = s + 0.1 * rng.standard_normal(n).astype(np.float32)
            B.push(s, y)
            H.push(s, y)
        v = jnp.ones((n,), dtype)
        t_fwd = _marginal_apply_time(B, v, reps=3)
        t_inv = _marginal_apply_time(H, v, reps=3)
        # Traffic model: MINIMUM one pass over the (2mem, n) memory plus
        # x and y. (Round-1 used a 2-pass model and over-credited past the
        # measured ceiling — XLA evidently keeps part of W resident across
        # the two compact-form passes, so the 1-pass figure is the honest
        # lower bound; the roofline-µs targets state both bounds.)
        min_bytes = ((2 * mem) * n + 2 * n) * bpe
        detail["lbfgs_traffic_model"] = "1-pass (2mem+2)·n·4B lower bound"
        detail["lbfgs_fwd_gbs_min1pass"] = round(min_bytes / t_fwd / 1e9, 2)
        detail["lbfgs_inv_gbs_min1pass"] = round(min_bytes / t_inv / 1e9, 2)
        detail["lbfgs_fwd_us"] = round(t_fwd * 1e6, 1)
        detail["lbfgs_inv_us"] = round(t_inv * 1e6, 1)
        # roofline-µs window at the measured ceiling: [1-pass, 2-pass]
        ceil = detail["measured_streaming_ceiling_gbs"]
        detail["lbfgs_roofline_us_1to2pass"] = [
            round(min_bytes / (ceil * 1e9) * 1e6, 1),
            round((2 * (2 * mem) * n + 2 * n) * bpe / (ceil * 1e9) * 1e6, 1),
        ]

        # L-SR1 compact apply (U is (mem, n): ~half the L-BFGS traffic;
        # push-maintained M-inverse keeps the hot apply matmul-only)
        R1 = lo.LSR1Operator(jnp.float32, n, mem=mem)
        for _ in range(mem):
            s = rng.standard_normal(n).astype(np.float32)
            y = 2.0 * s + 0.5 * rng.standard_normal(n).astype(np.float32)
            R1.push(s, y)
        t_sr1 = _marginal_apply_time(R1, v, reps=2)
        detail["lsr1_fwd_us"] = round(t_sr1 * 1e6, 1)

        # push throughput: lazy a/b (production default, O(mem·n)) vs the
        # eager reference recompute (O(mem²·n))
        from jax import lax as _lax
        from linops_tpu.qn.lbfgs import _push_plain

        s0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y0 = s0 + 0.1 * jnp.asarray(rng.standard_normal(n).astype(np.float32))

        def make_push_chain(with_ab):
            @jax.jit
            def chain(state, s, y, iters):
                def body(i, st):
                    f = 1.0 + 0.001 * i.astype(jnp.float32)
                    return _push_plain(
                        st, s * f, y * f, scaling=True, inverse=False,
                        with_ab=with_ab,
                    )

                return _lax.fori_loop(0, iters, body, state)

            return chain

        Bp = lo.LBFGSOperator(jnp.float32, n, mem=mem)
        for name_, with_ab in (("lbfgs_push_lazy_us", False), ("lbfgs_push_eager_us", True)):
            chain = make_push_chain(with_ab)
            _sync(chain(Bp.state, s0, y0, 5))
            _sync(chain(Bp.state, s0, y0, 55))
            t0 = time.perf_counter(); _sync(chain(Bp.state, s0, y0, 5)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); _sync(chain(Bp.state, s0, y0, 55)); b = time.perf_counter() - t0
            detail[name_] = round(max(b - a, 1e-9) / 50 * 1e6, 1)

    def sec_stress():
        from jax import lax as _lax

        na = 8192
        Ad = jnp.asarray(rng.standard_normal((na, na)).astype(np.float32))
        stress = (
            2.0
            * lo.hcat(
                lo.LinearOperator(Ad), lo.opDiagonal(jnp.abs(jnp.diag(Ad)) + 1.0)
            )[jnp.arange(na), jnp.arange(na)]
            + lo.BlockDiagonalOperator(
                lo.LinearOperator(Ad[: na // 2, : na // 2]),
                lo.LinearOperator(Ad[na // 2 :, na // 2 :]),
            )
        )
        X = jnp.ones((na, 8), dtype)

        @jax.jit
        def _stress_chain(op, X, iters):
            def body(_, M):
                M2 = op.apply_matrix(M, "N")
                return M2 / jnp.linalg.norm(M2)

            return _lax.fori_loop(0, iters, body, X)

        _sync(_stress_chain(stress, X, 50))
        _sync(_stress_chain(stress, X, 450))
        t0 = time.perf_counter()
        _sync(_stress_chain(stress, X, 50))
        ts1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(_stress_chain(stress, X, 450))
        ts2 = time.perf_counter() - t0
        # time only: XLA legitimately folds the zero-extension branch, so a
        # bytes/s figure would over-credit.
        detail["algebra_stress_spmm_us"] = round(max(ts2 - ts1, 1e-9) / 400 * 1e6, 1)


    def sec_routed_unstructured():
        # Clos-routed lane-gather SpMV (sparse/routed.py) on the truly
        # unstructured 16-nnz/row matrix — the production unstructured
        # path (format="auto" picks it below the pack budget). Forward and
        # transpose applies plus the host pack cost.
        nu = 1 << 16
        nnz_row = 16
        counts = rng.poisson(nnz_row, nu)
        nnzu = int(counts.sum())
        indptr_u = np.zeros(nu + 1, np.int64)
        np.cumsum(counts, out=indptr_u[1:])
        cols_r = rng.integers(0, nu, nnzu)
        order = np.lexsort((cols_r, np.repeat(np.arange(nu), counts)))
        cols_u = cols_r[order]
        vals_u = rng.standard_normal(nnzu).astype(np.float32)
        from linops_tpu.sparse.formats import csr_from_parts

        hp = (vals_u, cols_u.astype(np.int32), indptr_u.astype(np.int32))
        data_u = csr_from_parts(*hp, (nu, nu))
        # untimed warmup pack: absorb the ONE-TIME process costs (lazy
        # g++ build of native/clos_route.cpp on a fresh checkout, first
        # jax dispatch) so the pack keys measure the pack itself
        _tiny = np.zeros(3, np.float32), np.arange(3, dtype=np.int32), \
            np.array([0, 1, 2, 3], np.int32)
        lo.RoutedCSROperator(csr_from_parts(*_tiny, (3, 3)),
                             host_parts=_tiny)
        # CPU pack cost measured with to_device=False (no upload in the
        # timed region — through the relay the upload dominates and its
        # variance used to clamp the derived-T difference to 0.0,
        # VERDICT r4 item 5)
        from linops_tpu.sparse.routed import pack_routed_csr

        # full-size untimed warmup: the first large pack pays allocator /
        # page-fault costs that made fwd-only read SLOWER than fwd+T in
        # cold-first ordering (r5 validation: 1.37 vs 0.95 s)
        pack_routed_csr(*hp, (nu, nu), to_device=False)

        def _pack_time(**kw):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                out = pack_routed_csr(*hp, (nu, nu), to_device=False, **kw)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best, out

        t_cpu_f, _ = _pack_time()
        t_cpu_ft, packed = _pack_time(with_transpose=True)
        fwd_np, der_np = packed
        detail["routed_pack_cpu_s"] = round(t_cpu_f, 2)
        detail["routed_pack_ft_cpu_s"] = round(t_cpu_ft, 2)
        detail["routed_pack_t_cpu_s"] = round(max(t_cpu_ft - t_cpu_f, 0.0), 2)
        detail["routed_pack_t_x_fwd"] = round(
            max(t_cpu_ft - t_cpu_f, 0.0) / max(t_cpu_f, 1e-9), 2)
        # upload, timed separately (one device_put of the whole program)
        t0 = time.perf_counter()
        fwd_dev = jax.device_put(fwd_np)
        der_dev = jax.device_put(der_np) if der_np is not None else None
        _sync(fwd_dev.vals)
        detail["routed_upload_s"] = round(time.perf_counter() - t0, 2)
        prog_bytes = sum(
            leaf.nbytes
            for leaf in jax.tree_util.tree_leaves((fwd_np, der_np)))
        detail["routed_prog_mb"] = round(prog_bytes / 1e6, 1)
        opR = lo.RoutedCSROperator(data_u, routed=fwd_dev, routed_t=der_dev,
                                   host_parts=hp)
        vu = jnp.ones((nu,), dtype)
        tR = _marginal_apply_time(opR, vu, reps=3)
        detail["routed_unstructured_n"] = nu
        detail["routed_unstructured_nnz"] = nnzu
        detail["routed_unstructured_gnnz_per_s"] = round(nnzu / tR / 1e9, 3)
        detail["routed_unstructured_us_per_apply"] = round(tR * 1e6, 1)
        tRT = _marginal_apply_time(opR, vu, reps=2, mode="T")
        detail["routed_unstructured_T_gnnz_per_s"] = round(nnzu / tRT / 1e9, 3)
        detail["routed_unstructured_T_us_per_apply"] = round(tRT * 1e6, 1)

        # multi-RHS through ONE shared routing program (rep-grid kernels)
        k_rhs = 8
        Xm = jnp.ones((nu, k_rhs), dtype)

        def spmm_chain(o, Xc, iters):
            def body(_, M):
                return o.apply_matrix(M, mode="N") * (1.0 / k_rhs)

            return jax.lax.fori_loop(0, iters, body, Xc)

        # the executed path, recorded host-side from the dispatch's own
        # conditions — the r4 driver capture had a 20× panel/dense
        # contradiction with nothing in the artifact to adjudicate it
        def spmm_time(chain_fn, X, tag):
            # k-RHS stages move f32 VALUES, so < 3× one matvec is
            # physically impossible (the 0.8k× value-traffic floor);
            # an implausibly-fast delta means the relay returned a
            # poisoned rep set (observed TWICE in a row in r5 run3:
            # ~0 s deltas) — keep re-measuring, keep the slowest
            # admissible reading, and if every attempt stays below the
            # floor record a named flag instead of a silent 0.0
            t = marginal_chain_time(chain_fn, opR, X, iters_short=20,
                                    iters_long=320, reps=3)
            attempts = 0
            while t < 3.0 * tR and attempts < 3:
                attempts += 1
                detail[f"routed_spmm_{tag}_implausible_fast"] = round(
                    t * 1e6, 1)
                t = max(t, marginal_chain_time(
                    chain_fn, opR, X, iters_short=20, iters_long=320,
                    reps=3))
            if t < 3.0 * tR:
                detail[f"routed_spmm_{tag}_unmeasurable"] = True
            return t

        detail["routed_spmm_path"] = opR.matrix_path("N", panel=False)
        t_k = spmm_time(spmm_chain, Xm, "dense")
        detail["routed_spmm_k8_us"] = round(t_k * 1e6, 1)
        detail["routed_spmm_k8_x_matvec"] = round(t_k / tR, 2)
        detail["routed_spmm_k8_gnnz_per_s"] = round(
            k_rhs * nnzu / t_k / 1e9, 2)

        # row-panel protocol (apply_matrix_t): the pipeline's native
        # column-outer layout on both ends — no boundary relayouts
        Xp = jnp.ones((k_rhs, nu), dtype)

        def spmm_panel_chain(o, Mt, iters):
            def body(_, M):
                return o.apply_matrix_t(M, mode="N") * (1.0 / k_rhs)

            return jax.lax.fori_loop(0, iters, body, Mt)

        detail["routed_spmm_panel_path"] = opR.matrix_path("N", panel=True)
        t_kp = spmm_time(spmm_panel_chain, Xp, "panel")
        # panel and dense-layout share everything but two boundary
        # transposes: a >1.5× gap means a stalled rep set or a fallback.
        # Re-measure the SLOWER one once and keep its min (the fast side
        # already passed the plausibility floor above; the relay can
        # stall a whole rep set 1→500 s)
        if t_kp > 1.5 * t_k or t_k > 1.5 * t_kp:
            detail["routed_spmm_panel_anomaly"] = round(t_kp / t_k, 2)
            if t_k > t_kp:
                t_k = min(t_k, spmm_time(spmm_chain, Xm, "dense"))
                detail["routed_spmm_k8_us"] = round(t_k * 1e6, 1)
                detail["routed_spmm_k8_x_matvec"] = round(t_k / tR, 2)
                detail["routed_spmm_k8_gnnz_per_s"] = round(
                    k_rhs * nnzu / t_k / 1e9, 2)
            else:
                t_kp = min(t_kp, spmm_time(spmm_panel_chain, Xp, "panel"))
            detail["routed_spmm_panel_anomaly_after"] = round(t_kp / t_k, 2)
        detail["routed_spmm_k8_panel_us"] = round(t_kp * 1e6, 1)
        detail["routed_spmm_k8_panel_x_matvec"] = round(t_kp / tR, 2)
        detail["routed_spmm_k8_panel_gnnz_per_s"] = round(
            k_rhs * nnzu / t_kp / 1e9, 2)

    def sec_routed_multichunk():
        # 262144² (16 nnz/row, ~4.2M nnz, 3 chunks): the batched-chunk
        # pipeline must keep near-single-chunk economics (VERDICT r3
        # item 1b; the old per-chunk unroll measured 4.05 Gnnz/s)
        nm = 1 << 18
        counts = rng.poisson(16, nm)
        nnzm = int(counts.sum())
        indptr_m = np.zeros(nm + 1, np.int64)
        np.cumsum(counts, out=indptr_m[1:])
        cols_m = rng.integers(0, nm, nnzm)
        order_m = np.lexsort((cols_m, np.repeat(np.arange(nm), counts)))
        from linops_tpu.sparse.formats import csr_from_parts

        hpm = (rng.standard_normal(nnzm).astype(np.float32),
               cols_m[order_m].astype(np.int32), indptr_m.astype(np.int32))
        from linops_tpu.sparse.routed import pack_routed_csr

        t0 = time.perf_counter()
        fwd_np, der_np = pack_routed_csr(*hpm, (nm, nm), with_transpose=True,
                                         to_device=False)
        t_cpu = time.perf_counter() - t0
        detail["routed_multichunk_pack_cpu_s"] = round(t_cpu, 2)
        detail["routed_multichunk_pack_cpu_s_per_mnnz"] = round(
            t_cpu / (nnzm / 1e6), 2)
        t0 = time.perf_counter()
        fwd_dev = jax.device_put(fwd_np)
        der_dev = jax.device_put(der_np) if der_np is not None else None
        _sync(fwd_dev.vals)
        detail["routed_multichunk_upload_s"] = round(
            time.perf_counter() - t0, 2)
        opM = lo.RoutedCSROperator(csr_from_parts(*hpm, (nm, nm)),
                                   routed=fwd_dev, routed_t=der_dev,
                                   host_parts=hpm)
        detail["routed_multichunk_chunks"] = int(opM.routed.vals.shape[0])
        vm = jnp.ones((nm,), dtype)
        tM = _marginal_apply_time(opM, vm, reps=2)
        detail["routed_multichunk_gnnz_per_s"] = round(nnzm / tM / 1e9, 3)
        tMT = _marginal_apply_time(opM, vm, reps=2, mode="T")
        detail["routed_multichunk_T_gnnz_per_s"] = round(nnzm / tMT / 1e9, 3)

    def sec_spmv_windowed():
        # large-n banded BSR (x beyond VMEM residency): the sliding-window
        # Pallas kernels, forward + transpose (VERDICT r3 items 3/4).
        # Blocks are generated ON DEVICE (4.3 GB; host uploads through the
        # relay are far too slow) and freed at section exit.
        nw = 1 << 22
        bm, bn, kmax = 8, 128, 2
        nbrow, nbcol = nw // bm, nw // bn
        bi = np.arange(nbrow, dtype=np.int64)
        q0 = (bi * (nbcol - kmax)) // max(nbrow - 1, 1)
        bc = np.minimum((q0[:, None] + np.arange(kmax)[None, :]), nbcol - 1)
        blocks_w = jax.random.normal(
            jax.random.PRNGKey(11), (nbrow, kmax, bm, bn), jnp.float32)
        _sync(blocks_w)
        opW = lo.BSROperator(BSR(blocks=blocks_w,
                                 block_cols=jnp.asarray(bc.astype(np.int32)),
                                 shape=(nw, nw)))
        if opW.win_q is None:
            detail["spmv_windowed_skipped"] = "no window plan"
            return
        detail["spmv_windowed_n"] = nw
        byts = float(blocks_w.size * 4)
        vw = jnp.ones((nw,), jnp.float32)

        def ch(o, v, iters, mode):
            return lo.matvec_chain(o, v, iters, mode=mode)

        tWf = marginal_chain_time(
            lambda o, v, iters: ch(o, v, iters, "N"), opW, vw,
            iters_short=5, iters_long=35, reps=2)
        detail["spmv_windowed_gbs"] = round(byts / tWf / 1e9, 1)
        if _budget_left():
            tWt = marginal_chain_time(
                lambda o, v, iters: ch(o, v, iters, "T"), opW, vw,
                iters_short=5, iters_long=35, reps=2)
            detail["spmv_windowed_T_gbs"] = round(byts / tWt / 1e9, 1)

    def sec_spmv_windowed_multi():
        # mostly-banded large-n BSR (band + a fixed far-off column
        # cluster — the "dense column after RCM" case): the multi-window
        # plans keep BOTH directions on the Pallas path (r5: the
        # transpose runs the monotone-lane sliding scatter instead of
        # the ~187 GB/s XLA scatter; VERDICT r4 missing #1)
        nw = 1 << 22
        bm, bn, kb, kmax = 8, 128, 2, 3
        nbrow, nbcol = nw // bm, nw // bn
        bi = np.arange(nbrow, dtype=np.int64)
        q0 = (bi * (nbcol - kb - 1)) // max(nbrow - 1, 1)
        clus = nbcol - 2  # fixed far column block
        bc = np.concatenate([
            np.minimum(q0[:, None] + np.arange(kb)[None, :], nbcol - 3),
            np.full((nbrow, 1), clus, np.int64)], axis=1)
        blocks_w = jax.random.normal(
            jax.random.PRNGKey(12), (nbrow, kmax, bm, bn), jnp.float32)
        _sync(blocks_w)
        opW = lo.BSROperator(BSR(blocks=blocks_w,
                                 block_cols=jnp.asarray(bc.astype(np.int32)),
                                 shape=(nw, nw)))
        if opW.win_q is None or opW.cols_local is not None:
            detail["spmv_windowed_multi_skipped"] = "no multi plan"
            return
        detail["spmv_windowed_multi_n"] = nw
        detail["spmv_windowed_multi_t_plan"] = opW.win_q_t is not None
        byts = float(blocks_w.size * 4)
        vw = jnp.ones((nw,), jnp.float32)

        def ch(o, v, iters, mode):
            return lo.matvec_chain(o, v, iters, mode=mode)

        tWf = marginal_chain_time(
            lambda o, v, iters: ch(o, v, iters, "N"), opW, vw,
            iters_short=5, iters_long=35, reps=2)
        detail["spmv_windowed_multi_gbs"] = round(byts / tWf / 1e9, 1)
        if _budget_left():
            tWt = marginal_chain_time(
                lambda o, v, iters: ch(o, v, iters, "T"), opW, vw,
                iters_short=5, iters_long=35, reps=2)
            detail["spmv_windowed_multi_T_gbs"] = round(byts / tWt / 1e9, 1)

    def sec_permutation():
        # Clos-routed permutation operator vs the XLA fancy-index gather
        # (ops/permutation.py) at n = 1M
        np_perm = rng.permutation(1 << 20)
        t0 = time.perf_counter()
        Pop = lo.opPermutation(np_perm)
        detail["perm_pack_s"] = round(time.perf_counter() - t0, 2)
        vp = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32))
        tP = _marginal_apply_time(Pop, vp, reps=2)
        detail["perm_us_per_apply"] = round(tP * 1e6, 1)
        detail["perm_gelems_per_s"] = round((1 << 20) / tP / 1e9, 2)

    def sec_csr_unstructured():
        # raw gather CSR on a truly unstructured matrix (16 nnz/row).
        # Runs LAST and capped at 4M nnz: the 16M-nnz case reproducibly
        # CRASHES the TPU worker, poisoning every later call. Measured
        # reality on TPU (probes, n=65K-262K): segment_sum path 0.06
        # Gnnz/s, ELL reshape-sum 0.14 Gnnz/s — fine-grained random
        # gather is ~3 orders below roofline regardless of formulation;
        # the production answer is structure recovery (format="auto" ->
        # RCM + block packing), measured above as csr_routed_*.
        errs = []
        # smallest first: the larger case can crash the TPU worker, after
        # which every later call fails UNAVAILABLE
        for nu in (1 << 16,):
            try:
                nnz_row = 16
                rows_u = np.repeat(np.arange(nu, dtype=np.int32), nnz_row)
                cols_u = rng.integers(0, nu, nu * nnz_row).astype(np.int32)
                vals_u = rng.standard_normal(nu * nnz_row).astype(np.float32)
                indptr_u = np.arange(0, nu * nnz_row + 1, nnz_row, dtype=np.int32)
                from linops_tpu.sparse.formats import CSR as CSRfmt

                opU = lo.CSROperator(
                    CSRfmt(
                        vals=jnp.asarray(vals_u),
                        cols=jnp.asarray(cols_u),
                        indptr=jnp.asarray(indptr_u),
                        rows=jnp.asarray(rows_u),
                        shape=(nu, nu),
                    )
                )
                vu = jnp.ones((nu,), dtype)
                tU = _marginal_apply_time(opU, vu, reps=2)
                detail["csr_unstructured_n"] = nu
                detail["csr_unstructured_gnnz_per_s"] = round(nu * nnz_row / tU / 1e9, 3)
                detail["csr_unstructured_us_per_apply"] = round(tU * 1e6, 1)
                # ELL (gather + row-sum, no scatter) on the same matrix
                from linops_tpu.sparse.formats import ell_from_csr_parts

                opE = lo.ELLOperator(
                    ell_from_csr_parts(vals_u, cols_u, indptr_u, (nu, nu))
                )
                tE = _marginal_apply_time(opE, vu, reps=2)
                detail["ell_unstructured_gnnz_per_s"] = round(nu * nnz_row / tE / 1e9, 3)
                return
            except Exception as e:
                errs.append(f"{nu}: {type(e).__name__}: {str(e)[:120]}")
                detail["csr_unstructured_n_failed"] = errs

    def sec_multirhs():
        # matrix-RHS 5-arg mul with donation (reference mul!(res, op, M, a, b))
        # on the headline BSR operator: 8 RHS amortize each block read.
        k = 8
        M = jnp.ones((ns, k), dtype)
        Res = jnp.zeros((ns, k), dtype)

        from linops_tpu.utils.residency import chain_resident

        @jax.jit
        def chain(op, M, Res, iters):
            from jax import lax as _lax

            op = chain_resident(op, M)  # bf16 tier fits on-chip; f32 skips
            def body(_, carry):
                M, Res = carry
                out = 1.0 * op.apply_matrix(M, "N") + 0.5 * Res
                nrm = jnp.linalg.norm(out)
                return out / nrm, M
            return _lax.fori_loop(0, iters, body, (M, Res))

        def run(op):
            _sync(chain(op, M, Res, I_SHORT))
            _sync(chain(op, M, Res, I_LONG))
            t0 = time.perf_counter(); _sync(chain(op, M, Res, I_SHORT)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); _sync(chain(op, M, Res, I_LONG)); b = time.perf_counter() - t0
            return max(b - a, 1e-9) / (I_LONG - I_SHORT)

        # f32 storage = f32-exact math (HIGHEST; see sparse/ops._bsr_precision)
        t = run(opB)
        detail["spmm_multirhs_us_per_apply"] = round(t * 1e6, 1)
        # Report the honest compute rate (2·nnz·k MACs), no bytes model:
        # chain-resident caching would make a streaming GB/s over-credit
        # (the round-1 L-BFGS accounting trap).
        detail["spmm_multirhs_tflops"] = round(2 * nnz * k / t / 1e12, 2)
        if _budget_left():
            # bf16 storage opts into the fast MXU path (single exact bf16
            # pass; XLA may keep the 64 MiB block array VMEM-resident
            # across the chain) — the TPU-native speed tier.
            opB16 = lo.BSROperator(
                BSR(blocks=opB.data.blocks.astype(jnp.bfloat16),
                    block_cols=opB.data.block_cols, shape=opB.data.shape))
            t16 = run(opB16)
            detail["spmm_multirhs_bf16_us_per_apply"] = round(t16 * 1e6, 1)
            detail["spmm_multirhs_bf16_tflops"] = round(2 * nnz * k / t16 / 1e12, 2)

    def sec_solvers():
        # on-device Krylov drivers on a 2048² 5-pt Laplacian (n=4.19M):
        # marginal per-iteration cost (tol=0 forces full maxiter; two
        # maxiter values, difference cancels compile/dispatch).
        ng = 2048
        Astencil = lo.laplacian_2d(ng, ng, dtype=dtype)
        bsol = jnp.ones((ng * ng,), dtype)

        def per_iter(fn, lo_it, hi_it, **kw):
            # span must dwarf the relay's per-call jitter (~10-30 ms): at
            # ~200-300 us/iter a 500-iteration delta gives a 100-150 ms
            # signal (a 100-iteration delta measured 0.0 once)
            ds = []
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(fn(Astencil, bsol, tol=0.0, maxiter=lo_it, **kw)[0])
                a = time.perf_counter() - t0
                t0 = time.perf_counter()
                _sync(fn(Astencil, bsol, tol=0.0, maxiter=hi_it, **kw)[0])
                b = time.perf_counter() - t0
                ds.append(max(b - a, 1e-9) / (hi_it - lo_it))
            return sorted(ds)[1]

        detail["cg_us_per_iter"] = round(per_iter(lo.cg, 10, 510) * 1e6, 1)
        if _budget_left():
            detail["minres_us_per_iter"] = round(
                per_iter(lo.minres, 10, 510) * 1e6, 1)

    def sec_lobpcg():
        # spectral-suite cost: lobpcg marginal per-iteration on the 2048²
        # Laplacian stencil (k=2). tol=0 forces full maxiter; maxiter is a
        # static jit arg, so the two points are two fresh remote compiles
        # (~150 s each observed) — the reserve must cover BOTH compiles
        # plus the runs before the driver's external timeout, or the
        # single end-of-run JSON print (and with it the headline) is lost.
        if time.time() - _t_start > TIME_BUDGET_S - 1400:
            detail["lobpcg"] = "skipped (reserved budget)"
            return
        ng = 2048
        Ast = lo.laplacian_2d(ng, ng, dtype=dtype)

        def run(mi):
            t0 = time.perf_counter()
            _sync(lo.lobpcg(Ast, k=2, largest=True, tol=0.0, maxiter=mi,
                            key=jax.random.PRNGKey(0))[0])
            return time.perf_counter() - t0

        # warm BOTH compiles first: a rep that includes the two fresh
        # remote compiles has meaningless (even negative) deltas, which a
        # min() would keep (observed as a 0.0 reading)
        run(10); run(310)
        ds = []
        for _ in range(3):
            a = run(10)
            b = run(310)
            ds.append(max(b - a, 1e-9) / 300)
        detail["lobpcg_us_per_iter_k2"] = round(sorted(ds)[1] * 1e6, 1)
        detail["lobpcg_basis"] = "gram"  # r5 coefficient-space default

    def sec_scaling():
        # multi-device scaling harness on the virtual 8-device CPU mesh
        # (parallel/scaling_bench.py): per-device work at 1 vs N devices
        # plus the compiled-HLO collective audit (halo = exactly 2
        # collective-permutes, zero all-gathers).
        import json as _json
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":") if "axon_site" not in p
        )
        out = subprocess.run(
            [sys.executable, "-m", "linops_tpu.parallel.scaling_bench"],
            capture_output=True,
            text=True,
            timeout=900,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        detail["scaling"] = _json.loads(out.stdout.strip().splitlines()[-1])

    section("spmv_bf16", sec_spmv_bf16)
    section("spmv_resident", sec_spmv_resident)
    section("spmv_8x128_gbs", sec_spmv8)
    section("csr", sec_csr)
    section("stencil", sec_stencil)
    section("chain", sec_chain)
    section("lbfgs", sec_lbfgs)
    section("stress", sec_stress)
    section("multirhs", sec_multirhs)
    section("solvers", sec_solvers)
    section("scaling", sec_scaling)
    section("lobpcg", sec_lobpcg)
    def sec_reorder():
        # opSparse(reorder="rcm"): a scrambled banded matrix recovers the
        # banded BSR MXU path through the RCM similarity sandwich
        # (sparse/reorder.py; measured 610 GB/s at n=262144 — this
        # smaller shape keeps the relay upload inside the bench budget)
        import scipy.sparse as sps

        nrc, bwrc = 1 << 16, 56
        diags = [rng.standard_normal(nrc - abs(k)).astype(np.float32)
                 for k in range(-bwrc, bwrc + 1)]
        Arc = sps.diags(diags, range(-bwrc, bwrc + 1), format="csr")
        sig = rng.permutation(nrc)
        Asc = Arc[sig][:, sig].tocsr()
        t0 = time.perf_counter()
        op_re = lo.opSparse(Asc, format="auto", reorder="rcm",
                            dtype=jnp.float32)
        detail["reorder_rcm_pack_s"] = round(time.perf_counter() - t0, 2)
        detail["reorder_rcm_inner"] = type(op_re.inner).__name__
        t_re = _marginal_apply_time(op_re, jnp.ones((nrc,), jnp.float32),
                                    reps=2)
        detail["reorder_rcm_us_per_apply"] = round(t_re * 1e6, 1)
        detail["reorder_rcm_gnnz_per_s"] = round(Asc.nnz / t_re / 1e9, 2)
        blk = getattr(op_re.inner.data, "blocks", None)
        if blk is not None:
            detail["reorder_rcm_gbs"] = round(
                blk.size * blk.dtype.itemsize / t_re / 1e9, 1)

    def sec_auto_8m():
        # the r4 cliff case: 8.4M-nnz unstructured through format="auto".
        # Auto now routes it (with a pack-cost warning) instead of silently
        # falling to the 0.062 Gnnz/s gather path (VERDICT r4 missing #2);
        # this section documents the chosen behavior at ≥8M nnz.
        import warnings

        import scipy.sparse as sps

        na = 1 << 19
        counts = rng.poisson(16, na)
        nnza = int(counts.sum())
        indptr_a = np.zeros(na + 1, np.int64)
        np.cumsum(counts, out=indptr_a[1:])
        cols_a = rng.integers(0, na, nnza)
        order_a = np.lexsort((cols_a, np.repeat(np.arange(na), counts)))
        spA = sps.csr_matrix(
            (rng.standard_normal(nnza).astype(np.float32),
             cols_a[order_a].astype(np.int32), indptr_a.astype(np.int64)),
            shape=(na, na))
        t0 = time.perf_counter()
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            opA8 = lo.opSparse(spA, format="auto")
        detail["auto_8m_nnz"] = nnza
        detail["auto_8m_format"] = type(opA8).__name__
        detail["auto_8m_pack_s"] = round(time.perf_counter() - t0, 2)
        detail["auto_8m_warned"] = any(
            "pack" in str(w.message) for w in wlist)
        va = jnp.ones((na,), dtype)
        tA8 = _marginal_apply_time(opA8, va, reps=2)
        detail["auto_8m_gnnz_per_s"] = round(nnza / tA8 / 1e9, 3)

    section("routed_unstructured", sec_routed_unstructured)
    section("routed_multichunk", sec_routed_multichunk)
    section("auto_8m", sec_auto_8m)
    section("spmv_windowed", sec_spmv_windowed)
    section("spmv_windowed_multi", sec_spmv_windowed_multi)
    section("permutation", sec_permutation)
    section("reorder", sec_reorder)
    section("csr_unstructured", sec_csr_unstructured)

    _emit(detail)


if __name__ == "__main__":
    main()
