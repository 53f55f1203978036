"""Isolate the Mosaic crash in the transpose BSR kernel's split-gather.

The forward kernel reaches f32-exactness with 3 DEFAULT-precision passes
(bf16 hi/mid/lo split of the f32 operand; 0/1 selector exact in one pass).
The same split in the transpose kernel crashed the Mosaic compiler in two
formulations. This probe compiles ~6 variants at a SMALL shape on the
relay and reports compile ok / crash per variant, so the working
formulation (if any) can be promoted into kernels/bsr_spmv.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_transpose_split.py
"""

import functools
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT


def split3(m):
    hi = m.astype(jnp.bfloat16).astype(m.dtype)
    r1 = m - hi
    mid = r1.astype(jnp.bfloat16).astype(m.dtype)
    lo = r1 - mid
    return hi, mid, lo


def make_kernel(variant):
    def kernel(kmax, cols_ref, u_ref, blocks_ref, out_ref):
        RK, bm, bn = blocks_ref.shape
        R = RK // kmax
        nbcol = out_ref.shape[0]
        row_of = jax.lax.broadcasted_iota(jnp.int32, (RK, R), 0) // kmax
        expand = (row_of == jax.lax.broadcasted_iota(jnp.int32, (RK, R), 1)).astype(u_ref.dtype)
        u_rk = jax.lax.dot_general(expand, u_ref[...], (((1,), (0,)), ((), ())),
                                   precision=HI, preferred_element_type=out_ref.dtype)
        contrib = jnp.sum(blocks_ref[...] * u_rk[:, :, None], axis=1)  # (RK, bn)
        ids = jax.lax.broadcasted_iota(jnp.int32, (RK, nbcol), 1)
        sel = (ids == cols_ref[...]).astype(out_ref.dtype)

        def tdot(c, prec):
            # (nbcol, bn) = sel^T(nbcol,RK) . c(RK,bn), contracting dim0/dim0
            return jax.lax.dot_general(sel, c, (((0,), (0,)), ((), ())),
                                       precision=prec, preferred_element_type=out_ref.dtype)

        if variant == "highest":                     # current production form
            upd = tdot(contrib, HI)
        elif variant == "default1":                  # single DEFAULT pass (inexact)
            upd = tdot(contrib, DEF)
        elif variant == "split3_t":                  # known-crash form 1
            h, m_, l = split3(contrib)
            upd = tdot(h, DEF) + tdot(m_, DEF) + tdot(l, DEF)
        elif variant == "split2_t":
            h, m_, _ = split3(contrib)
            upd = tdot(h, DEF) + tdot(m_, DEF)
        elif variant == "bf16ops_t":                 # explicit bf16 operands
            selb = sel.astype(jnp.bfloat16)
            h, m_, l = split3(contrib)
            upd = sum(jax.lax.dot_general(selb, c.astype(jnp.bfloat16),
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=out_ref.dtype)
                      for c in (h, m_, l))
        else:
            raise ValueError(variant)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] = out_ref[...] + upd
    return kernel


def make_kernel_selT(variant):
    """Selector built directly in (nbcol, RK) orientation from a (1, RK)
    cols layout passed host-side; standard matmul dims."""
    def kernel(kmax, colsT_ref, u_ref, blocks_ref, out_ref):
        RK, bm, bn = blocks_ref.shape
        R = RK // kmax
        nbcol = out_ref.shape[0]
        row_of = jax.lax.broadcasted_iota(jnp.int32, (RK, R), 0) // kmax
        expand = (row_of == jax.lax.broadcasted_iota(jnp.int32, (RK, R), 1)).astype(u_ref.dtype)
        u_rk = jax.lax.dot_general(expand, u_ref[...], (((1,), (0,)), ((), ())),
                                   precision=HI, preferred_element_type=out_ref.dtype)
        contrib = jnp.sum(blocks_ref[...] * u_rk[:, :, None], axis=1)
        ids = jax.lax.broadcasted_iota(jnp.int32, (nbcol, RK), 0)
        selT = (ids == colsT_ref[...]).astype(out_ref.dtype)  # (nbcol, RK)

        def mm(c, prec):
            return jax.lax.dot_general(selT, c, (((1,), (0,)), ((), ())),
                                       precision=prec, preferred_element_type=out_ref.dtype)

        if variant == "selT_highest":
            upd = mm(contrib, HI)
        elif variant == "selT_default1":
            upd = mm(contrib, DEF)
        elif variant == "selT_split3":               # known-crash form 2
            h, m_, l = split3(contrib)
            upd = mm(h, DEF) + mm(m_, DEF) + mm(l, DEF)
        else:
            raise ValueError(variant)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] = out_ref[...] + upd
    return kernel


def run_variant(name, nbrow=128, kmax=8, bm=8, bn=128, nbcol=64):
    rng = np.random.default_rng(0)
    R = 128
    blocks = jnp.asarray(rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, nbcol, (nbrow, kmax)).astype(np.int32))
    u = jnp.asarray(rng.standard_normal((nbrow, bm)).astype(np.float32))

    blocks_flat = blocks.reshape(nbrow * kmax, bm, bn)
    selT_mode = name.startswith("selT_")
    if selT_mode:
        cols_in = cols.reshape(1, nbrow * kmax)
        kern = functools.partial(make_kernel_selT(name), kmax)
        cols_spec = pl.BlockSpec((1, R * kmax), lambda i: (0, i), memory_space=pltpu.VMEM)
    else:
        cols_in = cols.reshape(nbrow * kmax, 1)
        kern = functools.partial(make_kernel(name), kmax)
        cols_spec = pl.BlockSpec((R * kmax, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(nbrow // R,),
        in_specs=[
            cols_spec,
            pl.BlockSpec((R, bm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R * kmax, bm, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbcol, bn), jnp.float32),
    )(cols_in, u, blocks_flat)
    got = np.asarray(out)

    # oracle (skip at sizes where the dense build would not fit in RAM;
    # compile success + finiteness is the signal there)
    if nbrow * bm * nbcol * bn * 4 > 2 << 30:
        assert np.all(np.isfinite(got))
        return float("nan")
    dense = np.zeros((nbrow * bm, nbcol * bn), np.float32)
    B = np.asarray(blocks)
    C = np.asarray(cols)
    for r in range(nbrow):
        for k in range(kmax):
            c = C[r, k]
            dense[r * bm:(r + 1) * bm, c * bn:(c + 1) * bn] += B[r, k]
    want = (dense.T @ np.asarray(u).ravel()).reshape(nbcol, bn)
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    return rel


if __name__ == "__main__":
    variants = ["highest", "default1", "split2_t", "split3_t", "bf16ops_t",
                "selT_highest", "selT_default1", "selT_split3"]
    for v in variants:
        try:
            rel = run_variant(v)
            print(f"{v:14s} OK   rel_err={rel:.3e}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{v:14s} FAIL {type(e).__name__}: {msg}", flush=True)
