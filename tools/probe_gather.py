"""TPU probe: which VMEM gather primitives does Mosaic lower, and how fast?

Decides the design of the unstructured-sparse SpMV kernel (VERDICT r2 §next-1).
Candidates, each wrapped in try/except (a failed lowering must not kill the
rest) and timed with the marginal method (CLAUDE.md relay rules):

  A. sublane gather   out[t,l] = x[idx[t,l], l]   (take_along_axis axis=0)
     -- THE primitive we want: with nnz pre-bucketed host-side by col%128,
     one sublane gather IS the whole x gather for SpMV.
  B. lane gather      out[t,l] = x[t, idx[t,l]]   (take_along_axis axis=1)
  C. flat fancy gather out[t,l] = x_flat[idx[t,l]]
  D. one-hot MXU gather (known-good baseline, O(nb*128) MACs/elem)
  E. scalar fori_loop dynamic row loads (rate of x_ref[i] per iteration)

Each probe reports G gathered-elems/s. Run with the chip otherwise idle:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 2900 python tools/probe_gather.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from linops_tpu.utils.timing import marginal_chain_time, sync  # noqa: E402

T = 2048  # gathered rows per call (T*128 elements)


def _chain(gather_fn, x, idx, iters):
    def body(i, acc):
        g = gather_fn(x + acc[0, 0] * 1e-30, idx)
        return acc + g

    return jax.lax.fori_loop(0, iters, body, jnp.zeros((T, 128), jnp.float32))


def probe(name, gather_fn, nb, check=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, nb, size=(T, 128)), jnp.int32)
    try:
        out = np.asarray(gather_fn(x, idx))
        if check:
            ref = np.asarray(x)[np.asarray(idx), np.arange(128)[None, :]]
            err = np.abs(out - ref).max()
            assert err < 1e-6, f"wrong result, max abs err {err}"
        run = jax.jit(functools.partial(_chain, gather_fn), static_argnames="iters")
        dt = marginal_chain_time(lambda xx, ii, it: run(xx, ii, iters=it), x, idx,
                                 iters_short=10, iters_long=110)
        rate = T * 128 / dt / 1e9
        print(f"{name:28s} nb={nb:6d}: {rate:9.3f} G elems/s  ({dt*1e6:.1f} us/call)",
              flush=True)
        return rate
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name:28s} nb={nb:6d}: FAILED: {msg}", flush=True)
        return None


# --- A: sublane gather (take_along_axis axis=0) -----------------------------
def sublane_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)


def sublane_gather(x, idx):
    nb = x.shape[0]
    return pl.pallas_call(
        sublane_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
    )(x, idx)


# --- B: lane gather (take_along_axis axis=1), x tiled to (T,128) -------------
def lane_kernel(x_ref, idx_ref, o_ref):
    xt = x_ref[...]  # (T, 128)
    o_ref[...] = jnp.take_along_axis(xt, idx_ref[...] % 128, axis=1)


def lane_gather(x, idx):
    xt = jnp.broadcast_to(x[:1, :], (T, 128))  # contents don't matter for lowering
    out = pl.pallas_call(
        lane_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
    )(xt, idx)
    return out


# --- C: flat fancy gather -----------------------------------------------------
def flat_kernel(n, x_ref, idx_ref, o_ref):
    xf = x_ref[...].reshape(-1)
    o_ref[...] = xf[idx_ref[...].reshape(-1)].reshape(o_ref.shape)


def flat_gather(x, idx):
    n = x.size
    return pl.pallas_call(
        functools.partial(flat_kernel, n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
    )(x, idx * 128 + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))


# --- D: one-hot MXU gather (row gather: out[t,:] = x[idx[t,0],:]) ------------
def onehot_kernel(x_ref, idx_ref, o_ref):
    nb = x_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (T, nb), 1)
    sel = (ids == idx_ref[...][:, :1]).astype(jnp.float32)
    o_ref[...] = jax.lax.dot_general(
        sel, x_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


def onehot_gather(x, idx):
    return pl.pallas_call(
        onehot_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
    )(x, idx)


# --- E: scalar-indexed dynamic row loads --------------------------------------
def scalar_kernel(x_ref, idx_ref, o_ref):
    def body(t, _):
        o_ref[t, :] = x_ref[idx_ref[t, 0], :]
        return 0
    jax.lax.fori_loop(0, T, body, 0)


def scalar_gather(x, idx):
    return pl.pallas_call(
        scalar_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
    )(x, idx)


def _check_row(fn, nb):
    """Correctness oracle for row-granularity gathers (D, E)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, nb, size=(T, 128)), jnp.int32)
    out = np.asarray(fn(x, idx))
    ref = np.asarray(x)[np.asarray(idx)[:, 0], :]
    return np.abs(out - ref).max() < 1e-6


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    results = {}
    for nb in (512, 8192):
        results[f"sublane_{nb}"] = probe("A sublane take_along_axis", sublane_gather, nb)
    results["lane_512"] = probe("B lane take_along_axis", lane_gather, 512, check=False)
    for nb in (512,):
        results[f"flat_{nb}"] = probe("C flat fancy gather", flat_gather, nb)
    for nb in (512, 8192):
        try:
            ok = _check_row(onehot_gather, nb)
            print(f"D onehot row-gather correct={ok}", flush=True)
        except Exception as e:
            print(f"D onehot failed: {str(e)[:200]}", flush=True)
            continue
        results[f"onehot_{nb}"] = probe("D onehot MXU row gather", onehot_gather, nb,
                                        check=False)
    for nb in (512,):
        try:
            ok = _check_row(scalar_gather, nb)
            print(f"E scalar row-gather correct={ok}", flush=True)
        except Exception as e:
            print(f"E scalar failed: {str(e)[:200]}", flush=True)
            continue
        results[f"scalar_{nb}"] = probe("E scalar loop row gather", scalar_gather, nb,
                                        check=False)
    print("RESULTS", results, flush=True)
