"""TPU gather probe, round 2 (see probe_gather.py for round 1).

Round-1 findings: take_along_axis axis=1 (lane gather) LOWERS in Mosaic;
axis=0 (sublane) failed with an empty message; flat 1-D gather says "Only 2D
gather is supported"; one-hot row gather ~16 G elem/s at nb=8192; scalar-loop
row loads ~24 M rows/s. Round 2: real tracebacks, correctness for the lane
gather, heavier chains (50/1050 iters) so small kernels clear relay jitter,
and the Benes-network building blocks (lane/sublane roll + select).
"""

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from linops_tpu.utils.timing import marginal_chain_time  # noqa: E402

T = 4096


def _vm(*shapes):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes]


def run_case(name, fn, args, ref=None, n_out_elems=None, iters=(20, 220)):
    try:
        out = np.asarray(fn(*args))
        if ref is not None:
            err = np.abs(out - ref).max()
            print(f"{name}: max abs err {err}", flush=True)
            if err > 1e-6:
                print(f"{name}: WRONG RESULT", flush=True)
                return
        def chain(a0, iters):
            def body(i, acc):
                g = fn(args[0] + acc[:1, :1] * 1e-20, *args[1:])
                return acc + g.astype(acc.dtype)
            z = jnp.zeros(out.shape, jnp.float32)
            return jax.lax.fori_loop(0, iters, body, z)
        runj = jax.jit(chain, static_argnames="iters")
        dt = marginal_chain_time(lambda a, it: runj(a, iters=it), args[0],
                                 iters_short=iters[0], iters_long=iters[1])
        n = n_out_elems or out.size
        print(f"{name}: {n/dt/1e9:9.3f} G elems/s ({dt*1e6:.2f} us/call)", flush=True)
    except Exception:
        tb = traceback.format_exc(limit=30).replace("\n", " | ")
        print(f"{name}: FAILED {tb[-600:]}", flush=True)


rng = np.random.default_rng(0)

# --- A. sublane gather, with full error ---------------------------------------
def sublane_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)


def sublane(x, idx):
    return pl.pallas_call(
        sublane_kernel, in_specs=_vm(x, idx), out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32))(x, idx)


for nb in (8, 512):
    x = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, nb, size=(T, 128)), jnp.int32)
    ref = np.asarray(x)[np.asarray(idx), np.arange(128)[None, :]]
    run_case(f"A sublane axis0 nb={nb}", sublane, (x, idx), ref)

# same-shape variant (T == nb)
x = jnp.asarray(rng.standard_normal((T, 128)), jnp.float32)
idx = jnp.asarray(rng.integers(0, T, size=(T, 128)), jnp.int32)
ref = np.asarray(x)[np.asarray(idx), np.arange(128)[None, :]]
run_case("A2 sublane axis0 square", sublane, (x, idx), ref)

# --- B. lane gather with REAL correctness -------------------------------------
def lane_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)


def lane(x, idx):
    return pl.pallas_call(
        lane_kernel, in_specs=_vm(x, idx), out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32))(x, idx)


x = jnp.asarray(rng.standard_normal((T, 128)), jnp.float32)
idx = jnp.asarray(rng.integers(0, 128, size=(T, 128)), jnp.int32)
ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
run_case("B lane axis1 (T,128)", lane, (x, idx), ref)

# --- R. rolls + select (Benes stage cost) -------------------------------------
def benes_stage_kernel(nstage, x_ref, m_ref, o_ref):
    v = x_ref[...]
    for s in range(nstage):
        d = 1 << (s % 7)
        r = pltpu.roll(v, -d, 1)
        l = pltpu.roll(v, d, 1)
        m = m_ref[...] != 0
        v = jnp.where(m, r, l)
    o_ref[...] = v


def benes(nstage, x, m):
    return pl.pallas_call(
        functools.partial(benes_stage_kernel, nstage),
        in_specs=_vm(x, m), out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x, m)


x = jnp.asarray(rng.standard_normal((T, 128)), jnp.float32)
m = jnp.asarray(rng.integers(0, 2, size=(T, 128)), jnp.int32)
for ns in (1, 40):
    run_case(f"R lane-roll-select x{ns}", functools.partial(benes, ns), (x, m),
             n_out_elems=x.size * ns)


def roll0_kernel(x_ref, m_ref, o_ref):
    v = x_ref[...]
    r = pltpu.roll(v, -8, 0)
    o_ref[...] = jnp.where(m_ref[...] != 0, r, v)


def roll0(x, m):
    return pl.pallas_call(
        roll0_kernel, in_specs=_vm(x, m), out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x, m)


run_case("R2 sublane-roll-select", roll0, (x, m))

# --- X. XLA-level (non-pallas) gathers for context ----------------------------
def xla_take_along(x, idx):
    return jnp.take_along_axis(x, idx, axis=0)


nb = 512
x = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
idx = jnp.asarray(rng.integers(0, nb, size=(T, 128)), jnp.int32)
ref = np.asarray(x)[np.asarray(idx), np.arange(128)[None, :]]
run_case("X xla take_along axis0", jax.jit(xla_take_along), (x, idx), ref)


def xla_flat(x, idx):
    return x.reshape(-1)[idx]


xf = jnp.asarray(rng.standard_normal(512 * 128), jnp.float32)
idxf = jnp.asarray(rng.integers(0, xf.size, size=(T, 128)), jnp.int32)
run_case("X2 xla flat fancy", jax.jit(xla_flat), (xf.reshape(512, 128), idxf),
         np.asarray(xf)[np.asarray(idxf)])

print("DONE", flush=True)
