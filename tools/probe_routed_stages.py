"""TPU per-stage cost probe for the Clos-routed SpMV pipeline.

Routing-array CONTENT doesn't affect timing (lane gathers are
data-independent), so this probes with random indices at the bench-scale
domain (N = 2^21 slots, m = 16384 windows) without paying the host-side
route computation:

  A. phase-1: XLA row-gather x2[win_block] + pallas lane-gather·mul
  B. one pallas lane-gather crossbar stage (m, 128)
  C. XLA wiring W1: (m,128) -> T -> reshape (128B,128)
  D. middle stage G3 at B<128: jnp take_along vs padded-pallas
  E. full 5-stage pipeline (B=128) incl. final reshape-sum + segment-sum
  F. int8 stage indices (cast in kernel) vs int32

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_routed_stages.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from linops_tpu.kernels.lane_gather import lane_gather, lane_gather_mul  # noqa: E402
from linops_tpu.utils.timing import marginal_chain_time  # noqa: E402

RADIX = 128
M = 16384                 # windows -> N = 2^21 slots
B = M // RADIX            # 128
rng = np.random.default_rng(0)

print(jax.devices(), flush=True)


def bench(name, fn, x0, n_elems, iters=(20, 220)):
    def chain(a0, iters):
        def body(i, acc):
            g = fn(a0 + acc[:1, :1] * 1e-20)
            return acc + g.astype(acc.dtype)
        z = jnp.zeros(jax.eval_shape(fn, a0).shape, jnp.float32)
        return jax.lax.fori_loop(0, iters, body, z)

    runj = jax.jit(chain, static_argnames="iters")
    try:
        dt = marginal_chain_time(lambda a, it: runj(a, iters=it), x0,
                                 iters_short=iters[0], iters_long=iters[1])
        print(f"{name:34s}: {n_elems/dt/1e9:8.2f} G elems/s ({dt*1e6:9.1f} us)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{name:34s}: FAILED {str(e)[:200]}", flush=True)
        return None


a = jnp.asarray(rng.standard_normal((M, RADIX)), jnp.float32)
idx32 = jnp.asarray(rng.integers(0, RADIX, (M, RADIX)), jnp.int32)
idx8 = idx32.astype(jnp.int8)
vals = jnp.asarray(rng.standard_normal((M, RADIX)), jnp.float32)
winb = jnp.asarray(rng.integers(0, 512, (M,)), jnp.int32)
x2 = jnp.asarray(rng.standard_normal((512, RADIX)), jnp.float32)

N = M * RADIX

# B: single crossbar stage
bench("B  pallas lane gather i32", lambda v: lane_gather(v, idx32), a, N)
bench("F  pallas lane gather i8", lambda v: lane_gather(v, idx8), a, N)
bench("B2 XLA take_along axis1", lambda v: jnp.take_along_axis(v, idx32, 1), a, N)

# A: phase 1
bench("A  rowgather (XLA) only", lambda v: x2[winb] + v[:, :1] * 0, a, N)
bench("A2 phase1 rowgather+pallas mul",
      lambda v: lane_gather_mul(x2[winb], idx32, vals + v[:, :1] * 0), a, N)

# C: wirings
bench("C  W1 transpose+reshape",
      lambda v: v.T.reshape(RADIX * B, RADIX) * 1.0, a, N)
bench("C2 W2 transpose (128,B,128)->(0,2,1)",
      lambda v: v.reshape(RADIX, B, RADIX).transpose(0, 2, 1)
                 .reshape(RADIX * RADIX, B) * 1.0, a, N)

# D: middle stage at B_small = 84 (bench-shape-like domain)
Bs = 84
a84 = jnp.asarray(rng.standard_normal((RADIX * RADIX, Bs)), jnp.float32)
g3_84 = jnp.asarray(rng.integers(0, Bs, (RADIX * RADIX, Bs)), jnp.int32)
bench("D  g3 jnp take_along (16384,84)",
      lambda v: jnp.take_along_axis(v, g3_84, 1), a84, RADIX * RADIX * Bs)
g3_84p = jnp.pad(g3_84, ((0, 0), (0, RADIX - Bs)))
bench("D2 g3 padded-pallas (16384,84->128)",
      lambda v: lane_gather(jnp.pad(v, ((0, 0), (0, RADIX - Bs))), g3_84p)[:, :Bs],
      a84, RADIX * RADIX * Bs)

# E: full 5-stage pipeline at B=128 incl. sums
g2 = jnp.asarray(rng.integers(0, RADIX, (RADIX * B, RADIX)), jnp.int32)
g3 = jnp.asarray(rng.integers(0, B, (RADIX * RADIX, B)), jnp.int32)
g4 = jnp.asarray(rng.integers(0, RADIX, (RADIX * B, RADIX)), jnp.int32)
g5 = jnp.asarray(rng.integers(0, RADIX, (M, RADIX)), jnp.int32)
W = 16
sub_rows = jnp.asarray(np.arange(N // W) // 2, jnp.int32)
NROWS = N // W // 2


def full_pipe(v):
    z = lane_gather_mul(x2[winb], idx32, vals + v[:, :1] * 0)
    z = z.T.reshape(RADIX * B, RADIX)
    z = lane_gather(z, g2)
    z = z.reshape(RADIX, B, RADIX).transpose(0, 2, 1).reshape(RADIX * RADIX, B)
    z = lane_gather(z, g3)
    z = z.reshape(RADIX, RADIX, B).transpose(0, 2, 1).reshape(RADIX * B, RADIX)
    z = lane_gather(z, g4)
    z = z.reshape(RADIX, B * RADIX).T.reshape(M, RADIX)
    z = lane_gather(z, g5)
    part = z.reshape(-1, W).sum(axis=1)
    y = jax.ops.segment_sum(part, sub_rows, num_segments=NROWS,
                            indices_are_sorted=True)
    return y.reshape(-1, RADIX)


dt = bench("E  FULL 5-stage pipeline", full_pipe, a, N)
if dt:
    print(f"   -> slots/s {N/dt/1e9:.2f} G; at 1.39M-slot/1.05M-nnz bench "
          f"shape ~{1.05e6/ (dt * 1.39e6 / N) /1e9:.2f} Gnnz/s equiv", flush=True)

# int8 full pipeline
g2_8, g4_8, g5_8, idx8b = (g.astype(jnp.int8) for g in (g2, g4, g5, idx32))


def full_pipe_i8(v):
    z = lane_gather_mul(x2[winb], idx8b, vals + v[:, :1] * 0)
    z = z.T.reshape(RADIX * B, RADIX)
    z = lane_gather(z, g2_8)
    z = z.reshape(RADIX, B, RADIX).transpose(0, 2, 1).reshape(RADIX * RADIX, B)
    z = lane_gather(z, g3)
    z = z.reshape(RADIX, RADIX, B).transpose(0, 2, 1).reshape(RADIX * B, RADIX)
    z = lane_gather(z, g4_8)
    z = z.reshape(RADIX, B * RADIX).T.reshape(M, RADIX)
    z = lane_gather(z, g5_8)
    part = z.reshape(-1, W).sum(axis=1)
    y = jax.ops.segment_sum(part, sub_rows, num_segments=NROWS,
                            indices_are_sorted=True)
    return y.reshape(-1, RADIX)


dt8 = bench("E2 FULL pipeline int8 idx", full_pipe_i8, a, N)
if dt8:
    print(f"   -> slots/s {N/dt8/1e9:.2f} G", flush=True)

print("DONE", flush=True)
