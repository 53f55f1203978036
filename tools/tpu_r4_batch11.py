"""Round-4 TPU batch 11: packed (bm, nbrow) <-> flat relayout strategies.

The windowed BSR via-op path pays one host relayout per apply in each
direction (fwd: kernel's packed y.T -> flat; T: flat u -> packed input).
Direct-kernel 626 GB/s vs via-op 576 says the pair costs ~0.5 ms at
n = 4.2M. Candidates, timed as round-trip pairs inside one jit chain:

  A. current: x.reshape(nbrow, 8).T (flat->packed)  /  p.T.reshape(-1)
  B. lax.reshape with dimensions= (fused transpose+reshape, one XLA op)
  C. MXU one-hot: flat2d (T,128) @ P -> packedish; both directions are
     (T,128)@(128,128) matmuls with NO minor-dim-padded intermediates:
       flat2d = flat.reshape(T, 128)           # T = nbrow/16
       flat2d[t, 8c+r] = packed[r, t*16+c]
     so with G[l, r*16+c] = 1 iff l == 8c+r (128x128 permutation):
       pk3 = (flat2d @ G).reshape(T, 8, 16)  is packed[r, t*16+c] laid
       out t-major; the kernel would need packed (8, nbrow) -- ALSO a
       relayout. So C only helps if the KERNEL consumes/produces the
       (T, 8, 16) t-major layout directly. Time it anyway to see the
       matmul's rate vs the XLA transposes.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 1800 \
     python tools/tpu_r4_batch11.py > /tmp/r4b11.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)

nbrow = 524288          # n = 4.19M, bm = 8
bm = 8
N = nbrow * bm
T = N // 128            # 32768

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal(N).astype(np.float32))

# one-hot 128x128 permutation G[l, r*16+c] = (l == 8c + r)
l_idx = np.arange(128)
src = (l_idx % 8) * 16 + (l_idx // 8)      # G[l, src[l]] = 1
G = np.zeros((128, 128), np.float32)
G[l_idx, src] = 1.0
Gj = jnp.asarray(G)
GjT = jnp.asarray(G.T.copy())


def measure(name, fn, *args, iters=(50, 550), reps=3):
    sync(fn(*args, iters[0]))
    sync(fn(*args, iters[1]))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args, iters[0]))
        a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(fn(*args, iters[1]))
        b = time.perf_counter() - t0
        pers.append((b - a) / (iters[1] - iters[0]))
    per = float(np.median(pers))
    print(f"{name}: {per*1e6:.1f} us/pair  (deltas "
          + " ".join(f"{q*1e6:.0f}" for q in pers) + ")", flush=True)
    return per


@jax.jit
def chain_a(x, iters):
    def body(i, xc):
        p = xc.reshape(nbrow, bm).T + 1e-30 * i      # flat -> packed
        return p.T.reshape(-1)                        # packed -> flat
    return lax.fori_loop(0, iters, body, x)


@jax.jit
def chain_b(x, iters):
    def body(i, xc):
        p = lax.transpose(xc.reshape(nbrow, bm), (1, 0)) + 1e-30 * i
        return lax.reshape(p, (N,), dimensions=(1, 0))
    return lax.fori_loop(0, iters, body, x)


@jax.jit
def chain_c(x, iters):
    def body(i, xc):
        pk = (xc.reshape(T, 128) @ GjT) + 1e-30 * i   # flat -> t-major packed
        return (pk @ Gj).reshape(-1)                   # back to flat
    return lax.fori_loop(0, iters, body, x)


ta = measure("A  .T/.reshape pair ", chain_a, x0)
tb = measure("B  lax.reshape pair ", chain_b, x0)
tc = measure("C  MXU one-hot pair ", chain_c, x0)

byts = N * 4
print(f"bytes/direction {byts/1e6:.1f} MB; apparent GB/s (4 passes/pair): "
      f"A {4*byts/ta/1e9:.0f}  B {4*byts/tb/1e9:.0f}  C {4*byts/tc/1e9:.0f}",
      flush=True)

# sanity: A and C agree with the reference permutation
pa = np.asarray(chain_a(x0, 1))
pc = np.asarray(chain_c(x0, 1))
print("A==x", np.allclose(pa, np.asarray(x0)), "C==x",
      np.allclose(pc, np.asarray(x0)), flush=True)
print("DONE", flush=True)
