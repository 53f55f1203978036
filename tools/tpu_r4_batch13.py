"""Round-4 TPU batch 13: opSparse(reorder='rcm') end-to-end on chip.

A scrambled banded matrix (n=262144, 113 diagonals, 29.6M nnz) that the
scattered path could not even auto-route (nnz > cap → 0.063 Gnnz/s CSR)
recovers the banded BSR MXU path through the RCM sandwich. Measures the
reordered via-op chain vs the directly-banded operator (the permutation
sandwich overhead) and correctness vs scipy.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 \
     python tools/tpu_r4_batch13.py > /tmp/r4b13.log 2>&1 &
"""
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import linops_tpu as lo
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
n, bw = 1 << 18, 56
diags = [rng.standard_normal(n - abs(k)).astype(np.float32)
         for k in range(-bw, bw + 1)]
A = sps.diags(diags, range(-bw, bw + 1), format="csr")
sigma = rng.permutation(n)
t0 = time.perf_counter()
Asc = A[sigma][:, sigma].tocsr()
print(f"scramble: {time.perf_counter()-t0:.1f} s, nnz={Asc.nnz}", flush=True)

t0 = time.perf_counter()
op_re = lo.opSparse(Asc, format="auto", reorder="rcm", dtype=jnp.float32)
print(f"reorder+pack: {time.perf_counter()-t0:.1f} s; inner="
      f"{type(op_re.inner).__name__}", flush=True)
t0 = time.perf_counter()
op_band = lo.opSparse(A, format="auto", dtype=jnp.float32)
print(f"banded pack: {time.perf_counter()-t0:.1f} s; "
      f"{type(op_band).__name__}", flush=True)

d = op_re.inner.data
assert hasattr(d, "blocks"), f"auto picked {type(op_re.inner).__name__}"
blk_bytes = int(np.prod(d.blocks.shape)) * d.blocks.dtype.itemsize
print(f"inner blocks {d.blocks.shape} = {blk_bytes/1e9:.2f} GB, "
      f"kmax={d.block_cols.shape[1]}", flush=True)

v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

# correctness first (single apply)
y = np.asarray(jax.jit(lambda o, w: o * w)(op_re, v))
ref = Asc @ np.asarray(v)
rel = np.abs(y - ref).max() / np.abs(ref).max()
print(f"reordered apply rel err: {rel:.2e}", flush=True)


def measure(name, o, vv, iters=(5, 55), reps=3):
    @jax.jit
    def ch(oo, w, it):
        return lo.matvec_chain(oo, w, it, mode="N")

    sync(ch(o, vv, iters[0]))
    sync(ch(o, vv, iters[1]))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(ch(o, vv, iters[0]))
        a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(ch(o, vv, iters[1]))
        b = time.perf_counter() - t0
        pers.append((b - a) / (iters[1] - iters[0]))
    per = float(np.median(pers))
    print(f"{name}: {per*1e6:.0f} us/apply = {blk_bytes/per/1e9:.0f} GB/s "
          "(deltas " + " ".join(f"{q*1e6:.0f}" for q in pers) + ")",
          flush=True)
    return per


t_re = measure("reordered chain", op_re, v)
t_bd = measure("banded chain   ", op_band, v)
print(f"sandwich overhead: {(t_re-t_bd)*1e6:.0f} us/apply "
      f"({t_re/t_bd:.2f}x the banded direct)", flush=True)
print("DONE", flush=True)
