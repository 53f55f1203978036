"""Round-5 TPU batch 28: multichunk routed throughput with BALANCED
chunk splits (slot utilization 0.667 -> 0.762; r4/r5 measured 9.2 fwd /
8.5 T — padding-limited).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch28.py > tools/tpu_r5_batch28.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import linops_tpu as lo
from linops_tpu.sparse.formats import csr_from_parts
from linops_tpu.sparse.routed import pack_routed_csr
from linops_tpu.utils.timing import marginal_chain_time, sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

nm = 1 << 18
counts = rng.poisson(16, nm)
nnzm = int(counts.sum())
indptr = np.zeros(nm + 1, np.int64)
np.cumsum(counts, out=indptr[1:])
cols = rng.integers(0, nm, nnzm)
order = np.lexsort((cols, np.repeat(np.arange(nm), counts)))
hp = (rng.standard_normal(nnzm).astype(np.float32),
      cols[order].astype(np.int32), indptr.astype(np.int32))
t1 = time.perf_counter()
fwd_np, der_np = pack_routed_csr(*hp, (nm, nm), with_transpose=True,
                                 to_device=False)
print(f"pack cpu {time.perf_counter()-t1:.2f}s chunks={fwd_np.vals.shape[0]} "
      f"util={nnzm/fwd_np.vals.size:.3f}", flush=True)
fwd = jax.device_put(fwd_np)
der = jax.device_put(der_np) if der_np is not None else None
sync(fwd.vals)
op = lo.RoutedCSROperator(csr_from_parts(*hp, (nm, nm)), routed=fwd,
                          routed_t=der, host_parts=hp)
vm = jnp.ones((nm,), jnp.float32)


def f(mode):
    return lambda o, x, iters: lo.matvec_chain(o, x, iters, mode=mode)


for name, mode in (("fwd", "N"), ("T  ", "T")):
    t = marginal_chain_time(f(mode), op, vm, iters_short=50,
                            iters_long=1050, reps=3)
    print(f"multichunk {name}: {nnzm/t/1e9:.3f} Gnnz/s ({t*1e6:.1f} us)"
          f"  (r5 greedy: fwd 9.17, T 8.50)", flush=True)
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)
print("batch28 done", flush=True)
