"""Profile pack_routed_csr host-side stage costs (VERDICT r3 item 2).

Run: python tools/profile_pack.py [n] [nnz_row]
"""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
nnz_row = int(sys.argv[2]) if len(sys.argv) > 2 else 16

rng = np.random.default_rng(0)
nnz = n * nnz_row
cols = rng.integers(0, n, size=nnz, dtype=np.int64)
# sort within rows for CSR canonical form
cols = np.sort(cols.reshape(n, nnz_row), axis=1).reshape(-1)
vals = rng.standard_normal(nnz).astype(np.float32)
indptr = np.arange(0, nnz + 1, nnz_row, dtype=np.int64)

from linops_tpu.sparse.routed import pack_routed_csr

t0 = time.perf_counter()
p = pack_routed_csr(vals, cols, indptr, (n, n))
t1 = time.perf_counter()
print(f"pack total: {t1 - t0:.3f} s for {nnz/1e6:.2f} Mnnz "
      f"({(t1 - t0) / (nnz / 1e6):.3f} s/Mnnz), w={p.w}, "
      f"C={p.vals.shape[0]}, N={p.vals.shape[1]*128}")

pr = cProfile.Profile()
pr.enable()
p = pack_routed_csr(vals, cols, indptr, (n, n))
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(25)
