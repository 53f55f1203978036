"""Round-5 TPU batch 13: bf16 8x128 — lift the R<=128 cap so bf16 tiles
return to the 4 MB DMA-saturation knee (batch10: padding hypothesis
refuted; the gap is exposed per-tile compute under 2 MB tiles).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2900 python
     tools/tpu_r5_batch13.py > tools/tpu_r5_batch13.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import linops_tpu.kernels.bsr_spmv as BK
from linops_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
t0 = time.time()

ns = 65536
bm, bn, kmax = 8, 128, 8
nbrow, nbcol = ns // bm, ns // bn
blocks16 = jnp.asarray(
    rng.standard_normal((nbrow, kmax, bm, bn)).astype(np.float32)
).astype(jnp.bfloat16)
cols = jnp.asarray(rng.integers(0, nbcol, size=(nbrow, kmax)).astype(np.int32))
x = jnp.ones((nbcol, bn), jnp.float32)

orig_rpp = BK.bsr_pallas_rows_per_program


def timed(variant):
    @jax.jit
    def chain(blocks, cols, xb, iters):
        def body(_, v):
            y = BK.bsr_matvec_pallas(blocks, cols, v, variant=variant)
            return (y / jnp.float32(kmax)).reshape(nbcol, bn)

        return lax.fori_loop(0, iters, body, xb)

    sync(chain(blocks16, cols, x, 50))
    sync(chain(blocks16, cols, x, 1050))
    ds = []
    for _ in range(3):
        t1 = time.perf_counter(); sync(chain(blocks16, cols, x, 50)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); sync(chain(blocks16, cols, x, 1050)); b = time.perf_counter() - t1
        ds.append(b - a)
    return sorted(ds)[1] / 1000


for Rcap in (128, 256, 512):
    def rpp(bm_, kmax_=8, bn_=128, itemsize=4, _cap=Rcap):
        per_row = max(kmax_ * bm_ * bn_ * itemsize, 1)
        r = (2 * 1024 * 1024 * (_cap // 64)) // per_row
        return int(max(8, min(_cap, (r // 8) * 8)))

    BK.bsr_pallas_rows_per_program = rpp
    try:
        for variant in ("onehot", "onehot_fast"):
            t = timed(variant)
            gbs = blocks16.size * 2 / t / 1e9
            print(f"R={rpp(8, 8, 128, 2):4d} {variant:12s} {t*1e6:7.1f} us"
                  f" = {gbs:6.1f} GB/s logical (bar >= 600)", flush=True)
    except Exception as e:
        print(f"Rcap={Rcap} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    finally:
        BK.bsr_pallas_rows_per_program = orig_rpp
    print(f"[t+{time.time()-t0:.0f}s]", flush=True)
print("batch13 done", flush=True)
