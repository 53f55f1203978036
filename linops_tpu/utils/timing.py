"""Relay-safe timing helpers shared by bench.py and the scaling bench.

``block_until_ready`` can be a NO-OP on remote TPU relays, so completion
must be forced with a host fetch; chain timings use the marginal
(long − short) method to cancel per-call dispatch overhead.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["sync", "marginal_chain_time"]


def sync(out):
    """Force completion via a host fetch of one element."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def marginal_chain_time(run, *args, iters_short=5, iters_long=55, reps=3):
    """Marginal seconds/iteration of ``run(*args, iters)``: median of
    repeated (long − short) deltas."""
    sync(run(*args, iters_short))
    sync(run(*args, iters_long))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(*args, iters_short))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(run(*args, iters_long))
        b = time.perf_counter() - t0
        deltas.append(b - a)
    return max(float(np.median(deltas)), 1e-9) / (iters_long - iters_short)
