"""Compiled-program introspection: audit the ICI collectives GSPMD and
shard_map insert into jitted SPMD programs.

The reference has no analogue (its parallelism is BLAS threads); on TPU the
collective schedule IS the scaling story, so the framework exposes it:
``collective_counts`` compiles a function and counts the collective
instructions in the optimized HLO — the contract the scaling bench and the
multichip dryrun assert against (e.g. a halo-partitioned matvec must insert
exactly 2 ``collective-permute`` ops and ZERO ``all-gather``s per apply).
"""

from __future__ import annotations

import re

import jax

__all__ = ["collective_counts", "hlo_collective_counts", "COLLECTIVE_OPS"]

COLLECTIVE_OPS = (
    "collective-permute",
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
)


def hlo_collective_counts(hlo_text: str) -> dict:
    """Count collective instructions in optimized-HLO text. Async pairs
    (``-start``/``-done``) count once."""
    counts = {}
    for name in COLLECTIVE_OPS:
        # instruction forms: `name(`, `name-start(`, `name.N(` — count the
        # op applications, not the `-done` halves of async pairs
        pat = rf"\b{re.escape(name)}(?:-start)?(?:\.\d+)?\("
        counts[name] = len(re.findall(pat, hlo_text))
    return counts


def collective_counts(fn, *args, static_argnames=None, **kwargs) -> dict:
    """Compile ``fn(*args, **kwargs)`` (jit) and return the per-program
    collective-instruction counts of the optimized HLO.

    Note this counts *instructions in the program text*: a collective inside
    a compiled loop body counts once regardless of trip count, so the result
    is the per-iteration schedule for chain/loop programs.
    """
    jitted = (
        jax.jit(fn, static_argnames=static_argnames)
        if static_argnames
        else jax.jit(fn)
    )
    compiled = jitted.lower(*args, **kwargs).compile()
    return hlo_collective_counts(compiled.as_text())
