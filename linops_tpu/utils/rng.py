"""Probe-key entropy for randomized checks and norm estimation.

The reference draws fresh random probes on every call (rand(), e.g.
src/utilities.jl:27-28, 73-75); a fixed default PRNGKey would give every
call the same deterministic blind spot (a start vector orthogonal to the
dominant singular vector fails every retry). Callers pin determinism by
passing an explicit ``key``.
"""

from __future__ import annotations

import os

import jax

__all__ = ["fresh_key"]


def fresh_key():
    """A PRNG key seeded from OS entropy (used when ``key=None``)."""
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
