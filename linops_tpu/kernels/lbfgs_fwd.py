"""Pallas TPU kernel: fused L-BFGS forward apply.

``B v = v/γ + Bᵀ(B v) − Aᵀ(A v)`` over the stacked (mem, n) memories
(reference forward form, src/lbfgs.jl:173-202). XLA lowers the naive
expression as four separate passes over A and B (B@v, A@v, Bᵀ·, Aᵀ·); this
kernel does it in TWO passes — the HBM minimum, since all of ``Bv`` must
exist before the second contraction:

  grid = (2, n/bn), executed phase-major (TPU grids are sequential):
    phase 0, block j: accumulate  bx += B[:, j]·v[j],  ax += A[:, j]·v[j]
                      into a VMEM scratch that persists across grid steps
    phase 1, block j: y[j] = v[j]/γ + B[:, j]ᵀ·bx − A[:, j]ᵀ·ax

A and B stream through VMEM once per phase (double-buffered by the pallas
pipeline); the (mem,) intermediates never touch HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lbfgs_forward_pallas"]


def _kernel(a_ref, b_ref, v_ref, gamma_ref, y_ref, acc_ref):
    phase = pl.program_id(0)
    j = pl.program_id(1)
    mem = a_ref.shape[0]

    @pl.when((phase == 0) & (j == 0))
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _accumulate():
        vj = v_ref[0, :]
        acc_ref[0, :mem] += jnp.dot(b_ref[:, 0, :], vj, preferred_element_type=acc_ref.dtype)
        acc_ref[1, :mem] += jnp.dot(a_ref[:, 0, :], vj, preferred_element_type=acc_ref.dtype)

    @pl.when(phase == 1)
    def _emit():
        bx = acc_ref[0, :mem]
        ax = acc_ref[1, :mem]
        vj = v_ref[0, :]
        y = vj / gamma_ref[0, 0]
        y = y + jnp.dot(bx, b_ref[:, 0, :], preferred_element_type=y_ref.dtype)
        y = y - jnp.dot(ax, a_ref[:, 0, :], preferred_element_type=y_ref.dtype)
        y_ref[0, :] = y


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def lbfgs_forward_pallas(A, B, v, gamma, *, block_n: int = 65536, interpret: bool = False):
    """Forward L-BFGS apply via the fused two-pass kernel.

    A, B: (mem, n) with mem ≤ 128 and n divisible by ``block_n`` (callers
    pad); v: (n,); gamma: scalar."""
    mem, n = A.shape
    if mem > 128:
        raise ValueError("fused kernel supports mem <= 128")
    bn = min(block_n, n)
    if n % bn != 0:
        raise ValueError(f"n={n} must be divisible by block_n={bn}")
    nb = n // bn
    dt = jnp.result_type(A.dtype, v.dtype)

    v2 = v.reshape(nb, bn).astype(dt)
    gamma2 = jnp.asarray(gamma, dt).reshape(1, 1)

    out = pl.pallas_call(
        _kernel,
        grid=(2, nb),
        in_specs=[
            pl.BlockSpec((mem, 1, bn), lambda p, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mem, 1, bn), lambda p, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda p, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda p, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda p, j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, bn), dt),
        scratch_shapes=[pltpu.VMEM((2, 128), dt)],
        interpret=interpret,
    )(
        A.reshape(mem, nb, bn).astype(dt),
        B.reshape(mem, nb, bn).astype(dt),
        v2,
        gamma2,
    )
    return out.reshape(n)
