"""2-D grid stencil operator — shifts in grid layout, not vector layout.

For operators on an (nx, ny) grid, applying shifts to the FLATTENED vector
makes every ±1 offset a cross-lane rotate (measured ~656 µs for a 2048²
5-point Laplacian); reshaping to the grid and shifting along the two axes
lets XLA fuse everything into one VMEM-resident pass (~34 µs, ~20x).
The operator interface stays 1-D (vectors of length nx·ny, row-major);
reshapes are free under jit.

Coefficients per offset are either scalars (constant stencil — minimal HBM
traffic: read x, write y) or full (nx, ny) grids (spatially varying).
Boundary semantics: zero beyond the grid edge (Dirichlet-style coupling
matrix), matching ``laplacian_2d``.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import LinearOperator, LinearOperatorException, register_operator

__all__ = ["Stencil2DOperator", "opStencil2D"]


def _shift2d(x, dx: int, dy: int):
    """x[i + dx, j + dy] with zero fill; static pads/slices, fused."""
    if dx > 0:
        x = jnp.pad(x[dx:, :], ((0, dx), (0, 0)))
    elif dx < 0:
        x = jnp.pad(x[:dx, :], ((-dx, 0), (0, 0)))
    if dy > 0:
        x = jnp.pad(x[:, dy:], ((0, 0), (0, dy)))
    elif dy < 0:
        x = jnp.pad(x[:, :dy], ((0, 0), (-dy, 0)))
    return x


class Stencil2DOperator(LinearOperator):
    """Square operator on an (nx, ny) grid defined by offset/coefficient
    pairs: ``(A x)[i, j] = Σ_k c_k[i, j] · x[i + dx_k, j + dy_k]``."""

    _fields_children = ("coeffs",)
    _fields_aux = ("_nx", "_ny", "_offsets", "_scalar_coeffs", "_is_sym")

    def __init__(self, nx: int, ny: int, offsets: Sequence[Tuple[int, int]], coeffs):
        super().__init__()
        self._nx, self._ny = int(nx), int(ny)
        self._offsets = tuple((int(dx), int(dy)) for dx, dy in offsets)
        coeffs = jnp.asarray(coeffs)
        if coeffs.ndim == 1:
            if coeffs.shape[0] != len(self._offsets):
                raise LinearOperatorException("need one coefficient per offset")
            self._scalar_coeffs = True
        elif coeffs.shape == (len(self._offsets), self._nx, self._ny):
            self._scalar_coeffs = False
        else:
            raise LinearOperatorException(
                "coeffs must be (k,) scalars or (k, nx, ny) grids"
            )
        self.coeffs = coeffs
        self._is_sym = self._compute_sym()

    @property
    def nrow(self):
        return self._nx * self._ny

    @property
    def ncol(self):
        return self._nx * self._ny

    @property
    def grid_shape(self):
        return (self._nx, self._ny)

    @property
    def dtype(self):
        return self.coeffs.dtype

    def _compute_sym(self) -> bool:
        """Static symmetry check at construction: every offset's mirror must
        carry the same scalar coefficient. Varying coefficients or traced
        construction default to False (flags key the jit cache)."""
        if not self._scalar_coeffs:
            return False
        try:
            vals = np.asarray(self.coeffs)
        except Exception:
            return False
        table = {o: i for i, o in enumerate(self._offsets)}
        for (dx, dy), i in table.items():
            j = table.get((-dx, -dy))
            if j is None or vals[i] != vals[j]:
                return False
        return True

    @property
    def symmetric(self):
        return self._is_sym

    @property
    def hermitian(self):
        return self._is_sym and not jnp.iscomplexobj(self.coeffs)

    def _prod(self, v):
        x = v.reshape(self._nx, self._ny)
        y = jnp.zeros_like(x)
        for i, (dx, dy) in enumerate(self._offsets):
            c = self.coeffs[i]
            y = y + c * _shift2d(x, dx, dy)
        return y.reshape(-1)

    def _tprod(self, u):
        x = u.reshape(self._nx, self._ny)
        y = jnp.zeros_like(x)
        for i, (dx, dy) in enumerate(self._offsets):
            c = self.coeffs[i]
            y = y + _shift2d(c * x, -dx, -dy)
        return y.reshape(-1)

    def _ctprod(self, w):
        if not jnp.iscomplexobj(self.coeffs):
            return self._tprod(w)
        x = w.reshape(self._nx, self._ny)
        y = jnp.zeros_like(x)
        for i, (dx, dy) in enumerate(self._offsets):
            c = jnp.conj(self.coeffs[i])
            y = y + _shift2d(c * x, -dx, -dy)
        return y.reshape(-1)

    def apply_matrix(self, M, mode: str = "N"):
        return jax.vmap(lambda col: self.apply(col, mode), in_axes=1, out_axes=1)(M)

    def _name(self):
        return f"2-D stencil operator ({len(self._offsets)} points, {self._nx}x{self._ny})"


register_operator(Stencil2DOperator)


def opStencil2D(nx, ny, offsets, coeffs) -> Stencil2DOperator:
    return Stencil2DOperator(nx, ny, offsets, coeffs)
