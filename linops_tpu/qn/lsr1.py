"""Limited-memory SR1 operator with device-resident ring-buffer state.

TPU-native redesign of the reference L-SR1 operator (reference:
src/lsr1.jl). The forward product ``B v = v/γ + Σ aᵢ(aᵢᵀv)/⟨aᵢ,sᵢ⟩``
(reference src/lsr1.jl:89-107) is two batched ``(mem, n)`` mat-vecs; the
O(mem²·n) rank-1-term recomputation on push (src/lsr1.jl:166-181) is ``mem``
steps of batched mat-vecs over the chronologically-gathered memory, exactly
like the L-BFGS forward form.

Semantics preserved: the three-part update acceptance test — well-definedness
``|⟨y−Bs, s⟩| ≥ ε(1 + ‖y−Bs‖‖s‖)``, sufficient curvature, and the scaling
condition (reference src/lsr1.jl:119-149) — plus ``diag`` (src/lsr1.jl:196-211)
and ``reset`` (src/lsr1.jl:217-240).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.base import LinearOperator, LinearOperatorException, register_operator

__all__ = ["LSR1State", "LSR1Operator"]


class LSR1State(NamedTuple):
    """Device pytree holding the L-SR1 memory (reference LSR1Data,
    src/lsr1.jl:4-17). Ring indices are 0-based."""

    S: jax.Array  # (mem, n)
    Y: jax.Array  # (mem, n)
    ys: jax.Array  # (mem,)  curvature; 0 marks an empty slot
    A: jax.Array  # (mem, n) rank-1 vectors aᵢ = yᵢ − B₍ᵢ₋₁₎sᵢ
    as_: jax.Array  # (mem,)  ⟨aᵢ, sᵢ⟩
    gamma: jax.Array  # () scaling factor
    insert: jax.Array  # () int32, 0-based
    opnorm_ub: jax.Array  # () upper bound on ‖B‖₂


def _init_state(n: int, mem: int, dtype) -> LSR1State:
    return LSR1State(
        S=jnp.zeros((mem, n), dtype),
        Y=jnp.zeros((mem, n), dtype),
        ys=jnp.zeros((mem,), dtype),
        A=jnp.zeros((mem, n), dtype),
        as_=jnp.zeros((mem,), dtype),
        gamma=jnp.ones((), dtype),
        insert=jnp.zeros((), jnp.int32),
        opnorm_ub=jnp.ones((), dtype),
    )


def _safe_div(num, den):
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)


def lsr1_apply(state: LSR1State, x):
    """B v = v/γ + Aᵀ((A v)/as) with empty/degenerate slots masked out
    (reference src/lsr1.jl:89-107)."""
    coef = jnp.where(state.ys != 0, _safe_div(state.A @ x, state.as_), 0.0)
    return x / state.gamma + state.A.T @ coef


def lsr1_apply_matrix(state: LSR1State, X):
    coef = jnp.where((state.ys != 0)[:, None], _safe_div(state.A @ X, state.as_[:, None]), 0.0)
    return X / state.gamma + state.A.T @ coef


def lsr1_diag(state: LSR1State):
    """diag(B) = 1/γ + Σ aᵢ²/⟨aᵢ,sᵢ⟩ (reference src/lsr1.jl:196-211)."""
    coef = jnp.where(state.ys != 0, _safe_div(jnp.ones_like(state.as_), state.as_), 0.0)
    return 1.0 / state.gamma + coef @ (state.A**2)


@functools.partial(jax.jit, static_argnames=("scaling",))
def _push(state: LSR1State, s, y, *, scaling: bool) -> LSR1State:
    """Guarded SR1 push (reference push!, src/lsr1.jl:119-184)."""
    mem, _ = state.S.shape
    eps = jnp.finfo(state.S.dtype).eps

    ymBs = y - lsr1_apply(state, s)
    ys = jnp.dot(y, s)
    s_norm = jnp.linalg.norm(s)
    yy = jnp.dot(y, y)

    well_defined = jnp.abs(jnp.dot(ymBs, s)) >= eps + eps * jnp.linalg.norm(ymBs) * s_norm
    if scaling:
        y_norm = jnp.sqrt(yy)
        sufficient_curvature = jnp.abs(ys) >= eps * y_norm * s_norm
        gamma_new = _safe_div(ys, yy)
        resid = jnp.linalg.norm(y - _safe_div(s, gamma_new))
        scaling_condition = resid >= eps * y_norm * s_norm
        accept = well_defined & sufficient_curvature & scaling_condition
    else:
        gamma_new = state.gamma
        accept = well_defined

    ins = state.insert
    S = state.S.at[ins].set(s)
    Y = state.Y.at[ins].set(y)
    ysv = state.ys.at[ins].set(ys)
    gamma = gamma_new if scaling else state.gamma
    insert_new = jnp.mod(ins + 1, mem).astype(jnp.int32)

    # Recompute every rank-1 term in chronological order (oldest → newest;
    # reference src/lsr1.jl:166-181). Inner corrections batched as mat-vecs.
    order = jnp.mod(insert_new + jnp.arange(mem), mem)
    S_ord = S[order]
    Y_ord = Y[order]
    valid = ysv[order] != 0
    idx = jnp.arange(mem)

    def body(i, carry):
        A_ord, as_ord = carry
        s_i = S_ord[i]
        a = Y_ord[i] - s_i / gamma
        mask = (idx < i) & valid
        coef = jnp.where(mask, _safe_div(A_ord @ s_i, as_ord), 0.0)
        a = a - A_ord.T @ coef
        a = jnp.where(valid[i], a, jnp.zeros_like(a))
        return A_ord.at[i].set(a), as_ord.at[i].set(jnp.dot(a, s_i))

    A_ord, as_ord = lax.fori_loop(
        0, mem, body, (jnp.zeros_like(S_ord), jnp.zeros_like(ysv))
    )
    A_new = jnp.zeros_like(A_ord).at[order].set(A_ord)
    as_new = jnp.zeros_like(as_ord).at[order].set(as_ord)

    # opnorm bound rebuilt from scratch each push (reference src/lsr1.jl:156-179)
    ub = jnp.where(
        scaling & (gamma != 0), 1.0 / jnp.abs(jnp.where(gamma != 0, gamma, 1.0)), 1.0
    )
    contrib = jnp.where(
        (ysv[order] != 0) & (as_ord != 0),
        _safe_div(jnp.sum(A_ord**2, axis=1), jnp.abs(as_ord)),
        0.0,
    )
    ub = ub + jnp.sum(contrib)

    new = LSR1State(S=S, Y=Y, ys=ysv, A=A_new, as_=as_new, gamma=gamma,
                    insert=insert_new, opnorm_ub=ub)
    return jax.tree.map(lambda a, b: jnp.where(accept, a, b), new, state)


class LSR1Operator(LinearOperator):
    """Limited-memory SR1 approximation, forward form only (reference
    src/lsr1.jl:39-113). Symmetric but generally indefinite; no transpose
    products needed (symmetry infers them)."""

    _fields_children = ("state",)
    _fields_aux = ("_n", "_mem", "_scaling", "_dtype_name")

    def __init__(self, *args, mem: int = 5, scaling: bool = False, dtype=None):
        super().__init__()
        if len(args) == 2:
            dt, n = args
            dt = jax.dtypes.canonicalize_dtype(dt)
        elif len(args) == 1:
            dt, n = (dtype if dtype is not None else jnp.float64), args[0]
            dt = jax.dtypes.canonicalize_dtype(dt)
        else:
            raise TypeError("LSR1Operator(n) or LSR1Operator(dtype, n)")
        if jnp.issubdtype(jnp.dtype(dt), jnp.complexfloating):
            raise LinearOperatorException(
                "complex L-SR1 is not supported: the acceptance tests assume "
                "real inner products"
            )
        self._n = int(n)
        self._mem = max(int(mem), 1)
        self._scaling = bool(scaling)
        self._dtype_name = jnp.dtype(dt).name
        self.state = _init_state(self._n, self._mem, jnp.dtype(dt))

    @property
    def nrow(self):
        return self._n

    @property
    def ncol(self):
        return self._n

    @property
    def dtype(self):
        return jnp.dtype(self._dtype_name)

    @property
    def symmetric(self):
        return True

    @property
    def hermitian(self):
        return True

    @property
    def mem(self):
        return self._mem

    @property
    def scaling(self):
        return self._scaling

    @property
    def insert(self) -> int:
        return int(self.state.insert)

    @property
    def scaling_factor(self) -> float:
        return float(self.state.gamma)

    @property
    def opnorm_upper_bound(self) -> float:
        return float(self.state.opnorm_ub)

    def _prod(self, v):
        return lsr1_apply(self.state, v)

    def apply_matrix(self, M, mode: str = "N"):
        return lsr1_apply_matrix(self.state, M)

    def push(self, s, y):
        """Guarded SR1 insert (reference push!, src/lsr1.jl:115-184).
        Silently rejects updates failing the well-definedness / curvature /
        scaling conditions."""
        dt = self.dtype
        self.state = _push(self.state, jnp.asarray(s, dt), jnp.asarray(y, dt),
                           scaling=self._scaling)
        return self

    def diag(self):
        return lsr1_diag(self.state)

    def reset(self):
        """reference reset! (src/lsr1.jl:213-240)."""
        self.state = _init_state(self._n, self._mem, self.dtype)
        self.reset_counters()
        return self

    def _name(self):
        return "LSR1 operator"


register_operator(LSR1Operator)
