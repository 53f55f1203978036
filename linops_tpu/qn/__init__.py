"""Quasi-Newton operators: limited-memory BFGS / SR1 and diagonal Hessian
approximations, all with device-resident functional state (SURVEY.md §2.3
"Device QN state")."""

from .lbfgs import LBFGSState, LBFGSOperator, InverseLBFGSOperator
from .lsr1 import LSR1State, LSR1Operator
from .diagonal import (
    DiagonalQNOperator,
    DiagonalPSB,
    DiagonalAndrei,
    SpectralGradient,
    DiagonalBFGS,
)
from .shifted_solve import solve_shifted_system, solve_shifted_systems, ldiv

__all__ = [
    "LBFGSState",
    "LBFGSOperator",
    "InverseLBFGSOperator",
    "LSR1State",
    "LSR1Operator",
    "DiagonalQNOperator",
    "DiagonalPSB",
    "DiagonalAndrei",
    "SpectralGradient",
    "DiagonalBFGS",
    "solve_shifted_system",
    "solve_shifted_systems",
    "ldiv",
]
