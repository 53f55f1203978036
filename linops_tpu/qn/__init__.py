"""Quasi-Newton operators: limited-memory BFGS / SR1 and diagonal Hessian
approximations, all with device-resident functional state (SURVEY.md §2.3
"Device QN state")."""

from .lbfgs import LBFGSState, LBFGSOperator, InverseLBFGSOperator
from .lsr1 import LSR1State, LSR1Operator

__all__ = [
    "LBFGSState",
    "LBFGSOperator",
    "InverseLBFGSOperator",
    "LSR1State",
    "LSR1Operator",
]
