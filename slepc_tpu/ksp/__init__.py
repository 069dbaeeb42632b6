from .ksp import KSP, solve_linear
from .direct import DirectSolver, tridiag_inertia, banded_ldlt_inertia

__all__ = ["KSP", "solve_linear", "DirectSolver", "tridiag_inertia", "banded_ldlt_inertia"]
