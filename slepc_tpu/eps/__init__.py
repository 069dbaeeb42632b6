from .base import EPS, EPSConvergedReason, EPSSolver, ProblemType, EPSError
from . import krylovschur  # registers "krylovschur"

__all__ = ["EPS", "EPSConvergedReason", "EPSSolver", "ProblemType", "EPSError"]
