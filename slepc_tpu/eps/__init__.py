from .base import EPS, EPSConvergedReason, EPSSolver, ProblemType, EPSError
from . import krylovschur  # registers "krylovschur"
from . import power  # "power"
from . import subspace  # "subspace"
from . import explicit  # "arnoldi", "lanczos"
from . import lobpcg  # "lobpcg"
from . import rqcg  # "rqcg"
from . import davidson  # "gd", "jd"
from . import lapack  # "lapack"
from . import ciss  # "ciss"
from . import lyapii  # "lyapii"
from . import bse  # "bse" (also dispatched from krylovschur)

__all__ = ["EPS", "EPSConvergedReason", "EPSSolver", "ProblemType", "EPSError"]
