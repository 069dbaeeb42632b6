"""slepc_tpu — a TPU-native sparse eigensolver framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of SLEPc
(the Scalable Library for Eigenvalue Problem Computations): linear
eigenproblems (EPS), singular values (SVD), polynomial (PEP) and general
nonlinear (NEP) eigenproblems, matrix functions (MFN), and linear matrix
equations (LME), together with the supporting algebra classes ST (spectral
transformations), BV (distributed basis vectors), DS (dense projected
solvers), FN (scalar/matrix functions) and RG (spectral regions).

Design stance (not a port):
  * single-controller SPMD — distributed vectors/bases are ``jax.Array``s
    sharded over a device-mesh axis ``"rows"``; XLA inserts the collectives
    (psum/all-gather/collective-permute) that the reference performs with
    explicit MPI (reference: src/sys/classes/bv/interface/bvblas.c allreduce
    sites).
  * the hot compute path (SpMV, orthogonalization, restart GEMM) is
    jit-compiled XLA with Pallas kernels where fusion needs help; the small
    ncv x ncv projected problem (DS) is solved redundantly on host, the SPMD
    analog of the reference's per-rank sequential LAPACK tier
    (reference: src/sys/classes/ds/).
  * double precision is on by default (scientific library semantics); set
    SLEPC_TPU_NO_X64=1 before import to keep 32-bit JAX defaults.
"""

import os as _os

if not _os.environ.get("SLEPC_TPU_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .sys.options import Options, set_global_options, get_global_options
from .sys.events import log_begin, log_view, log_reset, log_event
from .sys.sort import Which, SortCriterion
from .sys.mesh import (get_mesh, set_mesh, make_row_mesh, row_sharding,
                       replicated_sharding, device_put_rows, shard_operator)
from .parallel import HaloDIAOperator, dia_spmv_halo
from .mat.linop import (
    LinearOperator,
    DenseOperator,
    ShellOperator,
    AIJOperator,
    DIAOperator,
    IdentityOperator,
    aslinearoperator,
    norm_estimate_randomized,
)
from .mat.generators import (
    laplacian_1d,
    laplacian_2d,
    laplacian_3d,
    from_scipy,
    from_dense,
)
from .mat.structured import create_tile, create_bse, MatBSE
from .bv.bv import BV, OrthogType, OrthogRefine, OrthogBlockType
from .ds import (
    DS,
    DSHEP,
    DSNHEP,
    DSGHEP,
    DSGHIEP,
    DSGNHEP,
    DSNHEPTS,
    DSSVD,
    DSHSVD,
    DSGSVD,
    DSPEP,
    DSNEP,
)
from .fn import FN, FNExp, FNLog, FNSqrt, FNInvSqrt, FNPhi, FNRational, FNCombine, fn_from_name
from .rg import RG, RGEllipse, RGInterval, RGPolygon, RGRing
from .st import ST, STShift, STSinvert, STCayley, STPrecond, STFilter, STShell
from .ksp import KSP, solve_linear, DirectSolver
from .eps import EPS, EPSConvergedReason, ProblemType
from .svd import SVD
from .pep import PEP
from .nep import NEP
from .mfn import MFN
from .lme import LME

__all__ = [
    "Options",
    "set_global_options",
    "get_global_options",
    "Which",
    "SortCriterion",
    "get_mesh",
    "set_mesh",
    "make_row_mesh",
    "shard_operator",
    "HaloDIAOperator",
    "dia_spmv_halo",
    "row_sharding",
    "replicated_sharding",
    "device_put_rows",
    "LinearOperator",
    "DenseOperator",
    "ShellOperator",
    "AIJOperator",
    "DIAOperator",
    "IdentityOperator",
    "aslinearoperator",
    "laplacian_1d",
    "laplacian_2d",
    "laplacian_3d",
    "from_scipy",
    "from_dense",
    "create_tile",
    "create_bse",
    "MatBSE",
    "BV",
    "OrthogType",
    "OrthogRefine",
    "OrthogBlockType",
    "DS",
    "DSHEP",
    "DSNHEP",
    "DSGHEP",
    "DSGHIEP",
    "DSGNHEP",
    "DSNHEPTS",
    "DSSVD",
    "DSHSVD",
    "DSGSVD",
    "DSPEP",
    "DSNEP",
    "FN",
    "FNExp",
    "FNLog",
    "FNSqrt",
    "FNInvSqrt",
    "FNPhi",
    "FNRational",
    "FNCombine",
    "fn_from_name",
    "RG",
    "RGEllipse",
    "RGInterval",
    "RGPolygon",
    "RGRing",
    "ST",
    "STShift",
    "STSinvert",
    "STCayley",
    "STPrecond",
    "STFilter",
    "STShell",
    "KSP",
    "solve_linear",
    "DirectSolver",
    "EPS",
    "EPSConvergedReason",
    "ProblemType",
    "SVD",
    "PEP",
    "NEP",
    "MFN",
    "LME",
]
