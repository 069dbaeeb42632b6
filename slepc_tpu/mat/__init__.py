from .linop import (
    LinearOperator,
    DenseOperator,
    DIAOperator,
    AIJOperator,
    ShellOperator,
    IdentityOperator,
    DiagonalOperator,
    ScaledOperator,
    SumOperator,
    ProductOperator,
    AdjointOperator,
    aslinearoperator,
)
from .generators import (
    laplacian_1d,
    laplacian_2d,
    laplacian_3d,
    laplacian_1d_eigs,
    laplacian_2d_eigs,
    markov,
    from_scipy,
    from_dense,
    random_sparse,
)
from .structured import create_tile, create_bse, MatBSE
from . import petsc_io
