"""Multi-device parallel kernels (explicit shard_map + collectives).

The default distribution path lets GSPMD choose collectives from sharding
annotations (sys/mesh.py).  This package holds the hand-scheduled
specializations where GSPMD's choice is suboptimal — e.g. the DIA SpMV,
where a shifted read of a row-sharded vector lowers to an all-gather of
the whole vector unless the halo exchange is written explicitly
(the role VecScatter plays in the reference's MPIAIJ MatMult,
PETSc src/mat/impls/aij/mpi/mmaij.c).
"""

from .halo import HaloDIAOperator, dia_spmm_halo, dia_spmv_halo
from .halo_pallas import (ShardedDIAPaddedOperator, ShardedGELLPaddedOperator,
                          dia_spmv_padded_sharded, hyb_spmv_padded_sharded)
from .tasks import batched_shifted_solves, make_task_mesh, thread_map

__all__ = ["dia_spmv_halo", "dia_spmm_halo", "HaloDIAOperator",
           "ShardedDIAPaddedOperator", "ShardedGELLPaddedOperator",
           "dia_spmv_padded_sharded", "hyb_spmv_padded_sharded",
           "batched_shifted_solves", "make_task_mesh", "thread_map"]
