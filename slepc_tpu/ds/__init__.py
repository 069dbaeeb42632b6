from .types import (
    DS,
    DSHEP,
    DSNHEP,
    DSNHEPTS,
    DSGHEP,
    DSGHIEP,
    DSGNHEP,
    DSSVD,
    DSHSVD,
    DSGSVD,
    DSPEP,
    DSNEP,
)
from . import schur

__all__ = [
    "DS",
    "DSHEP",
    "DSNHEP",
    "DSNHEPTS",
    "DSGHEP",
    "DSGHIEP",
    "DSGNHEP",
    "DSSVD",
    "DSHSVD",
    "DSGSVD",
    "DSPEP",
    "DSNEP",
    "schur",
]
