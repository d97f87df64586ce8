"""ops/ — array substrate (SURVEY.md SS7 layer 1)."""
from .sparse import ELL, ell_from_scipy, ell_to_scipy
from .lowrank import (
    tsqr,
    tsqr_cholqr2,
    compress,
    append_columns,
    lowrank_matvec,
    smw_solve,
)
from .dense import LUSolver, CholeskySolver

__all__ = [
    "ELL",
    "ell_from_scipy",
    "ell_to_scipy",
    "tsqr",
    "tsqr_cholqr2",
    "compress",
    "append_columns",
    "lowrank_matvec",
    "smw_solve",
    "LUSolver",
    "CholeskySolver",
]
