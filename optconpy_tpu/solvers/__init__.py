"""solvers/ — Krylov, saddle-point, shifted-system solvers."""
from .krylov import (
    SaddleShiftedKrylovCache,
    ShiftedKrylovCache,
    cg,
    fgmres,
    gmres,
)
from .matfree import SaddleMatfreeCache
from .saddle import (
    SaddleInverse,
    SaddleShiftedInverseCache,
    SaddleLU,
    SaddleShiftedLUCache,
    solve_sadpnt_scipy,
)
from .shifted import ShiftedInverseCache, ShiftedLUCache

__all__ = [
    "SaddleInverse",
    "SaddleLU",
    "SaddleMatfreeCache",
    "fgmres",
    "SaddleShiftedInverseCache",
    "SaddleShiftedKrylovCache",
    "SaddleShiftedLUCache",
    "ShiftedInverseCache",
    "ShiftedKrylovCache",
    "ShiftedLUCache",
    "cg",
    "gmres",
    "solve_sadpnt_scipy",
]
