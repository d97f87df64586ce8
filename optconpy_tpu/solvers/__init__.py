"""solvers/ — Krylov, saddle-point, shifted-system solvers."""
from .krylov import (
    SaddleShiftedKrylovCache,
    ShiftedKrylovCache,
    cg,
    gmres,
)
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
