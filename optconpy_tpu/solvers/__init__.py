"""solvers/ — Krylov, saddle-point, shifted-system solvers."""
from .krylov import (
    SaddleShiftedKrylovCache,
    ShiftedKrylovCache,
    cg,
    gmres,
)
from .saddle import (
    SaddleInverse,
    SaddleLU,
    SaddleShiftedLUCache,
    solve_sadpnt_scipy,
)
from .shifted import ShiftedLUCache

__all__ = [
    "SaddleInverse",
    "SaddleLU",
    "SaddleShiftedKrylovCache",
    "SaddleShiftedLUCache",
    "ShiftedKrylovCache",
    "ShiftedLUCache",
    "cg",
    "gmres",
    "solve_sadpnt_scipy",
]
