"""solvers/ — Krylov, saddle-point, shifted-system solvers."""
from .shifted import ShiftedLUCache
from .saddle import SaddleLU, SaddleShiftedLUCache, solve_sadpnt_scipy

__all__ = [
    "ShiftedLUCache",
    "SaddleLU",
    "SaddleShiftedLUCache",
    "solve_sadpnt_scipy",
]
