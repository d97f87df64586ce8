"""solvers/ — Krylov, saddle-point, shifted-system solvers."""
from .shifted import ShiftedLUCache

__all__ = ["ShiftedLUCache"]
