"""control/ — LQR gains, feedback + feedforward (SURVEY.md SS7 layer 5)."""
from .lqr import (
    build_costate_cache,
    build_costate_cache_dae,
    feedforward_sweep,
    control_input,
)

__all__ = [
    "build_costate_cache",
    "build_costate_cache_dae",
    "feedforward_sweep",
    "control_input",
]
