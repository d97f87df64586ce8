"""mpc/ — closed-loop rollouts and receding-horizon control."""
from .rollout import (
    build_step_cache,
    build_step_cache_dae,
    closed_loop_rollout,
    batched_closed_loop,
)

__all__ = [
    "build_step_cache",
    "build_step_cache_dae",
    "closed_loop_rollout",
    "batched_closed_loop",
]
