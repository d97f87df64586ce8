"""mpc/ — closed-loop rollouts and receding-horizon control."""
from .nse_rollout import (
    NSEFusedCache,
    NSEMatfreeStepCache,
    NSEStepCache,
    batched_nse_closed_loop,
    batched_nse_closed_loop_fused,
    batched_nse_closed_loop_matfree,
    build_nse_fused,
    build_nse_step_cache,
    build_nse_stepper,
    build_nse_stepper_matfree,
    nse_closed_loop_rollout,
)
from .receding import RHConfig, receding_horizon_mpc
from .rollout import (
    batched_closed_loop,
    build_step_cache,
    build_step_cache_dae,
    closed_loop_rollout,
)

__all__ = [
    "RHConfig",
    "receding_horizon_mpc",
    "NSEFusedCache",
    "NSEMatfreeStepCache",
    "NSEStepCache",
    "batched_nse_closed_loop",
    "batched_nse_closed_loop_fused",
    "batched_nse_closed_loop_matfree",
    "build_nse_fused",
    "build_nse_step_cache",
    "build_nse_stepper",
    "build_nse_stepper_matfree",
    "build_step_cache",
    "build_step_cache_dae",
    "closed_loop_rollout",
    "batched_closed_loop",
    "nse_closed_loop_rollout",
]
