"""parallel/ — device mesh, GSPMD shardings, shard_map'ed MPC."""
from .mesh import init_multihost, replicate, scenario_mesh, shard_scenarios
from .param_sweep import (
    assign_re_buckets,
    build_sweep_gains_and_caches,
    sharded_sweep_rollout,
    sweep_rollout,
)
from .sharded_mpc import sharded_closed_loop, sharded_nse_rollout

__all__ = [
    "assign_re_buckets",
    "build_sweep_gains_and_caches",
    "init_multihost",
    "replicate",
    "scenario_mesh",
    "shard_scenarios",
    "sharded_closed_loop",
    "sharded_nse_rollout",
    "sharded_sweep_rollout",
    "sweep_rollout",
]
