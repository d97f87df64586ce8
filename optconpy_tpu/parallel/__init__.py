"""parallel/ — device mesh, GSPMD shardings, shard_map'ed MPC."""
from .mesh import scenario_mesh, shard_scenarios, replicate, init_multihost
from .sharded_mpc import sharded_closed_loop

__all__ = [
    "scenario_mesh",
    "shard_scenarios",
    "replicate",
    "init_multihost",
    "sharded_closed_loop",
]
