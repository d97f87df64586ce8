"""golden/ — serial f64 scipy reference implementations (the oracle)."""
from .dense_lqr import (
    golden_are,
    golden_dre_sweep,
    golden_feedforward,
    golden_closed_loop,
    golden_closed_loop_cn,
    golden_closed_loop_cn_implicit,
    golden_closed_loop_implicit,
)
from .dae_reduce import nullspace_basis, reduce_dae, lift_gain, lift_x

__all__ = [
    "golden_are",
    "golden_dre_sweep",
    "golden_feedforward",
    "golden_closed_loop",
    "golden_closed_loop_cn",
    "golden_closed_loop_cn_implicit",
    "golden_closed_loop_implicit",
    "nullspace_basis",
    "reduce_dae",
    "lift_gain",
    "lift_x",
]
