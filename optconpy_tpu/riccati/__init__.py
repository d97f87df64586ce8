"""riccati/ — low-rank matrix-equation engine (SURVEY.md SS7 layer 4)."""
from .shifts import (
    spectral_interval,
    spectral_interval_dae,
    wachspress_shifts,
    cycled_shifts,
    dre_shifted_interval,
)
from .are import solve_are_stabilized
from .validate import dre_step_residual
from .bernoulli import stabilizing_gain_dae, stabilizing_gain_reduced
from .lyap_adi import lowrank_adi, lowrank_adi_hostloop, lyap_residual_norm
from .newton_kleinman import (
    gain_from_factor,
    newton_adi_are,
    newton_adi_are_host,
)
from .dre import (
    dre_shift_schedule,
    dre_shift_schedule_dae,
    build_dre_cache,
    build_dre_cache_dae,
    build_dre_cache_dae_krylov,
    build_dre_cache_dae_matfree,
    build_dre_cache_dae_ns,
    load_or_build_inverse_stack,
    dre_backward_sweep,
)

__all__ = [
    "spectral_interval",
    "spectral_interval_dae",
    "dre_shift_schedule_dae",
    "build_dre_cache_dae",
    "build_dre_cache_dae_krylov",
    "build_dre_cache_dae_matfree",
    "build_dre_cache_dae_ns",
    "load_or_build_inverse_stack",
    "wachspress_shifts",
    "cycled_shifts",
    "dre_shifted_interval",
    "lowrank_adi",
    "lowrank_adi_hostloop",
    "lyap_residual_norm",
    "solve_are_stabilized",
    "dre_step_residual",
    "stabilizing_gain_dae",
    "stabilizing_gain_reduced",
    "newton_adi_are",
    "newton_adi_are_host",
    "gain_from_factor",
    "dre_shift_schedule",
    "build_dre_cache",
    "dre_backward_sweep",
]
