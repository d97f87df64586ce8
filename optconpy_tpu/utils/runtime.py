"""Runtime configuration for TPU execution.

VERIFIED ON HARDWARE (v5e, config-1 drive): with JAX's default matmul
precision, the f32 DRE sweep + closed loop lands ~2.8e-3 relative to
the f64 golden — failing the 1e-4 north-star bound — because TPU f32
matmuls default to bf16 multiplications. With 'highest' (3/6-pass f32
emulation on the MXU) the same run lands ~1.8e-5 at equal-or-better
wall clock for this workload (solve-dominated, small matrices). This is
SURVEY.md SS7 hard part 2's main mitigation; call setup() before any
jit on device.
"""
from __future__ import annotations

import os

import jax


def setup(
    matmul_precision: str = "highest",
    debug_nans: bool | None = None,
) -> None:
    """Configure JAX for the solver workload (idempotent).

    debug_nans: the CI sanitizer mode (SURVEY.md SS5.2) — every jitted
    computation re-checks for NaN outputs and raises FloatingPointError
    at the producing op (deoptimizes; never use for benchmarks). When
    None, the OPTCONPY_DEBUG_NANS env var ('1'/'true') decides, so CI
    can flip the whole suite to sanitized mode without code changes.
    """
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    if debug_nans is None:
        debug_nans = os.environ.get(
            "OPTCONPY_DEBUG_NANS", ""
        ).lower() in ("1", "true", "yes")
    jax.config.update("jax_debug_nans", bool(debug_nans))
    # Persistent compilation cache: the big solver graphs (DRE sweep,
    # batched rollouts) compile in minutes through the TPU tunnel but
    # hit this cache on every rerun (verified cross-process).
    cache_dir = os.environ.get(
        "OPTCONPY_TPU_XLA_CACHE",
        os.path.join(os.getcwd(), "data", "xla_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def effective_platform() -> str:
    """The platform kernels will actually run on: an explicitly pinned
    default DEVICE wins (the test harness pins CPU while the axon TPU
    plugin keeps default_backend() == 'tpu'); otherwise the default
    backend. THE single backend-sniffing helper — Pallas-vs-XLA
    dispatch sites must all agree (ADVICE/VERDICT r2 weak 8)."""
    dd = jax.config.jax_default_device
    return dd.platform if dd is not None else jax.default_backend()
