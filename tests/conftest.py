"""Test harness config: CPU-only, 8 virtual devices, x64 enabled.

Per SURVEY.md SS4: tests are residual-based mathematical oracles against
dense scipy solutions, run on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware. Benchmarks (bench.py) run on
the real chip; tests never do.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# NOTE: this environment's TPU plugin ('axon') ignores JAX_PLATFORMS=cpu
# and stays the default backend; pin the default DEVICE instead so all
# test computation runs on the 8-virtual-device f64-capable host CPU.
jax.config.update("jax_default_device", jax.devices("cpu")[0])
