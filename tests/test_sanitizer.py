"""NaN-sanitizer CI mode (SURVEY.md SS5.2; VERDICT r1 item 5.2):
utils.setup(debug_nans=True) / OPTCONPY_DEBUG_NANS=1 turns every NaN
produced under jit into an immediate FloatingPointError at the
producing op.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu import utils


def test_debug_nans_mode_raises():
    utils.setup(debug_nans=True)
    try:

        @jax.jit
        def bad(x):
            return (x - x) / (x - x)  # 0/0 -> NaN

        with pytest.raises(FloatingPointError):
            np.asarray(bad(jnp.ones(4)))
    finally:
        utils.setup(debug_nans=False)

    # And sanitized mode off: NaNs flow through silently again.
    @jax.jit
    def bad2(x):
        return (x - x) / (x - x)

    assert np.isnan(np.asarray(bad2(jnp.ones(4)))).all()


def test_env_var_controls_mode(monkeypatch):
    monkeypatch.setenv("OPTCONPY_DEBUG_NANS", "1")
    utils.setup()
    assert jax.config.jax_debug_nans
    monkeypatch.delenv("OPTCONPY_DEBUG_NANS")
    utils.setup()
    assert not jax.config.jax_debug_nans
