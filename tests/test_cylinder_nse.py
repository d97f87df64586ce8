"""Cylinder-wake NSE pipeline: steady physics, IMEX stability, convection
linearization (acceptance configs 3-4 substrate, BASELINE.md).

Residual-based oracles per SURVEY.md SS4; runs on CPU/f64 (conftest).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.fem.device_conv import ConvKernel
from optconpy_tpu.fem.taylor_hood import convection_matrices
from optconpy_tpu.models.cylinder import CX, CY, HEIGHT, RADIUS, cylinder_setup
from optconpy_tpu.mpc import build_nse_stepper, nse_closed_loop_rollout

RE = 60.0
DT = 0.01
NTS = 32


@pytest.fixture(scope="module")
def cyl():
    return cylinder_setup(re=RE, refinement=1)


def test_steady_wake_physics(cyl):
    """The steady state is a converged, physically-oriented wake."""
    np_ops, sys, cond = cyl
    assert np_ops["steady_info"]["residual"] < 1e-10

    space = np_ops["space"]
    xy = space.dof_coords()
    v_full = np_ops["vbar_full"]
    ns = space.n_scalar

    def ux_at(x0, y0=CY):
        return v_full[np.argmin((xy[:, 0] - x0) ** 2 + (xy[:, 1] - y0) ** 2)]

    # Recirculation bubble DOWNSTREAM of the cylinder (not upstream):
    assert ux_at(CX + 2.2 * RADIUS) < -0.05
    # Far wake recovers toward the mean flow:
    assert ux_at(1.8) > 0.5
    # Upstream of the cylinder the flow moves right:
    assert ux_at(0.08) > 0.5
    # Inflow BC is the parabolic profile:
    on_in = xy[:, 0] < 1e-9
    u_in = v_full[:ns][on_in]
    y_in = xy[on_in, 1]
    np.testing.assert_allclose(
        u_in, 4.0 * 1.5 * y_in * (HEIGHT - y_in) / HEIGHT**2, atol=1e-12
    )


def test_oseen_imex_fixed_point(cyl):
    """The steady state is a fixed point of the Oseen-IMEX step."""
    np_ops, sys64, cond = cyl
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    cache = build_nse_stepper(np_ops, cond, DT, dtype=jnp.float64)
    n, m = sys.b.shape
    ks = jnp.zeros((NTS + 1, m, n))
    ws = jnp.zeros((NTS + 1, n))
    vs, us, ys = nse_closed_loop_rollout(
        sys, conv, cache, ks, ws, cache.vbar, 1e-2, DT
    )
    drift = np.abs(np.asarray(vs) - np.asarray(cache.vbar)).max()
    assert drift < 1e-9


def test_explicit_scheme_matches_oseen_from_steady(cyl):
    """Both IMEX schemes hold the steady state (scheme-independent
    fixed point) — catches BC bookkeeping errors in either block."""
    np_ops, sys64, cond = cyl
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    n, m = sys.b.shape
    ks = jnp.zeros((2, m, n))
    ws = jnp.zeros((2, n))
    for scheme in ("explicit", "oseen"):
        cache = build_nse_stepper(
            np_ops, cond, 1e-3, dtype=jnp.float64, scheme=scheme
        )
        vs, _, _ = nse_closed_loop_rollout(
            sys, conv, cache, ks, ws, cache.vbar, 1e-2, 1e-3
        )
        drift = np.abs(np.asarray(vs[1]) - np.asarray(cache.vbar)).max()
        assert drift < 1e-10, scheme


def test_convection_linearization_consistency(cyl):
    """d/de N(v+e d)(v+e d)|_0 = (L1(v) + L2(v)) d — the device conv
    kernel and the host linearized matrices agree to O(e)."""
    np_ops, sys64, cond = cyl
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    vbar_full = np_ops["vbar_full"]
    vbar_i = cond.restrict(vbar_full)
    l1, l2 = convection_matrices(np_ops["full"], vbar_full)
    rng = np.random.default_rng(3)
    d_i = rng.standard_normal(len(vbar_i))
    d_full = np.zeros(len(vbar_full))
    d_full[cond.free] = d_i
    eps = 1e-6
    c0 = np.asarray(conv.conv_inner(jnp.asarray(vbar_i)))
    c1 = np.asarray(conv.conv_inner(jnp.asarray(vbar_i + eps * d_i)))
    fd = (c1 - c0) / eps
    lin = ((l1 + l2) @ d_full)[cond.free]
    np.testing.assert_allclose(fd, lin, rtol=0, atol=1e-4 * np.abs(lin).max())


def test_wake_is_unstable_and_perturbation_grows(cyl):
    """Re=60 > Re_crit~46: an uncontrolled perturbation must NOT decay
    to zero — this is what makes feedback worthwhile (SURVEY.md SS1)."""
    np_ops, sys64, cond = cyl
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    cache = build_nse_stepper(np_ops, cond, 0.02, dtype=jnp.float64)
    n, m = sys.b.shape
    nts = 50
    ks = jnp.zeros((nts + 1, m, n))
    ws = jnp.zeros((nts + 1, n))
    rng = np.random.default_rng(0)
    v0 = np.asarray(cache.vbar) + 1e-4 * rng.standard_normal(n)
    vs, _, _ = nse_closed_loop_rollout(
        sys, conv, cache, ks, ws, jnp.asarray(v0), 1e-2, 0.02
    )
    d = np.linalg.norm(np.asarray(vs) - np.asarray(cache.vbar), axis=1)
    # Perturbation does not blow up numerically over the horizon ...
    assert np.isfinite(d).all()
    # ... but (physical instability or at worst slow decay) it has not
    # died off either: the transient remains within two orders.
    assert d[-1] > 1e-2 * d[0]
