"""Round-2 driver-surface additions: heat1d through optcon_nse (config 1
via the L5 driver, not just unit tests), the Leray-regularized
observation operator (SURVEY.md SS2 row 4 get_regularized_c parity),
cache-key code salting, and the fused-cache dt guard.
"""
import numpy as np
import pytest

from optconpy_tpu.optcont import optcon_nse
from optconpy_tpu.utils import (
    CostConfig,
    OptConConfig,
    ProblemConfig,
    SolverConfig,
    TimeConfig,
)

HEAT_CFG = OptConConfig(
    problem=ProblemConfig(name="heat1d", n_dof=64),
    time=TimeConfig(t0=0.0, t_end=1.0, nts=50),
    cost=CostConfig(alpha=1e-2, ystar="zero"),
    solver=SolverConfig(
        num_shifts=8, n_adi=20, n_newton=3, r_max=30, dtype="float64",
        feedback="explicit",
    ),
)


def test_heat1d_through_driver(tmp_path):
    """Config 1 runs end-to-end through the L5 driver (optcon_nse),
    regulating the bump initial state toward zero output."""
    res = optcon_nse(HEAT_CFG, cache_dir=str(tmp_path))
    assert np.isfinite(res.ys).all() and np.isfinite(res.us).all()
    # Controlled regulation beats the uncontrolled plant.
    res0 = optcon_nse(
        HEAT_CFG, cache_dir=str(tmp_path), controlled=False
    )
    assert res.cost < res0.cost
    # And the output decays: the terminal |y| is far below the initial.
    y0 = np.abs(res.ys[0, 0]).max()
    yT = np.abs(res.ys[0, -1]).max()
    assert yT < 0.2 * y0


def test_cache_salt_in_artifact_names(tmp_path):
    from optconpy_tpu import __version__
    from optconpy_tpu.utils.cache import load_or_comp

    calls = []

    def compute():
        calls.append(1)
        return {"x": np.arange(3.0)}

    load_or_comp("k", "art", compute, cache_dir=str(tmp_path))
    salt = "v" + __version__.replace(".", "_")
    assert (tmp_path / f"k-{salt}__art.npz").exists()
    # Same key+version hits the cache; a different version would miss.
    load_or_comp("k", "art", compute, cache_dir=str(tmp_path))
    assert len(calls) == 1


def test_regularized_c_leray_properties():
    """C~ = C Pi: agrees with C on ker J, kills M^-1 J^T range, and is
    idempotent under regularization (Pi^2 = Pi)."""
    from optconpy_tpu.fem.contobs import get_regularized_c
    from optconpy_tpu.models.cavity import cavity_stokes_setup

    np_ops, _, _ = cavity_stokes_setup(nx=5)
    m_sp, j_sp, c = np_ops["M"], np_ops["J"], np_ops["C"]
    n = m_sp.shape[0]
    creg = get_regularized_c(c, m_sp, j_sp)
    assert creg.shape == c.shape

    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(0)
    # w in ker J: project a random vector with the (dense small-n) Leray
    # projector applied via the saddle identity.
    from optconpy_tpu.solvers.saddle import solve_sadpnt_scipy

    r = rng.standard_normal(n)
    w, _ = solve_sadpnt_scipy(m_sp, j_sp, m_sp @ r)  # w = Pi r in ker J
    assert np.abs(j_sp @ w).max() < 1e-9
    np.testing.assert_allclose(creg @ w, c @ w, rtol=1e-9, atol=1e-12)

    # Range of M^-1 J^T is annihilated.
    q = rng.standard_normal(j_sp.shape[0])
    v_bad = spla.spsolve(m_sp.tocsc(), j_sp.T @ q)
    assert np.abs(creg @ v_bad).max() < 1e-9 * max(
        1.0, np.abs(c @ v_bad).max()
    )

    # Idempotence: regularizing C~ again is a no-op.
    creg2 = get_regularized_c(creg, m_sp, j_sp)
    np.testing.assert_allclose(creg2, creg, rtol=1e-9, atol=1e-13)


def test_fused_cache_dt_guard():
    import jax.numpy as jnp

    from optconpy_tpu.fem.device_conv import ConvKernel
    from optconpy_tpu.models.cavity import cavity_stokes_setup
    from optconpy_tpu.mpc.nse_rollout import (
        batched_nse_closed_loop,
        build_nse_fused,
    )
    from optconpy_tpu.solvers.steady import solve_steady_nse_host

    np_ops, sys64, cond = cavity_stokes_setup(nx=4)
    np_ops["vbar_full"], _ = solve_steady_nse_host(np_ops["full"], cond)
    dt = 0.02
    fused = build_nse_fused(np_ops, cond, dt, dtype=jnp.float64)
    assert fused.dt == dt
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    sys = sys64.astype(jnp.float64)
    n, m = sys.b.shape
    ks = jnp.zeros((3, m, n))
    ws = jnp.zeros((3, n))
    v0 = jnp.asarray(fused.vbar)[None]
    with pytest.raises(ValueError, match="dt"):
        batched_nse_closed_loop(
            sys, conv, fused, ks, ws, v0, 1e-2, dt * 2
        )
    # Matching dt passes.
    vs, us, ys = batched_nse_closed_loop(
        sys, conv, fused, ks, ws, v0, 1e-2, dt
    )
    assert np.isfinite(np.asarray(ys)).all()
