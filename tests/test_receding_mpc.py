"""Receding-horizon MPC (config 4 structure) + device re-linearization.

Runs on the cavity (small, CPU-f64-feasible); the cylinder-scale run is
scripts/config3_cylinder.py / bench.py territory.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.fem.device_conv import ConvKernel
from optconpy_tpu.fem.taylor_hood import convection_matrices
from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.mpc import RHConfig, receding_horizon_mpc
from optconpy_tpu.riccati import (
    cycled_shifts,
    dre_shift_schedule_dae,
)
from optconpy_tpu.solvers.steady import solve_steady_nse_host


@pytest.fixture(scope="module")
def cavity():
    np_ops, sys, cond = cavity_stokes_setup(nx=6)
    # True steady NSE state: the nonlinear plant's fixed point, so
    # regulation distances below measure decay to the real equilibrium.
    np_ops["vbar_full"], _ = solve_steady_nse_host(np_ops["full"], cond)
    return np_ops, sys, cond


def test_linearized_dense_matches_host(cavity):
    """Device re-linearization == host convection_matrices (L1, L1+L2)."""
    np_ops, sys, cond = cavity
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    v_full = np_ops["vbar_full"]
    l1_h, l2_h = convection_matrices(np_ops["full"], v_full)
    l1_d = np.asarray(
        conv.linearized_dense(jnp.asarray(v_full), include_l2=False)
    )
    np.testing.assert_allclose(l1_d, l1_h.toarray(), atol=1e-12)
    l12_d = np.asarray(
        conv.linearized_dense(jnp.asarray(v_full), include_l2=True)
    )
    np.testing.assert_allclose(
        l12_d, (l1_h + l2_h).toarray(), atol=1e-12
    )


def test_receding_horizon_regulates(cavity):
    """MPC loop drives perturbed scenarios back toward the steady state
    faster than the open-loop plant; all quantities finite."""
    np_ops, sys64, cond = cavity
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    cfg = RHConfig(horizon=8, apply=4, dt=0.02, alpha=1e-8, r_max=24)
    sig, sigma_seq, idx_seq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], cfg.dt,
        num_shifts=8, n_adi=16,
    )
    rng = np.random.default_rng(0)
    n = sys.n
    vbar = cond.restrict(np_ops["vbar_full"])
    v0 = jnp.asarray(
        vbar[None] + 1e-2 * rng.standard_normal((4, n))
    )
    out = receding_horizon_mpc(
        sys, conv, np_ops, cond, cfg, sig, sigma_seq, idx_seq,
        v0, n_macro=3,
    )
    vs = np.asarray(out["vs"])
    assert np.isfinite(vs).all()
    assert vs.shape[1] == 3 * cfg.apply + 1
    d0 = np.linalg.norm(vs[:, 0] - vbar[None], axis=1).mean()
    dT = np.linalg.norm(vs[:, -1] - vbar[None], axis=1).mean()
    # Stokes cavity decays by itself; MPC must do at least clearly
    # better than the open-loop decay over the same window.
    cfg0 = RHConfig(
        horizon=8, apply=4, dt=0.02, alpha=1e-8, r_max=24, n_newton=0
    )
    out0 = receding_horizon_mpc(
        sys, conv, np_ops, cond, cfg0, sig, sigma_seq, idx_seq,
        v0, n_macro=3,
    )
    vs0 = np.asarray(out0["vs"])
    dT0 = np.linalg.norm(vs0[:, -1] - vbar[None], axis=1).mean()
    assert dT < dT0
    assert dT < d0


def test_warm_start_reduces_newton_need(cavity):
    """With k_init warm start, a 1-Newton DRE reaches (nearly) the same
    gain as 3-Newton from scratch — the warm-start contract the MPC
    loop relies on."""
    import jax

    np_ops, sys64, cond = cavity
    sys = sys64.astype(jnp.float64)
    from optconpy_tpu.riccati import (
        build_dre_cache_dae,
        dre_backward_sweep,
    )

    dt, alpha, nts = 0.02, 1e-8, 8
    sig, sigma_seq, idx_seq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], dt, num_shifts=8, n_adi=16
    )
    cache = build_dre_cache_dae(sys, dt, sig)
    args = (sys, cache, alpha, dt, nts,
            jnp.asarray(sigma_seq), jnp.asarray(idx_seq))
    _, ks_ref = dre_backward_sweep(*args, n_newton=3, r_max=24)
    k_ref = np.asarray(ks_ref[0])
    _, ks_warm = dre_backward_sweep(
        *args, n_newton=1, r_max=24, k_init=jnp.asarray(k_ref)
    )
    k_warm = np.asarray(ks_warm[0])
    rel = np.linalg.norm(k_warm - k_ref) / np.linalg.norm(k_ref)
    assert rel < 5e-2, rel


def test_receding_checkpoint_resume(cavity, tmp_path):
    """Per-macro-step checkpointing (SURVEY.md SS5.3): a run killed
    after 2 of 3 macro steps resumes from the checkpoint and reaches
    the same final state as the uninterrupted run."""
    np_ops, sys64, cond = cavity
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    cfg = RHConfig(horizon=6, apply=3, dt=0.02, alpha=1e-6, r_max=24)
    sig, sigma_seq, idx_seq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], cfg.dt,
        num_shifts=6, n_adi=12,
    )
    rng = np.random.default_rng(3)
    vbar = cond.restrict(np_ops["vbar_full"])
    v0 = jnp.asarray(vbar[None] + 1e-2 * rng.standard_normal((2, sys.n)))
    args = (sys, conv, np_ops, cond, cfg, sig, sigma_seq, idx_seq, v0)

    ref = receding_horizon_mpc(*args, n_macro=3)
    ckpt = str(tmp_path / "mpc_state.npz")
    part = receding_horizon_mpc(*args, n_macro=2, checkpoint=ckpt)
    assert part["resumed_from"] == 0
    resumed = receding_horizon_mpc(*args, n_macro=3, checkpoint=ckpt)
    assert resumed["resumed_from"] == 2
    np.testing.assert_allclose(
        np.asarray(resumed["v_final"]), np.asarray(ref["v_final"]),
        rtol=0, atol=1e-12,
    )
    # Fully-completed checkpoint: nothing left to do, state preserved.
    again = receding_horizon_mpc(*args, n_macro=3, checkpoint=ckpt)
    assert again["resumed_from"] == 3
    np.testing.assert_allclose(
        np.asarray(again["v_final"]), np.asarray(ref["v_final"]),
        rtol=0, atol=1e-12,
    )


def test_receding_matfree_matches_lu(cavity):
    """The matrix-free macro loop (sparse host re-linearization +
    SaddleMatfreeCache rebuilds) reproduces the dense-LU macro loop's
    trajectories and gains — a strong oracle for the config-4 path."""
    np_ops, sys64, cond = cavity
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    base = dict(horizon=6, apply=3, dt=0.02, alpha=1e-6, r_max=24)
    cfg_lu = RHConfig(**base, solver="lu")
    cfg_mf = RHConfig(
        **base, solver="matfree", kind="ell",
        fgmres_tol=1e-11, fgmres_cycles=12,
    )
    sig, sigma_seq, idx_seq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], base["dt"],
        num_shifts=6, n_adi=12,
    )
    rng = np.random.default_rng(1)
    vbar = cond.restrict(np_ops["vbar_full"])
    v0 = jnp.asarray(vbar[None] + 1e-2 * rng.standard_normal((3, sys.n)))
    out_lu = receding_horizon_mpc(
        sys, conv, np_ops, cond, cfg_lu, sig, sigma_seq, idx_seq,
        v0, n_macro=2,
    )
    out_mf = receding_horizon_mpc(
        sys, conv, np_ops, cond, cfg_mf, sig, sigma_seq, idx_seq,
        v0, n_macro=2,
    )
    for key in ("vs", "us", "ks"):
        a = np.asarray(out_lu[key])
        b = np.asarray(out_mf[key])
        scale = np.abs(a - (vbar[None, None] if key == "vs" else 0)).max()
        rel = np.abs(b - a).max() / max(scale, 1e-30)
        assert rel < 1e-6, (key, rel)
