"""Acceptance config 2 (BASELINE.md): Stokes driven cavity tracking LQR.

Constrained (index-2 DAE) pipeline: saddle-point shifted solves keep
all Riccati iterates in ker J; the oracle is the reduced-space dense
f64 golden (golden/dae_reduce.py + golden/dense_lqr.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.control import build_costate_cache_dae, feedforward_sweep
from optconpy_tpu.golden import (
    golden_are,
    golden_closed_loop,
    golden_dre_sweep,
    golden_feedforward,
    lift_gain,
    nullspace_basis,
    reduce_dae,
)
from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.mpc import build_step_cache_dae, closed_loop_rollout
from optconpy_tpu.riccati import (
    build_dre_cache_dae,
    cycled_shifts,
    dre_backward_sweep,
    dre_shift_schedule_dae,
    newton_adi_are,
    spectral_interval_dae,
    wachspress_shifts,
)
from optconpy_tpu.solvers import SaddleShiftedLUCache, solve_sadpnt_scipy

NX = 6  # coarse Taylor-Hood cavity (~600 free velocity dofs)
ALPHA = 1e-2
NTS = 30
DT = 0.02


@pytest.fixture(scope="module")
def cavity():
    return cavity_stokes_setup(nx=NX, nu=1.0)


@pytest.fixture(scope="module")
def reduced(cavity):
    np_ops, _, _ = cavity
    return reduce_dae(np_ops)


def test_steady_stokes_solve(cavity):
    """Golden saddle solve: lid-driven steady Stokes is div-free + BCs."""
    np_ops, sys, cond = cavity
    v, p = solve_sadpnt_scipy(
        np_ops["A"], np_ops["J"], np_ops["fv"], np_ops["fp"]
    )
    # Continuity residual (inner): J v = fp.
    assert np.abs(np_ops["J"] @ v - np_ops["fp"]).max() < 1e-10
    v_full = cond.expand(v)
    space = np_ops["space"]
    ns = space.n_scalar
    coords = space.dof_coords()
    lid = coords[:, 1] > 1 - 1e-12
    np.testing.assert_allclose(v_full[:ns][lid], 1.0)  # lid BC
    # Lid drives a vortex: interior x-velocity below the lid is negative
    # somewhere (return flow).
    assert v_full[:ns].min() < -1e-3


def test_saddle_lu_matches_scipy(cavity):
    np_ops, sys, _ = cavity
    from optconpy_tpu.solvers import SaddleLU

    m_d, a_d, j_d = sys.dense()
    cache = SaddleLU.build(-np.asarray(a_d), np.asarray(j_d))
    rng = np.random.default_rng(5)
    rhs = rng.standard_normal(sys.n)
    v_dev = np.asarray(cache.apply(jnp.asarray(rhs)))
    v_sci, _ = solve_sadpnt_scipy(-np_ops["A"], np_ops["J"], rhs)
    np.testing.assert_allclose(v_dev, v_sci, rtol=1e-8, atol=1e-10)


def test_projected_adi_stays_in_kernel(cavity):
    np_ops, sys, _ = cavity
    a_min, a_max = spectral_interval_dae(
        np_ops["A"], np_ops["M"], np_ops["J"]
    )
    sig = wachspress_shifts(a_min, a_max, 10)
    n_adi = 20
    sigma_seq = jnp.asarray(cycled_shifts(sig, n_adi))
    idx_seq = jnp.asarray(cycled_shifts(np.arange(10, dtype=np.int32), n_adi))
    m_d, a_d, j_d = sys.dense()
    cache = SaddleShiftedLUCache.build(
        a_d.T, m_d, j_d, jnp.asarray(sig)
    )
    from optconpy_tpu.riccati import lowrank_adi

    z = lowrank_adi(
        cache,
        smw_u=jnp.zeros((sys.n, sys.m_in)),
        smw_v=sys.b,
        mass=sys.mass,
        w=sys.c.T,
        sigma_seq=sigma_seq,
        idx_seq=idx_seq,
    )
    # Feasibility: every factor column lies in ker J.
    jz = np.asarray(sys.jmat.matmat(z))
    assert np.abs(jz).max() < 1e-8 * max(1.0, np.abs(np.asarray(z)).max())


def test_projected_are_matches_reduced_golden(cavity, reduced):
    np_ops, sys, _ = cavity
    red = reduced
    a_min, a_max = spectral_interval_dae(
        np_ops["A"], np_ops["M"], np_ops["J"]
    )
    sig = wachspress_shifts(a_min, a_max, 12)
    n_adi = 30
    sigma_seq = jnp.asarray(cycled_shifts(sig, n_adi))
    idx_seq = jnp.asarray(
        cycled_shifts(np.arange(12, dtype=np.int32), n_adi)
    )
    m_d, a_d, j_d = sys.dense()
    cache = SaddleShiftedLUCache.build(a_d.T, m_d, j_d, jnp.asarray(sig))
    z, k = newton_adi_are(
        sys, cache, ALPHA, sigma_seq, idx_seq, n_newton=8, out_rank=60
    )
    xt = golden_are(red["Mt"], red["At"], red["Bt"], red["Ct"], ALPHA)
    k_gold = lift_gain(red, xt, ALPHA)
    rel = np.linalg.norm(np.asarray(k) - k_gold) / np.linalg.norm(k_gold)
    assert rel < 1e-6, rel


@pytest.fixture(scope="module")
def dre_solution(cavity, reduced):
    np_ops, sys, _ = cavity
    red = reduced
    sig, sigma_seq, idx_seq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], DT, num_shifts=10, n_adi=20
    )
    cache = build_dre_cache_dae(sys, DT, sig)
    zs, ks = dre_backward_sweep(
        sys,
        cache,
        ALPHA,
        DT,
        NTS,
        jnp.asarray(sigma_seq),
        jnp.asarray(idx_seq),
        n_newton=3,
        r_max=50,
    )
    xts = golden_dre_sweep(
        red["Mt"], red["At"], red["Bt"], red["Ct"], ALPHA, DT, NTS
    )
    return zs, ks, xts


@pytest.mark.slow
def test_dre_gains_match_reduced_golden(cavity, reduced, dre_solution):
    _, _, _ = cavity
    red = reduced
    zs, ks, xts = dre_solution
    for k_idx in [0, 10, 29]:
        k_gold = lift_gain(red, xts[k_idx], ALPHA)
        rel = np.linalg.norm(np.asarray(ks[k_idx]) - k_gold) / max(
            np.linalg.norm(k_gold), 1e-30
        )
        assert rel < 1e-5, (k_idx, rel)


@pytest.mark.slow
def test_closed_loop_matches_reduced_golden(cavity, reduced, dre_solution):
    """North-star fidelity for config 2: full closed loop <= 1e-4."""
    np_ops, sys, _ = cavity
    red = reduced
    zs, ks, xts = dre_solution
    theta = red["theta"]

    rng = np.random.default_rng(7)
    q0 = rng.standard_normal(theta.shape[1])
    v0 = theta @ q0  # feasible (ker J) initial perturbation
    ystar = np.tile([0.05, 0.0], (NTS + 1, 1))

    # Reduced golden closed loop.
    wts = golden_feedforward(
        red["Mt"], red["At"], red["Bt"], red["Ct"], ALPHA, DT, xts, ystar
    )
    vs_g, us_g, ys_g = golden_closed_loop(
        red["Mt"], red["At"], red["Bt"], red["Ct"], ALPHA, DT, xts, wts, q0
    )

    # Device DAE closed loop (saddle stepping).
    cost_cache = build_costate_cache_dae(sys, DT)
    ws = feedforward_sweep(sys, cost_cache, ks, jnp.asarray(ystar), DT)
    step_cache = build_step_cache_dae(sys, DT)
    vs, us, ys = closed_loop_rollout(
        sys, step_cache, ks, ws, jnp.asarray(v0), ALPHA, DT
    )

    rel_u = np.linalg.norm(np.asarray(us) - us_g) / np.linalg.norm(us_g)
    rel_y = np.linalg.norm(np.asarray(ys) - ys_g) / np.linalg.norm(ys_g)
    # States compared through the output map (reduced vs full coords).
    assert rel_u < 1e-4, rel_u
    assert rel_y < 1e-4, rel_y
    # Feasibility along the trajectory.
    jv = np.asarray(sys.jmat.matmat(jnp.asarray(np.asarray(vs).T)))
    assert np.abs(jv).max() < 1e-8 * max(1.0, np.abs(np.asarray(vs)).max())
