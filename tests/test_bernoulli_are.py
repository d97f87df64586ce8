"""Bernoulli-stabilized infinite-horizon ARE on UNSTABLE constrained
systems (riccati/are.py + riccati/bernoulli.py) — the reference's
flagship above-critical-Re capability (SURVEY.md SS3.3 Newton wrapper
needs a stabilizing start; VERDICT r1 item 3).

Oracle: a spectrally-shifted Stokes cavity (A -> A + c M makes a known
number of ker-J modes unstable) small enough for a dense reduced CARE
golden; plus a cylinder Re=60 smoke test that the wake's unstable pair
is found and stabilized.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from optconpy_tpu.fem.dae import dae_from_scipy
from optconpy_tpu.golden.dae_reduce import lift_gain, reduce_dae
from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.riccati import (
    solve_are_stabilized,
    stabilizing_gain_reduced,
)

ALPHA = 1e-2


@pytest.fixture(scope="module")
def unstable_cavity():
    """Cavity DAE with A + c M: exactly 2 unstable ker-J modes."""
    np_ops, _, cond = cavity_stokes_setup(nx=5)
    red = reduce_dae(np_ops)
    lam = np.linalg.eigvals(red["At"])
    re = np.sort(-np.real(lam))  # ascending decay rates, all > 0
    c = 0.5 * (re[1] + re[2])  # destabilize the two slowest modes
    a2 = (np_ops["A"] + c * np_ops["M"]).tocsr()
    np2 = dict(np_ops, A=a2)
    sys2 = dae_from_scipy(np_ops["M"], a2, np_ops["J"], np_ops["B"],
                          np_ops["C"])
    red2 = reduce_dae(np2)
    return np2, sys2, red2


def test_bernoulli_gain_stabilizes(unstable_cavity):
    np2, sys2, red2 = unstable_cavity
    k0t, n_unstable = stabilizing_gain_reduced(
        red2["At"], red2["Bt"], ALPHA
    )
    assert n_unstable == 2
    lam_open = np.linalg.eigvals(red2["At"])
    assert (np.real(lam_open) > 0).sum() == 2
    lam_closed = np.linalg.eigvals(red2["At"] - red2["Bt"] @ k0t)
    assert np.real(lam_closed).max() < 0, "Bernoulli gain must be Hurwitz"


def test_stabilized_are_matches_golden(unstable_cavity):
    """Newton-ADI from the Bernoulli start reproduces the dense CARE
    gain on the unstable pencil."""
    np2, sys2, red2 = unstable_cavity
    xt = sla.solve_continuous_are(
        red2["At"], red2["Bt"],
        red2["Ct"].T @ red2["Ct"],
        ALPHA * np.eye(red2["Bt"].shape[1]),
    )
    k_gold = lift_gain(red2, xt, ALPHA)

    _, k, info = solve_are_stabilized(
        np2, sys2, ALPHA, n_shifts=8, n_adi=24, n_newton=8, r_max=40
    )
    assert info["n_unstable"] == 2
    rel = np.abs(np.asarray(k) - k_gold).max() / np.abs(k_gold).max()
    assert rel < 1e-6, rel

    # Closed loop of the CONVERGED gain is Hurwitz on the reduced space.
    kt = np.asarray(k) @ np.linalg.pinv(red2["theta"].T @ red2["M_full"])
    lam = np.linalg.eigvals(red2["At"] - red2["Bt"] @ kt)
    assert np.real(lam).max() < 0


def test_newton_from_zero_fails_where_bernoulli_succeeds(unstable_cavity):
    """The whole point of the Bernoulli start: K0 = 0 on the unstable
    pencil does NOT converge to the CARE gain (ADI on an unstable
    closed loop), while K0 = Bernoulli does (previous test)."""
    np2, sys2, red2 = unstable_cavity
    xt = sla.solve_continuous_are(
        red2["At"], red2["Bt"],
        red2["Ct"].T @ red2["Ct"],
        ALPHA * np.eye(red2["Bt"].shape[1]),
    )
    k_gold = lift_gain(red2, xt, ALPHA)

    from optconpy_tpu.riccati import newton_adi_are, shifts as shiftmod
    from optconpy_tpu.solvers import SaddleShiftedLUCache

    # Same shift schedule as the stabilized run...
    k0t, _ = stabilizing_gain_reduced(red2["At"], red2["Bt"], ALPHA)
    lam = np.linalg.eigvals(red2["At"] - red2["Bt"] @ k0t)
    re = -np.real(lam)
    re = re[re > 0]
    sig = shiftmod.wachspress_shifts(float(re.min()), float(re.max()), 8)
    sigma_seq = jnp.asarray(shiftmod.cycled_shifts(sig, 24))
    idx_seq = jnp.asarray(
        shiftmod.cycled_shifts(np.arange(8, dtype=np.int32), 24)
    )
    m_d, a_d, j_d = sys2.dense()
    cache = SaddleShiftedLUCache.build(a_d.T, m_d, j_d, jnp.asarray(sig))
    # ...but started from zero.
    _, k_zero = newton_adi_are(
        sys2, cache, ALPHA, sigma_seq, idx_seq, n_newton=8, out_rank=40
    )
    k_zero = np.asarray(k_zero)
    rel = np.abs(k_zero - k_gold).max() / np.abs(k_gold).max()
    assert not np.isfinite(rel) or rel > 1e-2, (
        f"expected divergence from K0=0 on the unstable pencil, got "
        f"rel={rel:.2e}"
    )


@pytest.mark.slow
def test_cylinder_wake_bernoulli_smoke():
    """Re=60 wake: the unstable pair is detected and the Bernoulli gain
    mirrors it (reduced closed loop Hurwitz). Dense reduced work at
    n ~ 4.4k — the slowest test in the suite, kept as the direct
    evidence for the flagship capability."""
    from optconpy_tpu.models.cylinder import cylinder_setup

    np_ops, sys, cond = cylinder_setup(re=60.0, refinement=1)
    red = reduce_dae(np_ops)
    k0t, n_unstable = stabilizing_gain_reduced(
        red["At"], red["Bt"], ALPHA
    )
    assert n_unstable == 2, n_unstable  # the classical wake pair
    lam_closed = np.linalg.eigvals(red["At"] - red["Bt"] @ k0t)
    assert np.real(lam_closed).max() < 0
    k0 = (k0t @ red["theta"].T) @ red["M_full"]
    assert np.isfinite(k0).all()
