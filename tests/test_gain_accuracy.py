"""Production-scale gain validation (riccati/validate.py; VERDICT r1
item 5): the projected DRE-step Riccati residual must certify converged
factors and expose under-converged ones — the residual oracle bench.py
and scripts/validate_gains.py rely on at n ~ 4-15k where no dense
golden exists.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.fem import heat1d_operators
from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.riccati import (
    build_dre_cache,
    build_dre_cache_dae,
    dre_backward_sweep,
    dre_shift_schedule,
    dre_shift_schedule_dae,
    dre_step_residual,
)

ALPHA, DT, NTS = 1e-2, 0.05, 3


def _sweep_dae(cavity, n_adi, n_newton):
    np_ops, sys, _ = cavity
    sig, sseq, iseq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], DT,
        num_shifts=min(8, n_adi), n_adi=n_adi,
    )
    cache = build_dre_cache_dae(sys, DT, sig)
    zs, ks = dre_backward_sweep(
        sys, cache, ALPHA, DT, NTS,
        jnp.asarray(sseq), jnp.asarray(iseq),
        n_newton=n_newton, r_max=32,
    )
    return np.asarray(zs), np.asarray(ks)


@pytest.fixture(scope="module")
def cavity():
    return cavity_stokes_setup(nx=5)


@pytest.mark.slow
def test_converged_dae_sweep_has_small_residual(cavity):
    np_ops, sys, _ = cavity
    zs, ks = _sweep_dae(cavity, n_adi=16, n_newton=3)
    rel = dre_step_residual(np_ops, zs[0], ks[0], zs[1], ALPHA, DT)
    assert rel < 1e-6, rel


def test_residual_exposes_underconverged_sweep(cavity):
    """An ADI starved to 2 iterations must show a residual orders of
    magnitude above the converged one — the validator has teeth."""
    np_ops, sys, _ = cavity
    zs_good, ks_good = _sweep_dae(cavity, n_adi=16, n_newton=3)
    zs_bad, ks_bad = _sweep_dae(cavity, n_adi=2, n_newton=1)
    r_good = dre_step_residual(
        np_ops, zs_good[0], ks_good[0], zs_good[1], ALPHA, DT
    )
    r_bad = dre_step_residual(
        np_ops, zs_bad[0], ks_bad[0], zs_bad[1], ALPHA, DT
    )
    assert r_bad > 50 * r_good, (r_good, r_bad)


def test_unconstrained_residual(cavity):
    """J=None path: heat1d LTI sweep at bench.py's ADI settings
    (n_adi=24 over 12 Wachspress shifts — measured floor 3.8e-7;
    16 iters over 8 shifts leave 7e-5, so the bench's 24/12 choice is
    exactly what buys the target accuracy)."""
    np_ops, sys = heat1d_operators(n=64)
    sig, sseq, iseq = dre_shift_schedule(
        np_ops["A"], np_ops["M"], DT, num_shifts=12, n_adi=24
    )
    cache = build_dre_cache(sys, DT, sig)
    zs, ks = dre_backward_sweep(
        sys, cache, ALPHA, DT, NTS,
        jnp.asarray(sseq), jnp.asarray(iseq), n_newton=3, r_max=32,
    )
    zs, ks = np.asarray(zs), np.asarray(ks)
    rel = dre_step_residual(np_ops, zs[0], ks[0], zs[1], ALPHA, DT)
    assert rel < 1e-6, rel
