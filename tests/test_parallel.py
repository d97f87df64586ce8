"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md SS4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.control import build_costate_cache, feedforward_sweep
from optconpy_tpu.fem import heat1d_operators
from optconpy_tpu.mpc import batched_closed_loop, build_step_cache
from optconpy_tpu.parallel import (
    scenario_mesh,
    shard_scenarios,
    sharded_closed_loop,
)
from optconpy_tpu.riccati import (
    build_dre_cache,
    dre_backward_sweep,
    dre_shift_schedule,
)

N, ALPHA, NTS, DT = 32, 1e-3, 10, 0.05


@pytest.fixture(scope="module")
def heat_gains():
    np_ops, sys = heat1d_operators(n=N)
    sig, sigma_seq, idx_seq = dre_shift_schedule(
        np_ops["A"], np_ops["M"], DT, num_shifts=8, n_adi=16
    )
    cache = build_dre_cache(sys, DT, sig)
    zs, ks = dre_backward_sweep(
        sys,
        cache,
        ALPHA,
        DT,
        NTS,
        jnp.asarray(sigma_seq),
        jnp.asarray(idx_seq),
        n_newton=2,
        r_max=24,
    )
    ws = feedforward_sweep(
        sys,
        build_costate_cache(sys, DT),
        ks,
        jnp.zeros((NTS + 1, sys.p_out)),
        DT,
    )
    return sys, ks, ws


def test_eight_cpu_devices_present():
    assert len(jax.devices("cpu")) == 8


def test_sharded_rollout_matches_vmap(heat_gains):
    sys, ks, ws = heat_gains
    cpus = jax.devices("cpu")
    mesh = scenario_mesh(cpus)
    s_batch = 16
    v0 = np.random.default_rng(0).standard_normal((s_batch, N))
    step_cache = build_step_cache(sys, DT)

    ys_sharded, stats = sharded_closed_loop(
        mesh, sys, step_cache, ks, ws, shard_scenarios(mesh, jnp.asarray(v0)),
        ALPHA, DT,
    )
    _, us_ref, ys_ref = batched_closed_loop(
        sys, step_cache, ks, ws, jnp.asarray(v0), ALPHA, DT
    )
    np.testing.assert_allclose(
        np.asarray(ys_sharded), np.asarray(ys_ref), rtol=1e-10, atol=1e-12
    )
    # psum-reduced global stats agree with the unsharded computation.
    cost_ref = float(
        (np.asarray(ys_ref) ** 2).sum() * DT
        + ALPHA * (np.asarray(us_ref) ** 2).sum() * DT
    )
    np.testing.assert_allclose(
        float(stats["mean_cost"]) * s_batch, cost_ref, rtol=1e-10
    )


@pytest.mark.slow
def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
