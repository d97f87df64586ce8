"""Config-5 structure: parameter-sweep MPC over a family of
linearizations, scenario-sharded on the virtual 8-device CPU mesh.

Uses a viscosity sweep of the driven cavity (same geometry, different
nu -> different steady state + gain per bucket) — structurally
identical to the cylinder Re sweep at CI-friendly sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.fem.device_conv import ConvKernel
from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.parallel import (
    assign_re_buckets,
    build_sweep_gains_and_caches,
    scenario_mesh,
    sharded_sweep_rollout,
    sweep_rollout,
)
from optconpy_tpu.solvers.steady import solve_steady_nse_host

NUS = [1.0, 0.5]
DT = 0.02
NTS = 6
ALPHA = 1e-8


@pytest.fixture(scope="module")
def sweep():
    setups = []
    for nu in NUS:
        np_ops, sys, cond = cavity_stokes_setup(nx=5, nu=nu)
        np_ops["vbar_full"], _ = solve_steady_nse_host(np_ops["full"], cond)
        setups.append((np_ops, sys, cond))
    cache_stack, ks = build_sweep_gains_and_caches(
        setups, DT, ALPHA, dtype=jnp.float64,
        num_shifts=6, n_adi=12, nts_gain=4, r_max=16, solver="lu",
    )
    np_ops0, sys64, cond0 = setups[0]
    sys = sys64.astype(jnp.float64)
    conv = ConvKernel.build(np_ops0["full"], cond0, dtype=jnp.float64)
    return setups, cache_stack, ks, sys, conv


def test_sweep_rollout_per_bucket_consistency(sweep):
    """The stacked-vmap sweep == running each bucket alone."""
    setups, cache_stack, ks, sys, conv = sweep
    rng = np.random.default_rng(0)
    n = sys.n
    vbars = np.stack(
        [np.asarray(cache_stack.vbar[r]) for r in range(len(NUS))]
    )
    v0 = jnp.asarray(vbars[:, None, :] + 1e-3 * rng.standard_normal(
        (len(NUS), 4, n)))
    ys, u_sq, v_fin = sweep_rollout(
        sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS
    )
    assert ys.shape == (len(NUS), 4, NTS + 1, sys.p_out)
    assert np.isfinite(np.asarray(ys)).all()
    # Bucket 0 alone:
    from optconpy_tpu.mpc.nse_rollout import nse_closed_loop_outputs

    cache0 = jax.tree.map(lambda x: x[0], cache_stack)
    ys0, _, _ = nse_closed_loop_outputs(
        sys, conv, cache0, ks[0], v0[0, 0], ALPHA, DT, NTS
    )
    np.testing.assert_allclose(
        np.asarray(ys[0, 0]), np.asarray(ys0), rtol=0, atol=1e-13
    )


def test_sharded_sweep_matches_unsharded(sweep):
    setups, cache_stack, ks, sys, conv = sweep
    devs = jax.devices("cpu")[:8]
    mesh = scenario_mesh(devs)
    rng = np.random.default_rng(1)
    n = sys.n
    s_per = 16  # divisible by 8 devices
    vbars = np.stack(
        [np.asarray(cache_stack.vbar[r]) for r in range(len(NUS))]
    )
    v0 = jnp.asarray(
        vbars[:, None, :] + 1e-3 * rng.standard_normal((len(NUS), s_per, n))
    )
    ys_ref, u_ref, _ = sweep_rollout(
        sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS
    )
    ys_sh, stats = sharded_sweep_rollout(
        mesh, sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS
    )
    np.testing.assert_allclose(
        np.asarray(ys_sh), np.asarray(ys_ref), rtol=0, atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(stats["scenarios"]), float(s_per)
    )
    ref_cost = (
        np.sum(np.asarray(ys_ref) ** 2, axis=(1, 2, 3)) * DT
        + ALPHA * np.sum(np.asarray(u_ref), axis=(1, 2)) * DT
    ) / s_per
    np.testing.assert_allclose(
        np.asarray(stats["mean_cost"]), ref_cost, rtol=1e-10
    )


def test_sharded_sweep_tracking_cost(sweep):
    """With a per-bucket ystar the psum statistics measure the
    DRIVER'S tracking objective int ||y - y*||^2 + alpha ||u||^2
    (BASELINE config 5; VERDICT r1 item 10)."""
    setups, cache_stack, ks, sys, conv = sweep
    devs = jax.devices("cpu")[:8]
    mesh = scenario_mesh(devs)
    rng = np.random.default_rng(2)
    n = sys.n
    s_per = 8
    vbars = np.stack(
        [np.asarray(cache_stack.vbar[r]) for r in range(len(NUS))]
    )
    v0 = jnp.asarray(
        vbars[:, None, :] + 1e-3 * rng.standard_normal((len(NUS), s_per, n))
    )
    ystar = jnp.asarray(rng.standard_normal((len(NUS), sys.p_out)))
    ys_ref, u_ref, _ = sweep_rollout(
        sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS
    )
    ys_sh, stats = sharded_sweep_rollout(
        mesh, sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS,
        ystar=ystar,
    )
    dy = np.asarray(ys_ref) - np.asarray(ystar)[:, None, None, :]
    ref_cost = (
        np.sum(dy**2, axis=(1, 2, 3)) * DT
        + ALPHA * np.sum(np.asarray(u_ref), axis=(1, 2)) * DT
    ) / s_per
    np.testing.assert_allclose(
        np.asarray(stats["mean_cost"]), ref_cost, rtol=1e-10
    )
    ref_err_t = np.linalg.norm(dy[:, :, -1, :], axis=-1).mean(axis=1)
    np.testing.assert_allclose(
        np.asarray(stats["tracking_err_T"]), ref_err_t, rtol=1e-10
    )


def test_sharded_sweep_ragged_mask(sweep):
    """Ragged buckets (unequal real scenario counts padded to S_max):
    padded rows contribute NOTHING to any statistic and the per-bucket
    counts/means are weighted by the true draw (VERDICT r3 item 6)."""
    setups, cache_stack, ks, sys, conv = sweep
    devs = jax.devices("cpu")[:8]
    mesh = scenario_mesh(devs)
    rng = np.random.default_rng(3)
    n = sys.n
    s_max = 8
    counts = [6, 3]  # real scenarios per bucket
    vbars = np.stack(
        [np.asarray(cache_stack.vbar[r]) for r in range(len(NUS))]
    )
    v0 = np.broadcast_to(vbars[:, None, :], (len(NUS), s_max, n)).copy()
    mask = np.zeros((len(NUS), s_max))
    for r, c in enumerate(counts):
        v0[r, :c] += 1e-3 * rng.standard_normal((c, n))
        # padded rows get GARBAGE states: they must not leak into stats
        v0[r, c:] += 1e3 * rng.standard_normal((s_max - c, n))
        mask[r, :c] = 1.0
    v0 = jnp.asarray(v0)
    ys_sh, stats = sharded_sweep_rollout(
        mesh, sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS,
        mask=jnp.asarray(mask),
    )
    np.testing.assert_array_equal(
        np.asarray(stats["scenarios"]), np.asarray(counts, float)
    )
    # Reference: per-bucket mean over ONLY the real scenarios.
    ys_ref, u_ref, _ = sweep_rollout(
        sys, conv, cache_stack, ks, v0, ALPHA, DT, NTS
    )
    ys_np, u_np = np.asarray(ys_ref), np.asarray(u_ref)
    for r, c in enumerate(counts):
        ref_cost = (
            np.sum(ys_np[r, :c] ** 2) * DT
            + ALPHA * np.sum(u_np[r, :c]) * DT
        ) / c
        np.testing.assert_allclose(
            float(stats["mean_cost"][r]), ref_cost, rtol=1e-10
        )
        ref_max = np.abs(ys_np[r, :c]).max()
        np.testing.assert_allclose(
            float(stats["max_abs_y"][r]), ref_max, rtol=1e-12
        )


def test_bucket_assignment():
    res = np.array([61.0, 149.0, 100.0, 80.0])
    buckets = np.array([60.0, 90.0, 120.0, 150.0])
    np.testing.assert_array_equal(
        assign_re_buckets(res, buckets), [0, 3, 1, 1]
    )


def test_masked_stats_immune_to_nonfinite_padding(sweep):
    """Padded rows that diverge to NaN/inf must not poison the psum
    statistics: the reductions SELECT (jnp.where) instead of
    multiplying by the mask, because 0 * inf = NaN (ADVICE r4 #1)."""
    setups, cache_stack, ks, sys, conv = sweep
    devs = jax.devices("cpu")[:8]
    mesh = scenario_mesh(devs)
    rng = np.random.default_rng(3)
    n = sys.n
    s_max = 8
    counts = [5, 3]
    vbars = np.stack(
        [np.asarray(cache_stack.vbar[r]) for r in range(len(NUS))]
    )
    v0 = np.broadcast_to(
        vbars[:, None, :], (len(NUS), s_max, n)
    ).copy()
    mask = np.zeros((len(NUS), s_max))
    for r, c in enumerate(counts):
        v0[r, :c] += 1e-3 * rng.standard_normal((c, n))
        v0[r, c:] = np.nan  # worst case: padded rows are non-finite
        mask[r, :c] = 1.0
    ys_sh, stats = sharded_sweep_rollout(
        mesh, sys, conv, cache_stack, ks, jnp.asarray(v0), ALPHA, DT,
        NTS, mask=jnp.asarray(mask),
    )
    for key in ("mean_cost", "max_abs_y", "tracking_err_T"):
        assert np.isfinite(np.asarray(stats[key])).all(), key
    np.testing.assert_array_equal(
        np.asarray(stats["scenarios"]), np.asarray(counts, float)
    )
    # Real rows must match an all-real reference run exactly.
    v0_ref = v0.copy()
    for r, c in enumerate(counts):
        v0_ref[r, c:] = vbars[r]
    _, stats_ref = sharded_sweep_rollout(
        mesh, sys, conv, cache_stack, ks, jnp.asarray(v0_ref), ALPHA,
        DT, NTS, mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(stats["mean_cost"]),
        np.asarray(stats_ref["mean_cost"]), rtol=1e-12,
    )


@pytest.mark.slow
def test_ns_chain_stepper_parity():
    """'inverse_ns' stepper tier (one seed inverse + on-device
    Newton-Schulz chain, VERDICT r4 item 7) matches the host-built
    'inverse' tier at f32 quality on adjacent cylinder Re buckets."""
    from optconpy_tpu.models.cylinder import cylinder_setup
    from optconpy_tpu.mpc.nse_rollout import (
        build_nse_stepper,
        build_sweep_steppers_ns_chain,
    )

    dt = 0.005
    setups = [
        cylinder_setup(re=re, refinement=1) for re in (60.0, 85.0)
    ]
    conv = ConvKernel.build(
        setups[0][0]["full"], setups[0][2], dtype=jnp.float32
    )
    steppers, res = build_sweep_steppers_ns_chain(
        setups, dt, dtype=jnp.float32, conv=conv
    )
    assert all(r < 1e-4 for r in res), res
    ref = build_nse_stepper(
        setups[1][0], setups[1][2], dt,
        dtype=jnp.float32, solver="inverse",
    )
    inv_ns = np.asarray(steppers[1].lu.inv, np.float64)
    inv_ref = np.asarray(ref.lu.inv, np.float64)
    dev = np.abs(inv_ns - inv_ref).max() / np.abs(inv_ref).max()
    assert dev < 1e-5, dev
    l1_dev = np.abs(
        np.asarray(steppers[1].l1_imp, np.float64)
        - np.asarray(ref.l1_imp, np.float64)
    ).max() / np.abs(np.asarray(ref.l1_imp)).max()
    assert l1_dev < 1e-5, l1_dev
