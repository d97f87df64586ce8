#!/usr/bin/env python
"""Config 5 (BASELINE.md) at SPEC SCALE on one chip: 8192-scenario
Re in [60, 150] parameter-sweep MPC — R=8 Reynolds buckets x 1024
scenarios, per-bucket linearization + DRE gain + steady-output target
y*, memory-lean rollout (nse_closed_loop_outputs: no state trajectory
in HBM). Writes SWEEP_r03.json with solves/s, per-bucket tracking cost,
and HBM headroom (VERDICT r2 item 3).

The multi-device psum path of the same kernel is measured separately on
the virtual 8-device CPU mesh by scripts/sweep_scaling_cpu.py (this
environment has one physical chip). Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_config5.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


RE_LO, RE_HI, R_BUCKETS = 60.0, 150.0, 8
S_TOTAL = 8192
REFINEMENT = 1
DT = 0.005
NTS = 200
ALPHA = 1e-2


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from optconpy_tpu import utils
    from optconpy_tpu.fem.device_conv import FusedConvKernel
    from optconpy_tpu.models.cylinder import cylinder_setup
    from optconpy_tpu.parallel.param_sweep import (
        assign_re_buckets,
        build_sweep_gains_and_caches,
        sharded_sweep_rollout,
    )

    utils.setup()
    dtype = jnp.float32
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    s_per = S_TOTAL // R_BUCKETS
    re_buckets = np.linspace(RE_LO, RE_HI, R_BUCKETS)
    log(f"Re buckets: {re_buckets}")

    # Continuous Re draw -> nearest-bucket assignment (the config-5
    # grouping contract, parallel/param_sweep.py assign_re_buckets).
    rng = np.random.default_rng(0)
    re_draw = rng.uniform(RE_LO, RE_HI, S_TOTAL)
    counts = np.bincount(
        assign_re_buckets(re_draw, re_buckets), minlength=R_BUCKETS
    )
    log(f"scenario draw per bucket (continuous Re): {counts}")

    # Per-bucket setups: shared geometry, per-Re viscosity/steady state.
    t0 = time.time()
    setups = []
    for re in re_buckets:
        s0 = time.time()
        setups.append(cylinder_setup(re=float(re), refinement=REFINEMENT))
        info = setups[-1][0]["steady_info"]
        log(
            f"  Re={re:.1f}: steady residual {info['residual']:.2e} "
            f"({time.time() - s0:.1f}s)"
        )
    t_setup = time.time() - t0
    sys0, cond0 = setups[0][1], setups[0][2]
    n, m = sys0.b.shape
    log(f"setups {t_setup:.1f}s: n={n} x {R_BUCKETS} buckets")

    t0 = time.time()
    cache_stack, ks = build_sweep_gains_and_caches(
        setups, DT, ALPHA, dtype=dtype,
        num_shifts=8, n_adi=16, nts_gain=8, r_max=24, solver="inverse",
    )
    jax.block_until_ready(ks)
    t_gains = time.time() - t0
    log(f"per-bucket gains + step caches {t_gains:.1f}s")

    # Shared conv kernel (same mesh/BCs across buckets).
    conv = FusedConvKernel.build(
        setups[0][0]["full"], cond0, dtype=dtype
    )
    sysd = setups[0][1].astype(dtype)

    # Per-bucket target: each bucket tracks ITS OWN steady output.
    ystar = jnp.stack([
        jnp.asarray(
            np.asarray(s[0]["C"] @ s[2].restrict(s[0]["vbar_full"])),
            dtype,
        )
        for s in setups
    ])

    # Initial states: per-bucket steady state + perturbation.
    v0 = np.stack([
        np.asarray(s[2].restrict(s[0]["vbar_full"]))[None]
        + 1e-3 * rng.standard_normal((s_per, n))
        for s in setups
    ])
    v0 = jnp.asarray(v0, dtype)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("scenario",))

    def run():
        ys, stats = sharded_sweep_rollout(
            mesh, sysd, conv, cache_stack, ks, v0, ALPHA, DT, NTS,
            ystar=ystar,
        )
        jax.block_until_ready(ys)
        return ys, stats

    t0 = time.time()
    ys, stats = run()  # compile + first run
    t_first = time.time() - t0
    log(f"sweep compile+run {t_first:.1f}s")
    t0 = time.time()
    ys, stats = run()
    t_sweep = time.time() - t0
    solves = S_TOTAL * NTS
    log(
        f"sweep warm {t_sweep:.1f}s -> {solves / t_sweep:.0f} solves/s "
        f"({S_TOTAL} scenarios x {NTS} steps)"
    )

    ys_np = np.asarray(ys)
    assert np.isfinite(ys_np).all(), "non-finite sweep outputs"
    mean_cost = np.asarray(stats["mean_cost"], dtype=np.float64)
    err_t = np.asarray(stats["tracking_err_T"], dtype=np.float64)
    for r, re in enumerate(re_buckets):
        log(
            f"  Re={re:.1f}: tracking cost {mean_cost[r]:.3e}, "
            f"terminal err {err_t[r]:.3e}"
        )

    # HBM headroom after the full sweep lives on device.
    ms = dev.memory_stats() or {}
    hbm_used = ms.get("bytes_in_use", 0)
    hbm_limit = ms.get("bytes_limit", 0)
    log(f"HBM in use {hbm_used/2**30:.2f} GiB / limit {hbm_limit/2**30:.2f} GiB")

    out = {
        "config": 5,
        "problem": f"cylinder_sweep_ref{REFINEMENT}",
        "n_state": int(n),
        "re_range": [RE_LO, RE_HI],
        "re_buckets": [round(float(r), 1) for r in re_buckets],
        "scenarios_total": S_TOTAL,
        "scenarios_per_bucket": s_per,
        "horizon_steps": NTS,
        "solves_per_s": round(solves / t_sweep, 1),
        "sweep_s": round(t_sweep, 2),
        "setup_s": round(t_setup, 1),
        "gains_s": round(t_gains, 1),
        "tracking_cost_per_bucket": [float(c) for c in mean_cost],
        "terminal_err_per_bucket": [float(e) for e in err_t],
        "hbm_in_use_gib": round(hbm_used / 2**30, 2),
        "hbm_limit_gib": round(hbm_limit / 2**30, 2),
        "finite": True,
        "device": str(dev.device_kind),
    }
    with open("/root/repo/SWEEP_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
