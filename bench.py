#!/usr/bin/env python
"""Headline benchmark: closed-loop MPC solves/s/chip, cylinder wake Re=100.

Measures the BASELINE.md headline metric (config 4 shape): batched
nonlinear NSE closed-loop rollouts — per scenario-step one IMEX saddle
solve + device convection + feedback matvec — on one TPU chip, with
real DRE-computed feedback gains. The reference publishes no numbers
(BASELINE.json `published: {}`), so `vs_baseline` is the speedup over
the reference's ARCHITECTURE run in-process: scipy splu cached saddle
factorization + numpy convection, single-scenario serial stepping (the
solve_nse loop, SURVEY.md SS3.4).

Prints exactly ONE JSON line on stdout; progress goes to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Bench shape: config-4 scale (1024 scenarios), short horizon so the
# whole bench stays in a few minutes on one chip.
RE = 100.0
REFINEMENT = 1
S_BATCH = 1024
NTS = 64
DT = 0.005
ALPHA = 1e-2
NTS_GAIN = 6  # DRE steps used to produce a real (warm) gain
R_MAX = 32
N_SHIFTS = 6
N_ADI = 32  # 24 left a reproducible 2.3e-4 step-residual spike; 32 restores ~2e-5 (r4 lever experiment)
CPU_STEPS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from optconpy_tpu import utils
    from optconpy_tpu.fem.device_conv import ConvKernel, FusedConvKernel
    from optconpy_tpu.models.cylinder import cylinder_setup
    from optconpy_tpu.mpc.nse_rollout import (
        batched_nse_closed_loop,
        build_nse_fused,
    )
    from optconpy_tpu.riccati import (
        dre_backward_sweep,
        dre_shift_schedule_dae,
    )

    utils.setup()
    dtype = jnp.float32
    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")

    t0 = time.time()
    np_ops, sys64, cond = cylinder_setup(re=RE, refinement=REFINEMENT)
    sys = sys64.astype(dtype)
    # Production convection kernel: the fused Pallas element kernel
    # (ops/pallas_conv.py) — measured 8.2 vs 13.8 ms/call against the
    # XLA lowering at (n=4396, B=1024) on v5e, parity 1.5e-7 (r3).
    conv = FusedConvKernel.build(np_ops["full"], cond, dtype=dtype)
    n, m = sys.b.shape
    log(
        f"setup {time.time() - t0:.1f}s: n={n} np={sys.n_p} m={m} "
        f"steady-res={np_ops['steady_info']['residual']:.2e}"
    )

    # --- Real gains: short backward DRE sweep on the DAE pencil. ---
    # Cold-start breakdown (VERDICT r2 item 6): shift schedule /
    # inverse-cache build / XLA compile timed separately.
    t0 = time.time()
    sig, sigma_seq, idx_seq = dre_shift_schedule_dae(
        np_ops["A"], np_ops["M"], np_ops["J"], DT,
        num_shifts=N_SHIFTS, n_adi=N_ADI,
    )
    t_shifts = time.time() - t0
    # Cold-start architecture (round 5): the shifted-saddle inverse
    # stack is built ON DEVICE by Newton-Schulz ladders
    # (riccati.build_dre_cache_dae_ns) — no host splu factorizations
    # (~43 s of contended host work in r4) and no ~0.5 GB tunnel
    # transfer (the r4 disk-warm reload alone was 23.7 s). The NS
    # build runs on a worker thread CONCURRENT with the XLA compile of
    # the DRE program (zeros cache, shape-keyed executable reused).
    # NOTE the axon runtime does not support executable
    # DESERIALIZATION (serialize->parse only, axon/register/ifrt.py),
    # so the persistent compilation cache can never restore compiles
    # across processes — every fresh process pays the XLA compile; the
    # NS build makes everything AROUND it cheap.
    import os

    ss_dev = jnp.asarray(sigma_seq, dtype)
    ii_dev = jnp.asarray(idx_seq)

    def run_dre(cache, alpha):
        zs, ks = dre_backward_sweep(
            sys, cache, alpha, DT, NTS_GAIN,
            ss_dev, ii_dev, n_newton=1, r_max=R_MAX,
        )
        # Materialize on host: under the tunnel runtime,
        # block_until_ready alone has returned before execution.
        np.asarray(ks)
        return zs, ks

    from concurrent.futures import ThreadPoolExecutor

    from optconpy_tpu.ops.sparse import ell_to_scipy
    from optconpy_tpu.riccati import (
        build_dre_cache_dae_ns,
        load_or_build_inverse_stack,
    )
    from optconpy_tpu.solvers.saddle import SaddleShiftedInverseCache

    m_sp_e = ell_to_scipy(sys.mass)
    a_sp_e = ell_to_scipy(sys.stiff)
    j_sp_e = ell_to_scipy(sys.jmat)
    at_til_cold = (a_sp_e.T - m_sp_e / (2.0 * DT)).tocsr()

    # COLD path: host splu panel build (threads, GIL-free) overlapped
    # with the DRE XLA compile against a zeros cache — measured BETTER
    # than overlapping the NS device build here, because the axon
    # tunnel serializes compile requests: two concurrent compile
    # streams SUM (a trial recorded 92 s DRE compile + 141 s NS build
    # when overlapped vs 31 + 54 solo), while host splu work uses no
    # tunnel at all.
    t_par0 = time.time()
    with ThreadPoolExecutor(1) as ex:
        fut_inv = ex.submit(
            load_or_build_inverse_stack,
            at_til_cold, m_sp_e, j_sp_e, np.asarray(sig), np.float32,
        )  # no cache_key: always builds (the honest cold path)
        t0 = time.time()
        warm_cache = SaddleShiftedInverseCache(
            jnp.zeros((len(np.asarray(sig)), n, n), dtype), n
        )
        run_dre(warm_cache, ALPHA)  # XLA compile (outputs discarded)
        t_compile = time.time() - t0
        del warm_cache
        inv_np, _src = fut_inv.result()
        t_build_host = time.time() - t_par0
    dre_cache = SaddleShiftedInverseCache(jnp.asarray(inv_np), n)
    jax.block_until_ready(dre_cache.inv)
    del inv_np
    t_cachebuild = time.time() - t_par0  # overlapped build+compile
    log(
        f"DRE cold-start (overlapped): host build-until-ready "
        f"{t_build_host:.1f}s, XLA compile {t_compile:.1f}s, "
        f"combined phase {t_cachebuild:.1f}s"
    )
    t0 = time.time()
    zs, ks_gain = run_dre(dre_cache, ALPHA)  # first REAL run (compile cached)
    t_first = time.time() - t0
    # Warm rate: MEDIAN of 5 sweeps with the spread recorded (VERDICT
    # r4 weak 1/6 + item 9): the sweep is ~100 small host-dispatched
    # programs, so a single sample inherits whatever the host costs
    # that minute (r3->r4 the single-shot number swung 478->192 on
    # identical code).
    warm_times = []
    for rep in range(5):
        t0 = time.time()
        run_dre(dre_cache, ALPHA * (1.0 + 1e-4 * (rep + 1)))
        warm_times.append(time.time() - t0)
    t_dre = float(np.median(warm_times))
    t_cold_total = t_shifts + t_cachebuild + t_first
    adi_iters = NTS_GAIN * 1 * N_ADI
    adi_iters_per_s = adi_iters / t_dre
    adi_spread = [
        round(adi_iters / t, 1) for t in
        (max(warm_times), min(warm_times))
    ]
    log(
        f"DRE gains: first run {t_first:.1f}s (cold total "
        f"{t_cold_total:.1f}s), warm sweep median "
        f"{t_dre:.2f}s -> {adi_iters_per_s:.1f} ADI iters/s "
        f"(spread {adi_spread[0]}..{adi_spread[1]} over 5)"
    )

    # RESTART mode (r5): the Newton-Schulz DEVICE build of the same
    # inverse stack (riccati.build_dre_cache_dae_ns) — no host splu, no
    # 0.5 GB transfer. First call pays its own XLA compiles (measured
    # separately, AFTER the cold figure above so tunnel-compile
    # serialization can't pollute it); the warm rebuild is what an
    # in-process re-linearization or compile-warm restart pays —
    # replaces the r4 23.7 s disk reload.
    t0 = time.time()
    cache_ns, ns_info = build_dre_cache_dae_ns(
        sys, DT, np.asarray(sig), dtype
    )
    t_ns_cold = time.time() - t0
    del cache_ns
    t0 = time.time()
    cache_ns, _ = build_dre_cache_dae_ns(
        sys, DT, np.asarray(sig), dtype
    )
    t_ns_warm = time.time() - t0
    del cache_ns
    log(
        f"NS device stack build: first {t_ns_cold:.1f}s (incl its "
        f"compiles), warm rebuild {t_ns_warm:.1f}s, worst residual "
        f"{max(ns_info['residuals']):.1e}"
    )

    # Receding-horizon style: apply the current (t=0) gain at every step.
    k0 = ks_gain[0]
    ks = jnp.broadcast_to(k0, (NTS + 1, m, n))
    ws = jnp.zeros((NTS + 1, n), dtype)

    # --- IMEX rollout operands: the FUSED Oseen step (whole linear
    # part pre-contracted into two (n, n) GEMMs — mpc/nse_rollout.py
    # NSEFusedCache, ~2.4x fewer step FLOPs than the unfused inverse
    # apply; VERDICT r1 item 2). ---
    step_cache = build_nse_fused(np_ops, cond, DT, dtype=dtype)
    vbar = step_cache.vbar

    rng = np.random.default_rng(0)
    v0_batch = jnp.asarray(
        np.asarray(vbar)[None]
        + 1e-3 * rng.standard_normal((S_BATCH, n)),
        dtype,
    )

    # SPLIT PRECISION POLICY (VERDICT r3 item 3, PRECISION_r05.json):
    # the DRE/gain path stays at 'highest' (6-pass f32; the GAINQ 1e-4
    # gain-fidelity bound is tight), while the ROLLOUT GEMMs run at
    # 'high' (3-pass): measured closed-loop output deviation vs the
    # f64 reference of the same recurrence is ~9.3e-5 over THIS
    # 64-step horizon (also re-measured in-run below) — inside the
    # 1e-4 north-star bound — at ~1.35x the throughput. 'default'
    # (1-pass bf16) measured 9.9e-4: FAILS the bound and stays
    # rejected. HORIZON CAVEAT (r5): the measured horizon curve shows
    # 'high' drifting past 1e-4 at 200 steps (2.9e-4) — long-horizon
    # runs (config 5) stay on 'highest' (PRECISION_r05
    # high_tier_horizon_curve).
    ROLLOUT_PREC = "high"

    def run():
        with jax.default_matmul_precision(ROLLOUT_PREC):
            vs, us, ys = batched_nse_closed_loop(
                sys, conv, step_cache, ks, ws, v0_batch, ALPHA, DT,
            )
        return np.asarray(ys)  # host materialization = hard barrier

    t0 = time.time()
    ys = run()  # compile + first run
    log(f"rollout compile+run {time.time() - t0:.1f}s")
    if not bool(np.isfinite(np.asarray(ys)).all()):
        log("WARNING: non-finite outputs in rollout")

    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    t_roll = min(times)
    solves_per_s = S_BATCH * NTS / t_roll
    log(
        f"rollout best {t_roll:.3f}s -> {solves_per_s:.0f} solves/s "
        f"(rollout precision '{ROLLOUT_PREC}')"
    )

    # Model FLOPs / MFU for the fused step: two (n, n) GEMMs (pmat,
    # inv_vv), the gain/input GEMMs, and the element-local convection
    # contraction. Contraction count (ADVICE r2): per element per
    # scenario the W stage is 36*(12 MACs) = 432 and the combine is
    # 2*36 = 72 MACs -> 504 MACs = 1008 flops/element.
    nt = int(conv.t0.shape[0])
    flops_step = (
        4 * n * n  # pmat + inv_vv GEMMs
        + 1008 * nt  # convection tensor contraction
        + 4 * m * n  # feedback gain + B u
    )
    achieved_tflops = flops_step * solves_per_s / 1e12
    v5e_bf16_peak = 197.0  # TFLOP/s (spec sheet)
    # Roofline of the ROLLOUT'S OWN precision tier: the MEASURED
    # attainable GEMM rate from scripts/measure_roofline.py when its
    # artifact exists (VERDICT r3 weak 7); the pass-count model
    # (peak/6 per 'highest', peak/3 per 'high') otherwise.
    passes = {"highest": 6.0, "high": 3.0, "default": 1.0}
    roofline_src = f"model_peak_over_{int(passes[ROLLOUT_PREC])}"
    tier_roofline = v5e_bf16_peak / passes[ROLLOUT_PREC]
    try:
        with open("ROOFLINE_r04.json") as f:
            roof = json.load(f)
        tier_roofline = roof["tiers"][ROLLOUT_PREC]["tflops"]
        roofline_src = "measured"
    except (OSError, KeyError):
        pass
    mfu_bf16 = achieved_tflops / v5e_bf16_peak
    mfu_tier = achieved_tflops / tier_roofline
    log(
        f"model FLOPs/step {flops_step/1e6:.1f} MF -> "
        f"{achieved_tflops:.2f} TFLOP/s "
        f"({100 * mfu_bf16:.1f}% of v5e bf16 peak, "
        f"{100 * mfu_tier:.1f}% of the {tier_roofline:.1f} TF/s "
        f"{roofline_src} f32-{ROLLOUT_PREC} roofline)"
    )

    # Single-scenario latency: what a real-time MPC loop would see.
    v0_one = v0_batch[:1]

    def run_one():
        with jax.default_matmul_precision(ROLLOUT_PREC):
            _, _, ys1 = batched_nse_closed_loop(
                sys, conv, step_cache, ks, ws, v0_one, ALPHA, DT,
            )
        return np.asarray(ys1)

    run_one()  # compile
    t0 = time.time()
    run_one()
    lat_ms_per_step = (time.time() - t0) / NTS * 1e3
    log(f"single-scenario latency {lat_ms_per_step:.3f} ms/step")

    # --- Reference-architecture CPU baseline (splu + numpy conv). ---
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from optconpy_tpu.fem.taylor_hood import (
        convection_matrices,
        convection_tensor,
    )

    m_sp = np_ops["M"].tocsr()
    a_stokes_sp = cond.mat_inner(np_ops["full"]["A"]).tocsr()
    l1_full, _ = convection_matrices(np_ops["full"], np_ops["vbar_full"])
    l1_sp = cond.mat_inner(l1_full).tocsr()
    j_sp = np_ops["J"].tocsr()
    n_p = j_sp.shape[0]
    big = sp.bmat(
        [[m_sp / DT - a_stokes_sp + l1_sp, j_sp.T], [j_sp, None]],
        format="csc",
    )
    t0 = time.time()
    lu = spla.splu(big)
    log(f"cpu splu factor {time.time() - t0:.1f}s")

    space = np_ops["space"]
    t0_tensor = convection_tensor(np_ops["full"])
    tri_dofs = space.tri_dofs
    ns = space.n_scalar
    free = cond.free
    dir_values = np.zeros(2 * ns)
    dir_values[cond.dirichlet] = cond.g
    b_np = np.asarray(sys64.b)
    k0_np = np.asarray(k0, dtype=np.float64)
    vbar_np = cond.restrict(np_ops["vbar_full"])
    fv_np = cond.mat_bc_rhs(np_ops["full"]["A"])
    fp_np = cond.jmat_bc_rhs(np_ops["full"]["J"])

    def conv_np(v_inner):
        v_full = dir_values.copy()
        v_full[free] = v_inner
        v2 = v_full.reshape(2, ns)
        v_loc = v2[:, tri_dofs].transpose(1, 2, 0)
        out_loc = np.einsum("eijkb,ejb,eka->eia", t0_tensor, v_loc, v_loc)
        out = np.zeros((2, ns))
        np.add.at(out[0], tri_dofs.reshape(-1), out_loc[:, :, 0].reshape(-1))
        np.add.at(out[1], tri_dofs.reshape(-1), out_loc[:, :, 1].reshape(-1))
        return out.reshape(-1)[free]

    # CPU baselines are MEDIAN-of-3 with the 1-min load average
    # recorded (VERDICT r4 weak 2: single-shot baselines swung 16x
    # between runs of identical code on the co-tenanted host, making
    # vs_baseline a weather report).
    loadavg_1min = round(os.getloadavg()[0], 2)
    cpu_step_times = []
    for _ in range(3):
        v = vbar_np + 1e-3 * rng.standard_normal(n)
        t0 = time.time()
        for _ in range(CPU_STEPS):
            u = -(k0_np @ (v - vbar_np))
            expl = conv_np(v) - l1_sp @ v
            rhs = np.concatenate(
                [m_sp @ v / DT - expl + b_np @ u - fv_np, fp_np]
            )
            v = lu.solve(rhs)[:n]
        cpu_step_times.append(time.time() - t0)
    t_cpu = float(np.median(cpu_step_times))
    cpu_solves_per_s = CPU_STEPS / t_cpu
    samples = [round(t, 2) for t in cpu_step_times]
    log(
        f"cpu baseline median {t_cpu:.2f}s of {samples} "
        f"(loadavg {loadavg_1min}) -> {cpu_solves_per_s:.1f} solves/s"
    )

    # --- MEASURED rollout precision fidelity (VERDICT r4 weak 3 /
    # item 6): f64 reference of the SAME fused recurrence on a
    # scenario subsample, compared against the device trajectories
    # captured above — replaces the round-4 hardcoded constant, so a
    # changed NTS/RE/refinement can never silently stale-certify.
    s_ref = 2
    pmat64 = np.asarray(step_cache.pmat, np.float64)
    gmat64 = np.asarray(step_cache.gmat, np.float64)
    inv_vv64 = np.asarray(step_cache.inv_vv, np.float64)
    c0_64 = np.asarray(step_cache.c0, np.float64)
    k0_64 = np.asarray(k0, np.float64)
    vbar64 = np.asarray(vbar, np.float64)
    c_out64 = np.asarray(sys64.c)
    v_ref = np.asarray(v0_batch[:s_ref], np.float64)
    ys_ref = [v_ref @ c_out64.T]
    t0 = time.time()
    for _ in range(NTS):
        u_ref = -(v_ref - vbar64[None]) @ k0_64.T
        v_ref = (
            v_ref @ pmat64.T
            + u_ref @ gmat64.T
            - np.stack([conv_np(vv) for vv in v_ref]) @ inv_vv64.T
            + c0_64[None]
        )
        ys_ref.append(v_ref @ c_out64.T)
    ys_ref = np.stack(ys_ref, axis=1)
    dev_f64 = float(
        np.abs(ys[:s_ref] - ys_ref).max() / np.abs(ys_ref).max()
    )
    log(
        f"measured rollout dev vs f64 reference ({s_ref} scenarios, "
        f"{time.time() - t0:.1f}s): {dev_f64:.2e}"
    )

    # --- ADI CPU-architecture baseline: scipy splu factorizations of
    # the SAME shifted saddle pencils + the same ADI recurrence in
    # numpy f64 (the reference's solve_proj_lyap_stein structure,
    # SURVEY.md SS3.3) — gives "ADI iters/s" its vs_baseline. ---
    a_lin_sp = np_ops["A"].tocsr()
    at_til_sp = (a_lin_sp.T - m_sp / (2.0 * DT)).tocsr()
    q_cols = sys.p_out + R_MAX + m  # the device sweep's W width
    t0 = time.time()
    lus_adi = [
        spla.splu(
            sp.bmat(
                [[at_til_sp + s * m_sp, j_sp.T], [j_sp, None]],
                format="csc",
            )
        )
        for s in sig
    ]
    t_factor_adi = time.time() - t0
    log(f"cpu ADI factors ({len(sig)} shifted saddles) {t_factor_adi:.1f}s")

    rng_adi = np.random.default_rng(1)
    w_np = rng_adi.standard_normal((n, q_cols))
    zeros_p = np.zeros((n_p, q_cols))

    def cpu_shift_solve(idx, rhs):
        sol = lus_adi[idx].solve(np.concatenate([rhs, zeros_p]))
        return sol[:n]

    adi_cpu_times = []
    for _ in range(3):  # median-of-3 (VERDICT r4 weak 2)
        t0 = time.time()
        v_it = cpu_shift_solve(0, w_np)
        for it in range(1, N_ADI):
            idx = it % len(sig)
            mv = m_sp @ v_it
            v_it = v_it - (sig[idx] + sig[idx - 1]) * cpu_shift_solve(
                idx, mv
            )
        adi_cpu_times.append(time.time() - t0)
    t_iters_adi = float(np.median(adi_cpu_times))
    # Reference amortizes the factorizations over the whole sweep.
    cpu_adi_iters_per_s = adi_iters / (
        t_factor_adi + adi_iters * (t_iters_adi / N_ADI)
    )
    log(
        f"cpu ADI baseline {t_iters_adi / N_ADI * 1e3:.1f} ms/iter -> "
        f"{cpu_adi_iters_per_s:.2f} iters/s (amortized factors)"
    )

    result = {
        "metric": "closed_loop_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / cpu_solves_per_s, 2),
        "extra": {
            "problem": f"cylinder_re{int(RE)}_ref{REFINEMENT}",
            "n_state": int(n),
            "scenarios": S_BATCH,
            "horizon_steps": NTS,
            "rollout_s": round(t_roll, 4),
            "step_solver": "fused",
            "rollout_matmul_precision": ROLLOUT_PREC,
            # measured IN-RUN against the f64 reference recurrence on
            # a scenario subsample (not a copied artifact constant)
            "rollout_precision_dev_vs_f64": dev_f64,
            "rollout_precision_f64_ref_scenarios": s_ref,
            "model_flops_per_step": int(flops_step),
            "achieved_tflops": round(achieved_tflops, 2),
            "mfu_vs_v5e_bf16_peak": round(mfu_bf16, 4),
            "mfu_vs_rollout_tier_roofline": round(mfu_tier, 4),
            "rollout_tier_roofline_tflops": round(tier_roofline, 1),
            "rollout_tier_roofline_source": roofline_src,
            "dre_cold_start_s": {
                "shifts": round(t_shifts, 1),
                # host splu build + XLA compile run CONCURRENTLY; this
                # is the combined overlapped phase
                "build_and_compile_overlapped": round(t_cachebuild, 1),
                "inverse_cache_build_host": round(t_build_host, 1),
                "xla_compile_warmup": round(t_compile, 1),
                "inverse_cache_source": "built",
                # NS device-build restart modes (measured after the
                # cold figure — tunnel compiles serialize, so they are
                # kept off the cold critical path):
                "ns_build_first_incl_compiles": round(t_ns_cold, 1),
                "ns_rebuild_warm": round(t_ns_warm, 1),
                "ns_stack_worst_residual": float(
                    max(ns_info["residuals"])
                ),
                "first_real_run": round(t_first, 1),
                "total": round(t_cold_total, 1),
                "note": (
                    "axon supports executable serialize->parse only "
                    "(no deserialize): the persistent XLA compilation "
                    "cache cannot restore compiles across processes, "
                    "so xla_compile_warmup is the irreducible "
                    "fresh-process floor; the warm NS rebuild "
                    "replaces the r4 0.5 GB disk reload (23.7 s) as "
                    "the operator-refresh restart mode"
                ),
            },
            "latency_ms_per_step_s1": round(lat_ms_per_step, 3),
            "adi_iters_per_s": round(adi_iters_per_s, 2),
            "adi_iters_per_s_spread": adi_spread,  # [worst, best] of 5
            "cpu_adi_iters_per_s": round(cpu_adi_iters_per_s, 2),
            "adi_vs_baseline": round(
                adi_iters_per_s / cpu_adi_iters_per_s, 2
            ),
            "cpu_ref_solves_per_s": round(cpu_solves_per_s, 2),
            "cpu_baseline_sampling": "median_of_3",
            "host_loadavg_1min": loadavg_1min,
            "device": str(dev.device_kind),
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
