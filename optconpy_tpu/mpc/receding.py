"""Receding-horizon MPC — config 4 (BASELINE.md).

The reference's implied loop (SURVEY.md SS1 item 4): at each macro step,
re-linearize the NSE about the current nominal state, update the
Riccati gains over the prediction horizon (warm-started from the
previous macro step), roll the scenario batch forward under the new
feedback, shift the horizon. The TPU redesign keeps the whole inner
machinery jitted (device re-linearization via ConvKernel.linearized_dense,
DRE sweep, batched rollouts); the macro loop is a short Python loop
because each iteration rebuilds factorizations (new linearization =>
new LUs) — the honest cost structure of nonlinear MPC.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.device_conv import ConvKernel
from ..solvers.saddle import SaddleLU, SaddleShiftedLUCache
from ..riccati.dre import dre_backward_sweep
from .nse_rollout import NSEStepCache, batched_nse_closed_loop


@dataclass(frozen=True)
class RHConfig:
    """Receding-horizon shape: predict `horizon` steps, apply `apply`."""

    horizon: int = 16  # DRE prediction steps per macro step
    apply: int = 8  # plant steps applied before re-linearizing
    dt: float = 0.01
    alpha: float = 1e-4
    n_newton: int = 1
    r_max: int = 32
    relinearize: bool = True


def _rebuild_caches(
    m_d, a_stokes_d, j_d, conv: ConvKernel, cond_free, vnom_free,
    dir_values, cfg: RHConfig, sig, dtype,
):
    """Device-side re-linearization + factorization for one macro step.

    Returns (stepper_lu, l1_inner, dre_cache) built about vnom:
      stepper: [[M/dt - A_stokes + L1(vnom), J^T], [J, 0]]
      gains:   Atil = (A_stokes - L1 - L2)(vnom) - M/(2 dt)
    """
    vnom_full = dir_values.at[cond_free].set(vnom_free)
    l1l2 = conv.linearized_dense(vnom_full, include_l2=True)
    l1 = conv.linearized_dense(vnom_full, include_l2=False)
    l1_i = l1[cond_free][:, cond_free]
    l1l2_i = l1l2[cond_free][:, cond_free]

    stepper_lu = SaddleLU.build(
        m_d / cfg.dt - a_stokes_d + l1_i, j_d
    )
    a_lin = a_stokes_d - l1l2_i
    at_til = a_lin.T - m_d / (2.0 * cfg.dt)
    dre_cache = SaddleShiftedLUCache.build(
        at_til, m_d, j_d, jnp.asarray(sig, dtype)
    )
    return stepper_lu, l1_i, dre_cache


def receding_horizon_mpc(
    sys,
    conv: ConvKernel,
    np_ops: dict,
    cond,
    cfg: RHConfig,
    sig: np.ndarray,
    sigma_seq: np.ndarray,
    idx_seq: np.ndarray,
    v0_batch: jax.Array,
    n_macro: int,
    metrics=None,
):
    """Run n_macro receding-horizon macro steps; returns dict of
    trajectories (vs (S, n_macro*apply+1, n)), inputs, gains history.

    sys: DAESystem at the INITIAL linearization (mass/b/c reused; the
    stiff part is re-linearized on device each macro step).
    """
    dtype = sys.b.dtype
    n, m = sys.b.shape
    m_d, _, j_d = sys.dense()
    a_stokes_d = jnp.asarray(
        cond.mat_inner(np_ops["full"]["A"]).toarray(), dtype
    )
    fv = jnp.asarray(cond.mat_bc_rhs(np_ops["full"]["A"]), dtype)
    fp = jnp.asarray(cond.jmat_bc_rhs(np_ops["full"]["J"]), dtype)
    cond_free = jnp.asarray(cond.free, jnp.int32)
    vbar0 = jnp.asarray(cond.restrict(np_ops["vbar_full"]), dtype)

    v_batch = jnp.asarray(v0_batch, dtype)
    k_prev = jnp.zeros((m, n), dtype)
    vs_hist = [v_batch]
    us_hist = []
    ks_hist = []
    vnom = vbar0

    for macro in range(n_macro):
        # vnom is ONLY the linearization point for the operators; the
        # feedback setpoint stays the target vbar0 — regulating to the
        # moving batch mean would pin the batch wherever it happens to
        # be (cheap-control gains enforce the setpoint aggressively).
        if cfg.relinearize:
            vnom = jnp.mean(v_batch, axis=0)
        stepper_lu, l1_i, dre_cache = _rebuild_caches(
            m_d, a_stokes_d, j_d, conv, cond_free, vnom,
            conv.dir_values, cfg, sig, dtype,
        )
        zs, ks = dre_backward_sweep(
            sys, dre_cache, cfg.alpha, cfg.dt, cfg.horizon,
            jnp.asarray(sigma_seq, dtype), jnp.asarray(idx_seq),
            n_newton=cfg.n_newton, r_max=cfg.r_max, k_init=k_prev,
        )
        k_now = ks[0]
        k_prev = k_now
        ks_hist.append(k_now)

        cache = NSEStepCache(
            lu=stepper_lu, l1_imp=l1_i, fv=fv, fp=fp, vbar=vbar0
        )
        ks_roll = jnp.broadcast_to(k_now, (cfg.apply + 1, m, n))
        ws = jnp.zeros((cfg.apply + 1, n), dtype)
        vs, us, _ = batched_nse_closed_loop(
            sys, conv, cache, ks_roll, ws, v_batch, cfg.alpha, cfg.dt,
            feedback="implicit",
        )
        v_batch = vs[:, -1]
        vs_hist.append(vs[:, 1:])
        us_hist.append(us)
        if metrics is not None:
            metrics.log(
                "mpc_macro_step",
                step=macro,
                max_gain=float(jnp.abs(k_now).max()),
                mean_state_norm=float(
                    jnp.linalg.norm(v_batch - vnom[None], axis=1).mean()
                ),
            )

    vs_all = jnp.concatenate(
        [vs_hist[0][:, None, :]] + vs_hist[1:], axis=1
    )
    us_all = jnp.concatenate(us_hist, axis=1)
    return {
        "vs": vs_all,
        "us": us_all,
        "ks": jnp.stack(ks_hist),
        "v_final": v_batch,
    }
