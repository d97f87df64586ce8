"""Nonlinear NSE transient rollout — IMEX stepping with feedback.

The reference's solve_nse loop (SURVEY.md SS3.4): one cached saddle
factorization of the implicit block [[M/dt - A, J^T], [J, 0]], explicit
convection via get_convvec, feedback gains applied as tall-skinny
matvecs inside the loop. TPU design: lax.scan over steps, device-side
convection (fem/device_conv.py), batched scenarios via vmap (the
'closed-loop MPC solves/s/chip' kernel, BASELINE.md).

State convention: v is the FREE-dof velocity (Dirichlet values live in
the ConvKernel); the feedback regulates the perturbation from the
linearization point vbar:  u_k = -K_k (v_k - vbar) + (1/alpha) B^T w_k.

Step (IMEX implicit Euler; A is the STOKES part, convection explicit):
  [[M/dt - A, J^T], [J, 0]] [v+; p] = [M v_k/dt - N(v_k)v_k + B u_k + fv; fp]
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fem.device_conv import ConvKernel
from ..solvers.saddle import SaddleLU


def build_nse_step_cache(
    m_dense: jax.Array,
    a_stokes_dense: jax.Array,
    j_dense: jax.Array,
    dt: float,
) -> SaddleLU:
    """Saddle LU of the IMEX implicit block (Stokes part only)."""
    return SaddleLU.build(m_dense / dt - a_stokes_dense, j_dense)


@partial(jax.jit, static_argnames=())
def nse_closed_loop_rollout(
    sys,
    conv: ConvKernel,
    cache: SaddleLU,
    ks: jax.Array,
    ws: jax.Array,
    vbar: jax.Array,
    v0: jax.Array,
    alpha: float,
    dt: float,
    fv: jax.Array,
    fp: jax.Array,
):
    """Nonlinear closed loop; returns (vs, us, ys).

    sys: DAESystem whose stiff is the LINEARIZED operator (for gains);
         mass/b/c are shared with the nonlinear plant.
    cache: IMEX implicit block with the STOKES operator.
    ks: (nts+1, m, n); ws: (nts+1, n); vbar: (n,) linearization point;
    v0: (n,) initial state; fv, fp: constant rhs (BC contributions).
    """
    bt = sys.b.T

    def step(v, inp):
        k_gain, w_k = inp
        u = -(k_gain @ (v - vbar)) + (bt @ w_k) / alpha
        conv_v = conv.conv_inner(v)
        rhs_v = sys.mass.matvec(v) / dt - conv_v + sys.b @ u + fv
        v_next = cache.apply(rhs_v, fp)
        return v_next, (v_next, u)

    _, (vs_tail, us) = jax.lax.scan(step, v0, (ks[:-1], ws[:-1]))
    vs = jnp.concatenate([v0[None], vs_tail], axis=0)
    ys = vs @ sys.c.T
    return vs, us, ys


def batched_nse_closed_loop(
    sys,
    conv: ConvKernel,
    cache: SaddleLU,
    ks: jax.Array,
    ws: jax.Array,
    vbar: jax.Array,
    v0_batch: jax.Array,
    alpha: float,
    dt: float,
    fv: jax.Array,
    fp: jax.Array,
):
    """vmap over scenario initial states v0_batch (S, n)."""
    return jax.vmap(
        lambda v0: nse_closed_loop_rollout(
            sys, conv, cache, ks, ws, vbar, v0, alpha, dt, fv, fp
        )
    )(v0_batch)
