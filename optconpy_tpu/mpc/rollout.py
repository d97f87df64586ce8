"""Closed-loop transient rollouts under lax.scan.

The reference's solve_nse loop (SURVEY.md SS3.4): factor the implicit
system once, then per step apply feedback (tall-skinny matvecs) and one
cached triangular solve. Here the linear (LTI / Oseen-linearized)
rollout is a lax.scan whose body is two dense triangular solves on the
MXU; scenarios batch via vmap over the initial state / targets, which
is what "closed-loop MPC solves/s/chip" measures (BASELINE.md).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fem.operators import LTISystem
from ..ops.dense import LUSolver


def build_step_cache(sys: LTISystem, dt: float) -> LUSolver:
    """LU of the implicit-Euler system (M/dt - A), factored once."""
    m_d, a_d = sys.dense()
    return LUSolver.factor(m_d / dt - a_d)


def build_step_cache_dae(sys, dt: float):
    """Saddle LU of [[M/dt - A, J^T], [J, 0]] for constrained rollouts.

    SaddleLU.apply returns the velocity block, so closed_loop_rollout
    works unchanged for DAE systems (iterates stay in ker J).
    """
    from ..solvers.saddle import SaddleLU

    m_d, a_d, j_d = sys.dense()
    return SaddleLU.build(m_d / dt - a_d, j_d)


@partial(jax.jit, static_argnames=("feedback",))
def closed_loop_rollout(
    sys: LTISystem,
    cache: LUSolver,
    ks: jax.Array,
    ws: jax.Array,
    v0: jax.Array,
    alpha: float,
    dt: float,
    feedback: str = "explicit",
):
    """Implicit-Euler forward closed loop; returns (vs, us, ys).

    ks: (nts + 1, m, n) gains; ws: (nts + 1, n) feedforward states;
    v0: (n,) initial state.

    feedback='explicit' (matches golden_closed_loop step-for-step):
      u_k = -K_k v_k + (1/alpha) B^T w_k
      (M/dt - A) v_{k+1} = M v_k / dt + B u_k
    feedback='implicit' (robust for cheap-control gains whose
    closed-loop poles exceed 1/dt — the explicit loop then diverges):
      (M/dt - A + B K_k) v_{k+1} = M v_k/dt + (1/alpha) B B^T w_k
      u_k = -K_k v_{k+1} + (1/alpha) B^T w_k
    implemented via SMW on the SAME cached LU (the reference's
    solve_sadpnt_smw pattern, SURVEY.md SS2 row 5): G = (M/dt - A)^-1 B
    is constant, so each step adds only an (m, m) solve.
    """
    bt = sys.b.T

    if feedback == "implicit":
        gmat = cache.apply(sys.b)  # (n, m), hoisted out of the scan
        eye_m = jnp.eye(sys.m_in, dtype=gmat.dtype)

        def step(v, inp):
            k_gain, w_k = inp
            uff = (bt @ w_k) / alpha
            rhs = sys.mass.matvec(v) / dt + sys.b @ uff
            x0 = cache.apply(rhs)
            s_small = eye_m + k_gain @ gmat
            corr = jnp.linalg.solve(s_small, k_gain @ x0)
            v_next = x0 - gmat @ corr
            u = -(k_gain @ v_next) + uff
            return v_next, (v_next, u)

    else:

        def step(v, inp):
            k_gain, w_k = inp
            u = -(k_gain @ v) + (bt @ w_k) / alpha
            rhs = sys.mass.matvec(v) / dt + sys.b @ u
            v_next = cache.apply(rhs)
            return v_next, (v_next, u)

    _, (vs_tail, us) = jax.lax.scan(step, v0, (ks[:-1], ws[:-1]))
    vs = jnp.concatenate([v0[None], vs_tail], axis=0)
    ys = vs @ sys.c.T
    return vs, us, ys


def batched_closed_loop(
    sys: LTISystem,
    cache: LUSolver,
    ks: jax.Array,
    ws: jax.Array,
    v0_batch: jax.Array,
    alpha: float,
    dt: float,
    feedback: str = "explicit",
):
    """vmap over a scenario batch of initial states: v0_batch (S, n).

    Gains/feedforward are shared (same linearization) — the batched MPC
    inner kernel; sharding of the S axis lives in parallel/.
    """
    return jax.vmap(
        lambda v0: closed_loop_rollout(
            sys, cache, ks, ws, v0, alpha, dt, feedback
        )
    )(v0_batch)
