"""LQR feedback + tracking feedforward application.

The reference applies time-indexed Riccati factors inside the transient
loop as u = -alpha^-1 B^T Z Z^T M v + feedforward (SURVEY.md SS3.1,
SS3.4). Here the DRE sweep already reduced factors to gains
K_k = alpha^-1 B^T X_k M, so the rollout only does tall-skinny matvecs;
the tracking feedforward w_k solves the backward affine costate system
 (M^T/dt - F_k^T) w_k = M^T w_{k+1}/dt + C^T ystar_k,  F_k = A - B K_k,
reusing ONE cached LU of (M^T/dt - A^T) with the time-varying feedback
via SMW (derivation + f64 oracle: golden/dense_lqr.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fem.operators import LTISystem
from ..ops.dense import LUSolver
from ..ops.lowrank import smw_solve


def build_costate_cache(sys: LTISystem, dt: float) -> LUSolver:
    """LU of (M^T/dt - A^T) for the backward feedforward sweep."""
    m_d, a_d = sys.dense()
    return LUSolver.factor(m_d.T / dt - a_d.T)


def build_costate_cache_dae(sys, dt: float):
    """Saddle LU of [[M^T/dt - A^T, J^T], [J, 0]]: the adjoint DAE's
    feedforward sweep (costate w also lives in ker J)."""
    from ..solvers.saddle import SaddleLU

    m_d, a_d, j_d = sys.dense()
    return SaddleLU.build(m_d.T / dt - a_d.T, j_d)


@partial(jax.jit, static_argnames=())
def feedforward_sweep(
    sys: LTISystem,
    cache: LUSolver,
    ks: jax.Array,
    ystar: jax.Array,
    dt: float,
):
    """Backward implicit-Euler tracking sweep; returns ws (nts+1, n).

    ks: (nts + 1, m, n) gains from dre_backward_sweep.
    ystar: (nts + 1, p) target outputs on the time grid.
    ws[nts] = 0 (no terminal cost).
    """
    nts = ks.shape[0] - 1
    n = sys.n
    dtype = sys.b.dtype
    ct = sys.c.T

    def step(w_next, inp):
        k_gain, ystar_k = inp
        rhs = sys.mass.matvec(w_next) / dt + ct @ ystar_k
        # (M^T/dt - A^T + K^T B^T) w = rhs  ==  (cached - U V^T) with
        # U = -K^T, V = B  (smw solves (A_c - U V^T) x = b).
        w_k = smw_solve(cache.apply, -k_gain.T, sys.b, rhs)
        return w_k, w_k

    w_terminal = jnp.zeros((n,), dtype)
    _, ws_rev = jax.lax.scan(
        step,
        w_terminal,
        (jnp.flip(ks[:-1], axis=0), jnp.flip(ystar[:-1], axis=0)),
    )
    return jnp.concatenate(
        [jnp.flip(ws_rev, axis=0), w_terminal[None]], axis=0
    )


def control_input(
    sys: LTISystem,
    alpha: float,
    k_gain: jax.Array,
    w_k: jax.Array,
    v: jax.Array,
) -> jax.Array:
    """u = -K v + (1/alpha) B^T w  (tracking-LQR input)."""
    return -(k_gain @ v) + (sys.b.T @ w_k) / alpha
