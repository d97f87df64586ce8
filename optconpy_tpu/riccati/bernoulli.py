"""Algebraic Bernoulli stabilization — initial gains for unstable wakes.

Above Re ~ 46 the linearized cylinder wake has unstable eigenvalues, so
Newton-Kleinman from K0 = 0 diverges (SURVEY.md SS3.3 Newton wrapper
needs a stabilizing start). Host-side setup step (Amodei-Buchot minimal
rank solution): on the reduced (ker J) system, take the real Schur
unstable left-invariant subspace  At^T Wu = Wu Tu  (Re lambda > 0,
dim k typically 2), solve the small k x k Lyapunov

    Tu^T S + S Tu = (Wu^T B/sqrt(alpha)) (.)^T,

and X0 = Wu S^{-1} Wu^T stabilizes  F = A - (1/alpha) B B^T X0 M  by
mirroring the unstable spectrum. Returns the full-space gain
K0 = (1/alpha) B~^T X0 Theta^T M for Newton-ADI warm start.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from ..golden.dae_reduce import reduce_dae


def stabilizing_gain_reduced(
    at: np.ndarray, bt: np.ndarray, alpha: float
) -> tuple[np.ndarray, int]:
    """Reduced-space Bernoulli gain K0t (m, nk); returns (K0t, n_unstable)."""
    nk = at.shape[0]
    m = bt.shape[1]
    t, u, sdim = sla.schur(
        at.T, sort=lambda re, im: re > 0, output="real"
    )
    if sdim == 0:
        return np.zeros((m, nk)), 0
    wu = u[:, :sdim]
    tu = t[:sdim, :sdim]
    bu = wu.T @ (bt / np.sqrt(alpha))
    s = sla.solve_lyapunov(tu.T, bu @ bu.T)
    x0 = wu @ np.linalg.solve(s, wu.T)
    k0t = (bt.T @ x0) / alpha
    return k0t, sdim


def stabilizing_gain_dae(np_ops: dict, alpha: float):
    """Full-space stabilizing gain for a constrained system.

    Returns (K0 (m, n) numpy, n_unstable). K0 = 0 if already stable.
    """
    red = reduce_dae(np_ops)
    k0t, n_unstable = stabilizing_gain_reduced(
        red["At"], red["Bt"], alpha
    )
    k0 = k0t @ red["theta"].T @ red["M_full"]
    return k0, n_unstable
