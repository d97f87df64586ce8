"""Reduced-space golden for constrained (index-2 DAE) LQR problems.

Oracle strategy: on the host, build an M-orthonormal dense basis Theta
of ker J (never done on device — the device keeps the constraint via
saddle solves). In Theta coordinates the DAE becomes an unconstrained
ODE with identity mass:

    q' = At q + Bt u,   y = Ct q,   v = Theta q,  q = Theta^T M v,

and every dense f64 golden from golden/dense_lqr.py applies. The
projected low-rank solvers on device must reproduce the mapped gains
K = (1/alpha) Bt^T Xt Theta^T M to <= 1e-4 (BASELINE.md fidelity).
"""
from __future__ import annotations

import numpy as np


def nullspace_basis(j_sp, m_sp) -> np.ndarray:
    """M-orthonormal basis Theta (n, n - np) of ker J (dense, host)."""
    j = j_sp.toarray() if hasattr(j_sp, "toarray") else np.asarray(j_sp)
    m = m_sp.toarray() if hasattr(m_sp, "toarray") else np.asarray(m_sp)
    _, s, vt = np.linalg.svd(j, full_matrices=True)
    rank = int((s > s[0] * 1e-10).sum()) if len(s) else 0
    theta0 = vt[rank:].T  # orthonormal kernel basis (n, n-rank)
    gram = theta0.T @ m @ theta0
    ell = np.linalg.cholesky(gram)
    return theta0 @ np.linalg.inv(ell).T  # Theta^T M Theta = I


def reduce_dae(np_ops: dict):
    """Project (M, A, J, B, C) onto ker J; returns dict of dense ops."""
    theta = nullspace_basis(np_ops["J"], np_ops["M"])
    a = np_ops["A"].toarray() if hasattr(np_ops["A"], "toarray") else np_ops["A"]
    m = np_ops["M"].toarray() if hasattr(np_ops["M"], "toarray") else np_ops["M"]
    return {
        "theta": theta,
        "Mt": np.eye(theta.shape[1]),
        "At": theta.T @ a @ theta,
        "Bt": theta.T @ np.asarray(np_ops["B"]),
        "Ct": np.asarray(np_ops["C"]) @ theta,
        "M_full": m,
    }


def lift_gain(red: dict, xt: np.ndarray, alpha: float) -> np.ndarray:
    """Full-space gain K = (1/alpha) Bt^T Xt Theta^T M."""
    return (red["Bt"].T @ xt @ red["theta"].T @ red["M_full"]) / alpha


def lift_x(red: dict, xt: np.ndarray) -> np.ndarray:
    """Full-space projected Riccati solution X = Theta Xt Theta^T."""
    return red["theta"] @ xt @ red["theta"].T
