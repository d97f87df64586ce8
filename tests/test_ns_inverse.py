"""Device-built Newton-Schulz inverse stacks (solvers/ns_inverse.py)
against the host splu oracle — the setup path of the dense ADI tier
(SURVEY.md SS3.3 shifted solves; the reference's per-shift splu)."""
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.riccati import build_dre_cache_dae_ns
from optconpy_tpu.solvers.ns_inverse import build_inverse_stack_ns
from optconpy_tpu.solvers.saddle import SaddleShiftedInverseCache


@pytest.fixture(scope="module")
def cavity():
    np_ops, sys64, cond = cavity_stokes_setup(nx=8)
    return np_ops, sys64, cond


def test_ns_stack_matches_host_splu(cavity):
    np_ops, sys64, cond = cavity
    m_sp = np_ops["M"].tocsr()
    a_sp = np_ops["A"].tocsr()
    j_sp = np_ops["J"].tocsr()
    dt = 0.02
    at_til = (a_sp.T - m_sp / (2.0 * dt)).tocsr()
    sig = np.array([-40.0, -120.0, -400.0])
    inv_stack, info = build_inverse_stack_ns(
        at_til, m_sp, j_sp, sig, dtype=jnp.float64
    )
    assert all(r < info["certify_tol"] for r in info["residuals"]), (
        info["residuals"]
    )
    ref = SaddleShiftedInverseCache.build_sparse_host(
        at_til, m_sp, j_sp, sig, dtype=np.float64
    )
    for i in range(len(sig)):
        a = np.asarray(inv_stack[i])
        b = np.asarray(ref[i])
        dev = np.abs(a - b).max() / np.abs(b).max()
        assert dev < 1e-6, (i, dev)


def test_ns_dre_cache_solves(cavity):
    """build_dre_cache_dae_ns produces a cache whose solve satisfies
    the shifted saddle system (residual oracle, SURVEY SS4)."""
    np_ops, sys64, cond = cavity
    dt = 0.02
    sig = np.array([-50.0, -200.0])
    cache, info = build_dre_cache_dae_ns(
        sys64, dt, sig, dtype=jnp.float64
    )
    m_sp = np_ops["M"].tocsr()
    a_sp = np_ops["A"].tocsr()
    j_sp = np_ops["J"].tocsr()
    at_til = (a_sp.T - m_sp / (2.0 * dt)).tocsr()
    rng = np.random.default_rng(0)
    n = a_sp.shape[0]
    rhs = rng.standard_normal((n, 3))
    for i, s in enumerate(sig):
        x = np.asarray(cache.solve(jnp.int32(i), jnp.asarray(rhs)))
        # x solves [[At+sM, J^T],[J,0]][x;p]=[rhs;0]: check the
        # projected system: J x = 0 and the momentum residual lies in
        # range(J^T) (orthogonal to ker J).
        assert np.abs(j_sp @ x).max() < 1e-8 * np.abs(x).max()
        r = (at_til + s * m_sp) @ x - rhs
        # residual must be J^T lambda: its ker-J-projection vanishes.
        # Use least squares onto J^T columns.
        lam, *_ = np.linalg.lstsq(
            j_sp.T.toarray(), r, rcond=None
        )
        assert np.abs(r - j_sp.T @ lam).max() < 1e-6 * np.abs(rhs).max()
