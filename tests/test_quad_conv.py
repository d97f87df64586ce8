"""Quadrature-interpolation convection kernel (fem/device_conv.py
QuadConvKernel): must reproduce the per-element tensor ConvKernel to
roundoff — same degree-5 rule, restructured as 4 large SpMMs for the
MXU (the tensor contraction was measured at <3% MXU utilization and
dominated the fused bench step).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optconpy_tpu.fem.device_conv import ConvKernel, QuadConvKernel
from optconpy_tpu.models import cavity_stokes_setup
from optconpy_tpu.solvers.steady import solve_steady_nse_host


@pytest.fixture(scope="module")
def kernels():
    np_ops, sys, cond = cavity_stokes_setup(nx=6)
    np_ops["vbar_full"], _ = solve_steady_nse_host(np_ops["full"], cond)
    ref = ConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    quad = QuadConvKernel.build(
        np_ops["full"], cond, dtype=jnp.float64, kind="ell"
    )
    return np_ops, cond, ref, quad


def test_quad_conv_matches_tensor_single(kernels):
    np_ops, cond, ref, quad = kernels
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        cond.restrict(np_ops["vbar_full"])
        + 0.1 * rng.standard_normal(ref.n_free)
    )
    a = np.asarray(ref.conv_inner(v))
    b = np.asarray(quad.conv_inner(v))
    assert np.abs(a - b).max() < 1e-12 * max(np.abs(a).max(), 1), (
        np.abs(a - b).max()
    )


def test_quad_conv_matches_tensor_batch(kernels):
    np_ops, cond, ref, quad = kernels
    rng = np.random.default_rng(1)
    vb = jnp.asarray(
        cond.restrict(np_ops["vbar_full"])[None]
        + 0.1 * rng.standard_normal((5, ref.n_free))
    )
    a = np.asarray(ref.conv_inner_batch(vb))
    b = np.asarray(quad.conv_inner_batch(vb))
    assert np.abs(a - b).max() < 1e-12 * max(np.abs(a).max(), 1)


def test_pallas_conv_kernel_interpret(kernels):
    """The fused Pallas element kernel (ops/pallas_conv.py) matches
    the ConvKernel math in interpreter mode (f32, small batch)."""
    from optconpy_tpu.ops.pallas_conv import (
        conv_full_batch_pallas,
        pack_conv_tensor,
        pad_dofs,
        remap_scatter_slots,
    )

    np_ops, cond, ref64, _ = kernels
    ref = ref64.astype(jnp.float32)
    nt = ref.tri_dofs.shape[0]
    t0p, nt_pad = pack_conv_tensor(np.asarray(ref.t0, np.float32), 32)
    dofs = pad_dofs(np.asarray(ref.tri_dofs), nt_pad)
    slots = remap_scatter_slots(
        np.asarray(ref.scatter_slots), nt, nt_pad
    )
    rng = np.random.default_rng(3)
    b = 4
    v_full_t = jnp.asarray(
        rng.standard_normal((2 * ref.ns, b)), jnp.float32
    )
    out_ref = np.asarray(ref.conv_full_batch(v_full_t))
    out_pl = np.asarray(
        conv_full_batch_pallas(
            v_full_t, jnp.asarray(t0p), jnp.asarray(dofs),
            jnp.asarray(slots), ns=ref.ns, e_block=32, b_tile=128,
            interpret=True,
        )
    )
    rel = np.abs(out_pl - out_ref).max() / max(np.abs(out_ref).max(), 1)
    assert rel < 1e-5, rel


def test_fused_conv_kernel_delegates_off_tpu(kernels):
    """FusedConvKernel == ConvKernel on the CPU backend (delegation)."""
    from optconpy_tpu.fem.device_conv import FusedConvKernel

    np_ops, cond, ref64, _ = kernels
    fk = FusedConvKernel.build(np_ops["full"], cond, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    vb = jnp.asarray(rng.standard_normal((3, ref64.n_free)))
    a = np.asarray(ref64.conv_inner_batch(vb))
    b = np.asarray(fk.conv_inner_batch(vb))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-12)
    v1 = jnp.asarray(rng.standard_normal(ref64.n_free))
    np.testing.assert_allclose(
        np.asarray(fk.conv_inner(v1)),
        np.asarray(ref64.conv_inner(v1)), rtol=0, atol=1e-12,
    )


def test_quad_conv_in_fused_rollout(kernels):
    """Swapping the kernel inside the fused closed loop changes
    nothing (beyond roundoff) — the bench path contract."""
    from optconpy_tpu.mpc.nse_rollout import (
        batched_nse_closed_loop_fused,
        build_nse_fused,
    )

    np_ops, cond, ref, quad = kernels
    import optconpy_tpu.models as _m

    # rebuild a DAE system for the rollout signature
    from optconpy_tpu.fem.dae import dae_from_scipy

    sys = dae_from_scipy(
        np_ops["M"], np_ops["A"], np_ops["J"], np_ops["B"], np_ops["C"]
    ).astype(jnp.float64)
    dt, nts, s = 0.02, 5, 3
    cache = build_nse_fused(np_ops, cond, dt, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    n, m = sys.b.shape
    v0 = jnp.asarray(
        np.asarray(cache.vbar)[None] + 1e-2 * rng.standard_normal((s, n))
    )
    ks = jnp.asarray(1e-3 * rng.standard_normal((nts + 1, m, n)))
    ws = jnp.zeros((nts + 1, n))
    va, _, _ = batched_nse_closed_loop_fused(
        sys, ref, cache, ks, ws, v0, 1e-2
    )
    vb, _, _ = batched_nse_closed_loop_fused(
        sys, quad, cache, ks, ws, v0, 1e-2
    )
    va, vb = np.asarray(va), np.asarray(vb)
    assert np.abs(va - vb).max() < 1e-11 * max(np.abs(va).max(), 1)
