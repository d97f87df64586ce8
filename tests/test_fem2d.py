"""Taylor-Hood assembly tests — exact polynomial oracles.

P2 interpolation reproduces degree-2 polynomials exactly and the
degree-5 quadrature integrates every assembled form exactly, so these
checks hold to machine precision (SURVEY.md SS4 oracle pattern).
"""
import numpy as np
import pytest

from optconpy_tpu.fem.mesh2d import unit_square_mesh, cylinder_channel_mesh
from optconpy_tpu.fem.taylor_hood import (
    TaylorHoodSpace,
    assemble_stokes,
    convection_matrices,
    convection_tensor,
)


@pytest.fixture(scope="module")
def cavity_ops():
    mesh = unit_square_mesh(8)
    space = TaylorHoodSpace.build(mesh)
    return assemble_stokes(space, nu=1.0)


def _interp_scalar(space, f):
    xy = space.dof_coords()
    return f(xy[:, 0], xy[:, 1])


def _interp_vec(space, fx, fy):
    return np.concatenate(
        [_interp_scalar(space, fx), _interp_scalar(space, fy)]
    )


def test_mass_total_area(cavity_ops):
    ms = cavity_ops["Ms"]
    ones = np.ones(ms.shape[0])
    assert abs(ones @ (ms @ ones) - 1.0) < 1e-12  # |unit square| = 1


def test_mass_quartic_exact(cavity_ops):
    # v = x^2 interpolated in P2 is exact; v^T Ms v = int x^4 = 1/5.
    space = cavity_ops["space"]
    v = _interp_scalar(space, lambda x, y: x**2)
    assert abs(v @ (cavity_ops["Ms"] @ v) - 1 / 5) < 1e-12


def test_stiffness_energy_exact(cavity_ops):
    # u = x^2 + y^2: int |grad u|^2 = int 4x^2 + 4y^2 = 8/3.
    space = cavity_ops["space"]
    u = _interp_scalar(space, lambda x, y: x**2 + y**2)
    assert abs(u @ (cavity_ops["Ks"] @ u) - 8 / 3) < 1e-12


def test_stiffness_kernel_constants(cavity_ops):
    ones = np.ones(cavity_ops["Ks"].shape[0])
    assert np.abs(cavity_ops["Ks"] @ ones).max() < 1e-12


def test_divergence_free_field(cavity_ops):
    # v = (y^2, x^2) is divergence free; J integrates div exactly.
    space = cavity_ops["space"]
    v = _interp_vec(space, lambda x, y: y**2, lambda x, y: x**2)
    assert np.abs(cavity_ops["J"] @ v).max() < 1e-12


def test_divergence_linear_field(cavity_ops):
    # v = (x, 0): div = 1; J v tested against P1 hat integrals:
    # (J v)_i = int lambda_i * 1.  Sum over i = area = 1.
    space = cavity_ops["space"]
    v = _interp_vec(space, lambda x, y: x, lambda x, y: 0 * x)
    jv = cavity_ops["J"] @ v
    assert abs(jv.sum() - 1.0) < 1e-12


def test_convection_trilinear_exact(cavity_ops):
    # v = u = w = (y^2, x^2):
    # int w . (v.grad)u = int 2x^2 y^3 + 2x^3 y^2 = 1/3.
    space = cavity_ops["space"]
    t0 = convection_tensor(cavity_ops)
    v = _interp_vec(space, lambda x, y: y**2, lambda x, y: x**2)
    ns = space.n_scalar
    v_loc = v.reshape(2, ns)[:, space.tri_dofs].transpose(1, 2, 0)
    val = np.einsum("eijkb,eia,ejb,eka->", t0, v_loc, v_loc, v_loc)
    assert abs(val - 1 / 3) < 1e-12


def test_convection_matrices_consistent(cavity_ops):
    space = cavity_ops["space"]
    rng = np.random.default_rng(3)
    ns = space.n_scalar
    vbar = rng.standard_normal(2 * ns)
    u = rng.standard_normal(2 * ns)
    l1, l2 = convection_matrices(cavity_ops, vbar)
    t0 = convection_tensor(cavity_ops)

    def nform(v, uu, w):
        vl = v.reshape(2, ns)[:, space.tri_dofs].transpose(1, 2, 0)
        ul = uu.reshape(2, ns)[:, space.tri_dofs].transpose(1, 2, 0)
        wl = w.reshape(2, ns)[:, space.tri_dofs].transpose(1, 2, 0)
        return np.einsum("eijkb,eia,ejb,eka->", t0, wl, vl, ul)

    w = rng.standard_normal(2 * ns)
    # L1 u = (vbar.grad) u ; L2 u = (u.grad) vbar
    assert abs(w @ (l1 @ u) - nform(vbar, u, w)) < 1e-9
    assert abs(w @ (l2 @ u) - nform(u, vbar, w)) < 1e-9


def test_cylinder_mesh_sane():
    mesh = cylinder_channel_mesh(refinement=1)
    assert mesh.nt > 200
    v = mesh.vertices[mesh.triangles]
    d1 = v[:, 1] - v[:, 0]
    d2 = v[:, 2] - v[:, 0]
    area = 0.5 * (d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])
    assert (area > 0).all()  # oriented, nondegenerate
    # no vertex strictly inside the cylinder
    d = np.hypot(mesh.vertices[:, 0] - 0.2, mesh.vertices[:, 1] - 0.2)
    assert (d > 0.05 * 0.99).all()
    # total mesh area ~= channel minus cylinder disc
    expected = 2.2 * 0.41 - np.pi * 0.05**2
    assert abs(area.sum() - expected) / expected < 0.02
