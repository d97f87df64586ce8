"""Driven-cavity problem setup — acceptance config 2 (BASELINE.md).

Parity with the reference's drivcav_fems/get_sysmats (SURVEY.md SS2
row 2): unit-square Taylor-Hood discretization, no-slip walls, moving
lid (u_x = lid_speed at y = 1), distributed control + observation
boxes. Produces the condensed index-2 DAE operators as a DAESystem
pytree plus the host-side scipy dict for golden computations.
"""
from __future__ import annotations

import numpy as np

from ..fem.condense import BCCondenser
from ..fem.contobs import get_inp_opa, get_mout_opa
from ..fem.dae import DAESystem, dae_from_scipy
from ..fem.mesh2d import unit_square_mesh
from ..fem.taylor_hood import TaylorHoodSpace, assemble_stokes


def cavity_stokes_setup(
    nx: int = 10,
    nu: float = 1.0,
    lid_speed: float = 1.0,
    control_boxes=((0.1, 0.4, 0.0, 0.2), (0.6, 0.9, 0.0, 0.2)),
    obs_box=(0.25, 0.75, 0.4, 0.6),
):
    """Assemble the condensed Stokes cavity control problem.

    Returns (np_ops, dae_system, condenser): np_ops holds the scipy
    inner matrices {M, A, J, B, C, fv, fp} used by golden paths.
    """
    mesh = unit_square_mesh(nx)
    space = TaylorHoodSpace.build(mesh)
    ops = assemble_stokes(space, nu=nu)
    ns = space.n_scalar
    coords = space.dof_coords()  # (ns, 2)

    on_bnd = (
        (coords[:, 0] < 1e-12)
        | (coords[:, 0] > 1 - 1e-12)
        | (coords[:, 1] < 1e-12)
        | (coords[:, 1] > 1 - 1e-12)
    )
    # Velocity dof layout: [u_x scalar dofs | u_y scalar dofs].
    mask = np.concatenate([on_bnd, on_bnd])
    g = np.zeros(2 * ns)
    lid = on_bnd & (coords[:, 1] > 1 - 1e-12)
    g[:ns][lid] = lid_speed  # u_x = lid_speed on the lid ("leaky" corners)

    cond = BCCondenser.build(2 * ns, mask, g, n_press=mesh.nv)

    a_i = cond.mat_inner(ops["A"])
    m_i = cond.mat_inner(ops["M"])
    j_i = cond.jmat_inner(ops["J"])
    fv = cond.mat_bc_rhs(ops["A"])  # momentum BC contribution
    fp = cond.jmat_bc_rhs(ops["J"])  # continuity BC contribution

    b_full = get_inp_opa(space, control_boxes)
    c_full = get_mout_opa(space, (obs_box,))
    b_i = b_full[cond.free]
    c_i = c_full[:, cond.free]

    np_ops = {
        "M": m_i,
        "A": a_i,
        "J": j_i,
        "B": b_i,
        "C": c_i,
        "fv": fv,
        "fp": fp,
        "space": space,
        "cond": cond,
        "full": ops,
    }
    sys = dae_from_scipy(m_i, a_i, j_i, b_i, c_i, fv=fv)
    return np_ops, sys, cond
