"""fem/ — offline CPU discretization producing frozen operator pytrees."""
from .operators import LTISystem, lti_from_scipy
from .heat1d import heat1d_operators, initial_state
from .dae import DAESystem, dae_from_scipy
from .condense import BCCondenser
from .mesh2d import TriMesh, unit_square_mesh, cylinder_channel_mesh
from .taylor_hood import (
    TaylorHoodSpace,
    assemble_stokes,
    convection_tensor,
    convection_matrices,
)
from .contobs import get_inp_opa, get_mout_opa

__all__ = [
    "LTISystem",
    "lti_from_scipy",
    "heat1d_operators",
    "initial_state",
    "DAESystem",
    "dae_from_scipy",
    "BCCondenser",
    "TriMesh",
    "unit_square_mesh",
    "cylinder_channel_mesh",
    "TaylorHoodSpace",
    "assemble_stokes",
    "convection_tensor",
    "convection_matrices",
    "get_inp_opa",
    "get_mout_opa",
]
