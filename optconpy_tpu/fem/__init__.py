"""fem/ — offline CPU discretization producing frozen operator pytrees."""
from .operators import LTISystem, lti_from_scipy
from .heat1d import heat1d_operators, initial_state

__all__ = [
    "LTISystem",
    "lti_from_scipy",
    "heat1d_operators",
    "initial_state",
]
