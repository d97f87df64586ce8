"""models/ — benchmark problem setups (cavity, cylinder wake, heat)."""
from .cavity import cavity_stokes_setup

__all__ = ["cavity_stokes_setup"]
