"""utils/ — runtime config, checkpointing, metrics, timing."""
from .runtime import setup

__all__ = ["setup"]
