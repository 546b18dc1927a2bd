"""Multi-chip scaling: device meshes and sharded walker ensembles."""
from .mesh import make_walker_mesh  # noqa: F401
from .sweep import ParamSweep  # noqa: F401
