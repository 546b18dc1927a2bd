"""Compute kernels: PBC geometry, pairwise reductions, estimators."""
from . import pbc  # noqa: F401
