"""Legacy alias: the multi-rod Bloch-phonon model under its old name.

Re-exports the mrbp model API (reference keeps the same alias,
``src/phd_qmclib/multirods_qmc/bloch_phonon/__init__.py:1-9``).
"""
from ..models.mrbp import (  # noqa: F401
    CFCParams, ModelParams, OBFParams, PhysicalFuncs, Spec, StaticSpec,
    SysConfDistType, SysConfSlot, TBFParams, core_funcs, DIST_RAND,
    DIST_REGULAR,
)
from ..samplers import dmc, vmc  # noqa: F401
