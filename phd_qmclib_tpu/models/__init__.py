"""QMC model layer: generic Bijl-Jastrow machinery and concrete models."""
from . import jastrow, mrbp  # noqa: F401
