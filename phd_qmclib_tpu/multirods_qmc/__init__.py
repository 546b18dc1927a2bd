"""Legacy alias package (reference:
``src/phd_qmclib/multirods_qmc/bloch_phonon/__init__.py:1-9``)."""
from . import bloch_phonon  # noqa: F401
