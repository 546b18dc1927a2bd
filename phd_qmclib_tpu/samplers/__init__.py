"""Monte Carlo samplers: VMC (Metropolis) and DMC (drift-diffusion)."""
from . import vmc  # noqa: F401
