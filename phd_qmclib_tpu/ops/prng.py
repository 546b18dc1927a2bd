"""Hardware-PRNG Gaussian noise for the DMC diffusion step.

The diffusion move needs one standard normal per (walker, particle) per
step.  The XLA path (threefry ``jax.random.normal``) costs ~1.7 ms at
17408 x 128 on v5e - and ~85% of that is threefry BIT GENERATION, not
the normal transform.  The TPU's hardware PRNG generates bits ~for free
inside a Pallas kernel; Box-Muller with a reduced-range polynomial
cosine turns them into exact normals (24-bit uniforms, the same
granularity ``jax.random`` uses for f32).

The stream differs from threefry's (statistically equivalent, exact
Gaussian); the sampler uses this path only on TPU f32 production runs -
CPU tests keep the threefry stream and their golden seeds.

Seeding: per (step key, shard) so streams decorrelate across steps,
blocks and mesh shards exactly like the threefry path.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import trig

__all__ = ["normal_pallas", "available"]

# Single-source coefficient tuples (ops/trig.py); this kernel folds to
# quarter-wave so it evaluates sin and cos separately.
_SIN_COEFFS = trig.SIN_COEFFS
_COS_COEFFS = trig.COS_COEFFS


def _cos_poly(arg):
    """cos(arg) for arg in [0, pi/2] (quarter-wave polynomial)."""
    z2 = arg * arg
    acc = jnp.float32(_COS_COEFFS[-1])
    for k in range(len(_COS_COEFFS) - 2, -1, -1):
        acc = acc * z2 + jnp.float32(_COS_COEFFS[k])
    return acc


def _cos2pi(u):
    """cos(2 pi u) for u in [0, 1) via quarter-wave folding."""
    a = 2.0 * u
    b = a - 2.0 * jnp.round(0.5 * a)     # in [-1, 1], cos(pi b) = cos(2pi u)
    c = jnp.abs(b)                       # cos even
    flip = c > 0.5
    arg = jnp.pi * jnp.where(flip, 1.0 - c, c)
    val = _cos_poly(arg)
    return jnp.where(flip, -val, val)


def _sin_poly(arg):
    """sin(arg) for arg in [0, pi/2]."""
    z2 = arg * arg
    acc = jnp.float32(_SIN_COEFFS[-1])
    for k in range(len(_SIN_COEFFS) - 2, -1, -1):
        acc = acc * z2 + jnp.float32(_SIN_COEFFS[k])
    return arg * acc


def _normals_kernel(seed_ref, out_ref, *, tw: int, cols: int):
    """Full Box-Muller: each (u1, u2) pair yields TWO independent
    normals (r cos, r sin), halving both the PRNG draws (the measured
    bottleneck) and the log evaluations."""
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * 104729)
    half = tw // 2

    def uniform24():
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((half, cols)), jnp.uint32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 24))

    u1 = uniform24() + (1.0 / (1 << 24))   # (0, 1]
    u2 = uniform24()                        # [0, 1)
    radius = jnp.sqrt(-2.0 * jnp.log(u1))
    # Quarter-wave folding: cos(2 pi u) = +-cospoly, sin likewise.
    a = 2.0 * u2
    b = a - 2.0 * jnp.round(0.5 * a)       # in [-1, 1]
    c = jnp.abs(b)
    flip = c > 0.5
    arg = jnp.pi * jnp.where(flip, 1.0 - c, c)
    cosv = jnp.where(flip, -1.0, 1.0) * _cos_poly(arg)
    sinv = jnp.where(b >= 0, 1.0, -1.0) * _sin_poly(arg)
    out_ref[0:half, :] = radius * cosv
    out_ref[half:tw, :] = radius * sinv


@functools.partial(jax.jit, static_argnames=("shape", "tw", "interpret"))
def normal_pallas(seed, shape, tw: int = 1088, interpret: bool = False):
    """Standard normals of ``shape (W, N)`` from the TPU hardware PRNG.

    ``seed`` is an int32 scalar (derive it from the step key so streams
    decorrelate across steps/shards).  ``W`` must be even;
    ``N`` should be lane-friendly (128).
    """
    w, n = shape
    if w % 2:
        raise ValueError(f"W must be even, got {w}")
    tw = min(tw, w)
    while w % tw or tw % 2:
        tw -= 1
    kernel = functools.partial(_normals_kernel, tw=tw, cols=n)
    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(w // tw,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct((w, n), jnp.float32),
        out_specs=pl.BlockSpec((tw, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed_arr)


def available() -> bool:
    """Hardware-PRNG path available (TPU-family backend)."""
    return jax.default_backend() not in ("cpu",)
