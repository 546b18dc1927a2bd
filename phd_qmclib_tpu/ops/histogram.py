"""Per-walker position histogram without the (W, N, bins) intermediate.

The DMC density estimator needs ``hist[w, b] = #{i : bin(z_wi) = b}``
per step.  An XLA scatter costs as much as the whole pairwise pass
(15 ms at 17k x 128 on v5e — rejected round 1); the one-hot
compare-and-reduce (``(bins[:, :, None] == iota).sum(axis=1)``) fuses
the compute but XLA materializes the ``(W, N, B)`` broadcast —
1.1 GB of HBM traffic at the production shape, ~4 ms, again as much
as the pairwise physics.

This Pallas kernel keeps everything in VMEM: a ``(TW, N)`` position
tile is binned once, then the ``B`` bin-columns are compare-reduced
in-register into a ``(TW, B)`` output tile.  HBM traffic is one read
of the positions and one write of the histogram (~18 MB total at the
production shape vs 2.2+ GB).

STATUS: validated but REJECTED for the sampler hot path (round 3,
same story as ``ops/pairwise.py``).  In isolation the kernel wins —
its compute hides entirely in the 33 ms dispatch roundtrip while the
one-hot formulation shows ~3.7 ms — but inside the DMC estimator scan
the ``pallas_call`` custom call breaks XLA's fusion of the
surrounding estimator graph and the end-to-end step REGRESSES:
estimators-on K=1 2.28M -> 1.50M ws/s, K=8 3.16M -> 2.85M
(same-session A/B via git stash, v5e, N=128, 17408 walkers).  The
sampler keeps the fused one-hot (``samplers/dmc.py``); this module
stays as the measured dead end + a bit-exactness harness.

Counts are exact small integers, so the f32 outputs are BIT-IDENTICAL
to the one-hot path on hardware (verified on v5e; asserted in
``tests/ops/test_histogram.py`` in interpret mode).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["walker_histogram", "walker_histogram_onehot", "available"]


def walker_histogram_onehot(pos, bin_size, num_bins: int):
    """Reference formulation: fused one-hot compare-and-reduce
    (the round-1 winner over XLA scatter; materializes ``(W, N, B)``)."""
    bins = jnp.clip((pos // bin_size).astype(jnp.int32), 0, num_bins - 1)
    bin_ids = jnp.arange(num_bins, dtype=jnp.int32)
    onehot = (bins[:, :, None] == bin_ids).astype(pos.dtype)
    return onehot.sum(axis=1)


def _hist_kernel(pos_ref, scale_ref, out_ref, *, num_bins: int,
                 col_tile: int):
    pos = pos_ref[...]
    bin_size = scale_ref[0, 0]
    # floor(z / bin_size), matching the one-hot path's ``//`` exactly
    # (a multiply-by-reciprocal can differ by an ulp AT a bin edge).
    bins = jnp.clip(jnp.floor(pos / bin_size).astype(jnp.int32),
                    0, num_bins - 1)
    # Compare-reduce the bin ids against ``col_tile`` bin columns at a
    # time: (TW, N, col_tile) stays register/VMEM resident.
    for b0 in range(0, num_bins, col_tile):
        ct = min(col_tile, num_bins - b0)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ct), 2) + b0
        block = (bins[:, :, None] == ids).astype(out_ref.dtype)
        out_ref[:, b0:b0 + ct] = block.sum(axis=1)


@functools.partial(jax.jit,
                   static_argnames=("num_bins", "tw", "col_tile",
                                    "interpret"))
def walker_histogram_pallas(pos, bin_size, num_bins: int, tw: int = 128,
                            col_tile: int = 8, interpret: bool = False):
    """``(W, num_bins)`` per-walker histogram of ``pos (W, N)``.

    ``bin_size`` may be a traced scalar (the supercell over the bin
    count); bin assignment matches ``floor(z / bin_size)`` exactly for
    the in-range positions the sampler guarantees (recast keeps
    ``z in [0, L)``).
    """
    w, n = pos.shape
    tw = min(tw, w)
    while w % tw:
        tw -= 1
    bs = jnp.asarray(bin_size, dtype=pos.dtype).reshape(1, 1)
    kernel = functools.partial(_hist_kernel, num_bins=num_bins,
                               col_tile=min(col_tile, num_bins))
    return pl.pallas_call(
        kernel,
        grid=(w // tw,),
        in_specs=[
            pl.BlockSpec((tw, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((w, num_bins), pos.dtype),
        out_specs=pl.BlockSpec((tw, num_bins), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pos, bs)


def walker_histogram(pos, bin_size, num_bins: int):
    """Platform dispatch: Pallas on TPU f32, fused one-hot elsewhere."""
    if available() and pos.dtype == jnp.float32:
        return walker_histogram_pallas(pos, bin_size, num_bins)
    return walker_histogram_onehot(pos, bin_size, num_bins)


def available() -> bool:
    return jax.default_backend() not in ("cpu",)
