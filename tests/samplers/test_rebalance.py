"""Periodic shard rebalancing for long multi-chip runs.

Per-shard branching makes shard populations random-walk; rebalancing
packs the valid walkers and deals them round-robin across the shard
slices (docs/DESIGN.md section 4).  These tests drive an artificially
imbalanced ensemble and show (a) exact recovery of balance with the
walker multiset preserved, and (b) no statistical bias in the sampled
energy.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc


@pytest.fixture(scope="module")
def model_spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=8,
                     supercell_size=8.0, tbf_contact_cutoff=0.3)


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()[:8]
    return jax.make_mesh((8,), ("walkers",), devices=devices)


def _make_sampling(model_spec, mesh, rebalance_every=None,
                   max_w=96, target=64):
    return dmc.Sampling(model_spec, time_step=1e-3,
                        max_num_walkers=max_w,
                        target_num_walkers=target, rng_seed=7,
                        mesh=mesh, rebalance_every=rebalance_every)


def _imbalanced_state(sampling, model_spec):
    """A state whose walkers all sit on the first two shards."""
    rng = np.random.default_rng(2)
    confs = np.stack([model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(sampling.target_num_walkers)])
    state = sampling.build_state(confs)
    max_w = sampling.max_num_walkers
    num_shards = sampling.num_shards
    shard_size = max_w // num_shards
    n = int(np.asarray(state.num_walkers).sum())
    # Cram n walkers into the first shards' slices (prefix layout).
    pos = np.asarray(state.pos)
    valid_pos = pos[~np.asarray(state.masks)]
    valid_e = np.asarray(state.energies)[~np.asarray(state.masks)]
    valid_d = np.asarray(state.drift)[~np.asarray(state.masks)]
    new_pos = np.zeros_like(pos)
    new_e = np.zeros_like(np.asarray(state.energies))
    new_d = np.zeros_like(np.asarray(state.drift))
    counts = np.zeros(num_shards, dtype=np.int32)
    for i in range(n):
        s = i // shard_size
        r = i % shard_size
        new_pos[s * shard_size + r] = valid_pos[i]
        new_e[s * shard_size + r] = valid_e[i]
        new_d[s * shard_size + r] = valid_d[i]
        counts[s] += 1
    slots = np.arange(max_w)
    valid = (slots % shard_size) < counts[slots // shard_size]
    return state._replace(
        pos=jnp.asarray(new_pos), drift=jnp.asarray(new_d),
        energies=jnp.asarray(new_e),
        weights=jnp.asarray(valid, dtype=new_pos.dtype),
        masks=jnp.asarray(~valid),
        num_walkers=jnp.asarray(counts))


def test_rebalance_recovers_balance_and_preserves_walkers(
        model_spec, mesh):
    sampling = _make_sampling(model_spec, mesh)
    state = _imbalanced_state(sampling, model_spec)
    counts_before = np.asarray(state.num_walkers)
    assert counts_before.max() == 12 and counts_before.min() == 0

    new_state = sampling.rebalance(state)
    counts = np.asarray(new_state.num_walkers)
    assert counts.sum() == counts_before.sum()
    assert counts.max() - counts.min() <= 1

    # The walker multiset is preserved exactly.
    old_valid = ~np.asarray(state.masks)
    new_valid = ~np.asarray(new_state.masks)
    old_pos = np.sort(np.asarray(state.pos)[old_valid], axis=0)
    new_pos = np.sort(np.asarray(new_state.pos)[new_valid], axis=0)
    np.testing.assert_array_equal(old_pos, new_pos)
    np.testing.assert_allclose(
        np.sort(np.asarray(state.energies)[old_valid]),
        np.sort(np.asarray(new_state.energies)[new_valid]))

    # Prefix invariant per shard (what the comb relies on).
    max_w = sampling.max_num_walkers
    shard_size = max_w // sampling.num_shards
    slots = np.arange(max_w)
    expect_valid = (slots % shard_size) < counts[slots // shard_size]
    np.testing.assert_array_equal(new_valid, expect_valid)

    # Ensemble scalars untouched.
    assert float(new_state.ref_energy) == float(state.ref_energy)


def test_sharded_run_recovers_from_imbalance(model_spec, mesh):
    """Start from a fully imbalanced ensemble; with rebalancing every
    block, the shard occupancy recovers and stays bounded, and the
    sampled energy remains finite/bracketed."""
    sampling = _make_sampling(model_spec, mesh, rebalance_every=1)
    state = _imbalanced_state(sampling, model_spec)
    blocks = sampling.blocks(state, num_time_steps_block=8)
    next(blocks)  # first block runs on the imbalanced ensemble
    for _ in range(4):
        block = next(blocks)
        counts = np.asarray(block.last_state.num_walkers)
        # After each rebalance + one block of per-shard branching, the
        # spread stays within the single-block branching noise.
        assert counts.min() >= 1
        assert counts.max() - counts.min() <= 8
    energy = np.asarray(block.iter_props.energy)
    weight = np.asarray(block.iter_props.weight)
    e_per_n = energy[-1] / weight[-1] / model_spec.boson_number
    assert np.isfinite(e_per_n) and 0.0 < e_per_n < 30.0


@pytest.mark.slow
def test_rebalancing_is_statistically_unbiased(model_spec, mesh):
    """Same sampling with and without rebalancing: the estimated
    energies agree within the combined statistical error."""
    def run(rebalance_every, seed):
        sampling = dmc.Sampling(model_spec, time_step=1e-3,
                                max_num_walkers=96,
                                target_num_walkers=64, rng_seed=seed,
                                mesh=mesh,
                                rebalance_every=rebalance_every)
        rng = np.random.default_rng(4)
        confs = np.stack([model_spec.init_get_sys_conf(rng=rng)
                          for _ in range(64)])
        state = sampling.build_state(confs)
        blocks = sampling.blocks(state, num_time_steps_block=32,
                                 burn_in_blocks=4)
        for _ in range(4):
            next(blocks)
        es = []
        for _ in range(12):
            b = next(blocks)
            e = np.asarray(b.iter_props.energy, dtype=np.float64).sum()
            w = np.asarray(b.iter_props.weight, dtype=np.float64).sum()
            es.append(e / w / model_spec.boson_number)
        return np.asarray(es)

    plain = run(None, 11)
    rebal = run(2, 12)
    err = np.hypot(plain.std() / np.sqrt(len(plain)),
                   rebal.std() / np.sqrt(len(rebal)))
    assert abs(plain.mean() - rebal.mean()) < 4 * err, \
        (plain.mean(), rebal.mean(), err)
