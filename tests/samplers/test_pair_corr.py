"""Direct pair-correlation g2(r) estimator tests.

Beyond the reference, which has no direct pair-correlation estimator
(g2 there is only reachable by Fourier-inverting the truncated S(k);
cf. ``analysis.pair_correlation_from_ssf``).  Validation strategy:
bit-exact counts vs a NumPy oracle, the pair-count sum rule, exactness
of g2 = 1 for the free ideal gas (uniform positions), contact
suppression at strong coupling, and dynamics invariance (energies are
bit-identical with the estimator on/off and for any cadence).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phd_qmclib_tpu.models import jastrow, mrbp
from phd_qmclib_tpu.samplers import dmc, vmc


def make_spec(**kw):
    base = dict(lattice_depth=0.0, lattice_ratio=1.0,
                interaction_strength=0.0, boson_number=10,
                supercell_size=10.0, tbf_contact_cutoff=2.5)
    base.update(kw)
    return mrbp.Spec(**base)


def pair_hist_oracle(pos, sc_size, num_bins):
    """O(N^2) NumPy reference of the per-walker pair histogram."""
    pos = np.asarray(pos)
    w, n = pos.shape
    dr = 0.5 * sc_size / num_bins
    out = np.zeros((w, num_bins))
    for wi in range(w):
        for i in range(n):
            for j in range(i + 1, n):
                d = pos[wi, i] - pos[wi, j]
                d -= sc_size * np.round(d / sc_size)
                b = min(int(abs(d) // dr), num_bins - 1)
                out[wi, b] += 1
    return out


def test_kernel_matches_oracle():
    spec = make_spec(lattice_depth=3.0, interaction_strength=2.0)
    funcs = mrbp.core_funcs(spec)
    cfc = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                       spec.cfc_params)
    rng = np.random.default_rng(11)
    pos = rng.uniform(0, spec.supercell_size, size=(23, 10))
    hist = np.asarray(funcs.pair_dist_histogram(16, jnp.asarray(pos),
                                                cfc))
    oracle = pair_hist_oracle(pos, spec.supercell_size, 16)
    np.testing.assert_array_equal(hist, oracle)


@pytest.mark.slow  # re-tiered r5: tiled-vs-flat oracle duplicate
# (test_kernel_matches_oracle stays fast)
def test_kernel_tiled_path_matches(monkeypatch):
    """Force the walker tiling and check bit-equality with the
    untiled evaluation."""
    spec = make_spec()
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, spec.supercell_size, size=(24, 10)))
    cfc = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                       spec.cfc_params)
    funcs = mrbp.core_funcs(spec)
    full = np.asarray(funcs.pair_dist_histogram(8, pos, cfc))
    # The tiling budget is read at call time from the module global.
    monkeypatch.setattr(jastrow, "PAIR_TILE_ELEMS", 10 * 10 * 32 * 4)
    tiled = np.asarray(funcs.pair_dist_histogram(8, pos, cfc))
    np.testing.assert_array_equal(full, tiled)


def dmc_sampling(spec, pure=True, mult=1, every=1, g2=True, **kw):
    g2_spec = dmc.PairCorrEstSpec(num_bins=12, as_pure_est=pure,
                                  est_every_mult=mult,
                                  pfw_num_time_steps=16 if pure
                                  else None) if g2 else None
    return dmc.Sampling(spec, time_step=2e-3, max_num_walkers=96,
                        target_num_walkers=80, rng_seed=21,
                        est_every=every, pair_corr_est_spec=g2_spec,
                        **kw)


def dmc_state(sampling, spec, seed=0):
    rng = np.random.default_rng(seed)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(sampling.target_num_walkers)])
    return sampling.build_state(confs)


@pytest.mark.parametrize("pure,mult,every", [
    (False, 1, 1), (True, 1, 1), (True, 2, 2), (False, 4, 1)])
def test_dmc_shapes_and_pair_count_sum_rule(pure, mult, every):
    spec = make_spec(lattice_depth=2.0, interaction_strength=1.0)
    sampling = dmc_sampling(spec, pure=pure, mult=mult, every=every)
    state = dmc_state(sampling, spec)
    block = next(sampling.blocks(state, num_time_steps_block=16))
    g2 = np.asarray(block.iter_g2, dtype=np.float64)
    assert g2.shape == (16 // (mult * every), 12)
    assert np.all(np.isfinite(g2))
    # Sum rule: every walker contributes exactly N(N-1)/2 pair counts
    # per measured step (pure windows average the same constant).
    nop = spec.boson_number
    nw = np.asarray(block.iter_props.num_walkers, dtype=np.float64)
    nw_meas = nw[mult * every - 1::mult * every]
    np.testing.assert_allclose(g2.sum(axis=1),
                               nw_meas * nop * (nop - 1) / 2, rtol=1e-8)


def test_dmc_free_gas_g2_is_flat():
    """Free ideal gas: the walkers stay uniform, so g2(r) = 1."""
    spec = make_spec()
    sampling = dmc_sampling(spec, pure=False)
    state = dmc_state(sampling, spec)
    blocks = sampling.blocks(state, num_time_steps_block=32)
    next(blocks)  # settle
    counts = np.zeros(12)
    nw_tot = 0.0
    for _ in range(4):
        block = next(blocks)
        counts += np.asarray(block.iter_g2).sum(axis=0)
        nw_tot += np.asarray(block.iter_props.num_walkers).sum()
    nop, sc = spec.boson_number, spec.supercell_size
    dr = 0.5 * sc / 12
    g2 = counts / nw_tot * sc / (nop * (nop - 1) * dr)
    np.testing.assert_allclose(g2, 1.0, atol=0.08)
    assert abs(g2.mean() - 1.0) < 1e-12  # exact sum rule


def test_dmc_dynamics_invariant_under_estimator():
    """Energies are bit-identical with the estimator off/on and for
    any est_every_mult (the histogram never touches the dynamics)."""
    spec = make_spec(lattice_depth=4.0, interaction_strength=2.0)
    results = []
    for g2, mult in ((False, 1), (True, 1), (True, 4)):
        sampling = dmc_sampling(spec, pure=True, mult=mult, g2=g2)
        state = dmc_state(sampling, spec)
        block = next(sampling.blocks(state, num_time_steps_block=8))
        results.append(np.asarray(block.iter_props.energy))
    np.testing.assert_array_equal(results[0], results[1])
    np.testing.assert_array_equal(results[0], results[2])


def test_dmc_mixed_pure_first_window_agree():
    """With pfw covering the whole block, the pure estimate at the
    first measured step equals the mixed one (window of length 1)."""
    spec = make_spec(lattice_depth=2.0, interaction_strength=1.0)
    mixed = dmc_sampling(spec, pure=False)
    pure = dmc_sampling(spec, pure=True)
    sm = dmc_state(mixed, spec)
    sp = dmc_state(pure, spec)
    bm = next(mixed.blocks(sm, num_time_steps_block=4))
    bp = next(pure.blocks(sp, num_time_steps_block=4))
    np.testing.assert_allclose(np.asarray(bm.iter_g2)[0],
                               np.asarray(bp.iter_g2)[0], rtol=1e-12)


def test_vmc_free_gas_g2_is_flat():
    spec = make_spec(boson_number=12, supercell_size=12.0,
                     tbf_contact_cutoff=3.0)
    sampling = vmc.Sampling(
        spec, move_spread=1.0, rng_seed=7, num_walkers=128,
        pair_corr_est_spec=vmc.PairCorrEstSpec(num_bins=10))
    # Independent random starts: the free-gas equilibrium IS uniform,
    # so the estimator is exact from step 0 without burn-in.
    rng = np.random.default_rng(1)
    state = sampling.build_state(
        np.stack([spec.init_get_sys_conf(rng=rng)
                  for _ in range(128)]))
    block = next(sampling.blocks(48, state))
    g2c = np.asarray(block.iter_g2, dtype=np.float64)
    assert g2c.shape == (48, 10)
    nop, sc = spec.boson_number, spec.supercell_size
    dr = 0.5 * sc / 10
    g2 = g2c.mean(axis=0) / 128 * sc / (nop * (nop - 1) * dr)
    np.testing.assert_allclose(g2, 1.0, atol=0.1)
    assert abs(g2.mean() - 1.0) < 1e-12


def test_vmc_contact_suppression_strong_coupling():
    """Strong repulsion suppresses the contact value: g2 near r=0 is
    far below 1 while the large-r plateau stays near 1."""
    nop = 8
    spec = make_spec(boson_number=nop, supercell_size=float(nop),
                     interaction_strength=80.0,
                     tbf_contact_cutoff=0.49 * nop)
    sampling = vmc.Sampling(
        spec, move_spread=0.5, rng_seed=9, num_walkers=128,
        pair_corr_est_spec=vmc.PairCorrEstSpec(num_bins=8,
                                               est_every_mult=2))
    pos0 = spec.init_get_sys_conf(
        dist_type=mrbp.SysConfDistType.REGULAR)
    state = sampling.build_state(pos0)
    blocks = sampling.blocks(64, state)
    next(blocks)  # burn-in
    block = next(blocks)
    g2c = np.asarray(block.iter_g2, dtype=np.float64)
    dr = 0.5 * spec.supercell_size / 8
    g2 = g2c.mean(axis=0) / 128 * spec.supercell_size \
        / (nop * (nop - 1) * dr)
    assert g2[0] < 0.45
    assert g2[-2:].mean() > 0.8


def test_vmc_dynamics_invariant_under_estimator():
    spec = make_spec(lattice_depth=3.0, interaction_strength=2.0)
    energies = []
    for g2_spec in (None,
                    vmc.PairCorrEstSpec(num_bins=6),
                    vmc.PairCorrEstSpec(num_bins=6, est_every_mult=4)):
        sampling = vmc.Sampling(spec, move_spread=0.8, rng_seed=13,
                                num_walkers=32,
                                pair_corr_est_spec=g2_spec)
        state = sampling.build_state(
            spec.init_get_sys_conf(rng=np.random.default_rng(2)))
        block = next(sampling.blocks(16, state))
        energies.append(np.asarray(block.iter_props.energy))
    np.testing.assert_array_equal(energies[0], energies[1])
    np.testing.assert_array_equal(energies[0], energies[2])


def test_validation_errors():
    spec = make_spec()
    with pytest.raises(ValueError, match="est_every_mult"):
        dmc.Sampling(spec, time_step=1e-3, max_num_walkers=8,
                     target_num_walkers=8,
                     pair_corr_est_spec=dmc.PairCorrEstSpec(
                         num_bins=4, est_every_mult=0))
    with pytest.raises(ValueError, match="pfw_num_time_steps"):
        dmc.Sampling(spec, time_step=1e-3, max_num_walkers=8,
                     target_num_walkers=8, est_every=2,
                     pair_corr_est_spec=dmc.PairCorrEstSpec(
                         num_bins=4, est_every_mult=2,
                         pfw_num_time_steps=6))
