"""Center-of-mass imaginary-time diffusion: superfluid fraction /
effective mass.

Two exact targets pin the estimator:

1. **Galilean invariance** — without a lattice the total drift of a
   translation-invariant trial wavefunction vanishes identically, so
   the CM performs pure diffusion and ``m/m* = 1`` for ANY
   interaction strength.
2. **Ideal lattice gas** — the trial orbital is the exact ground
   state, and the measured ratio must approach the single-particle
   band-curvature value ``ideal.effective_mass_ratio`` (the
   ground-state-transformed Fokker-Planck generator shares the
   Hamiltonian's Bloch spectrum).
"""
import numpy as np
import pytest

from phd_qmclib_tpu import analysis, ideal
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc

NOP = 8
SC = 8.0


def _measure(v0, gn, nts, nblocks, dt=2e-3, walkers=256, seed=11):
    spec = mrbp.Spec(lattice_depth=v0, lattice_ratio=1.0,
                     interaction_strength=gn, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)
    sampling = dmc.Sampling(
        spec, time_step=dt, max_num_walkers=walkers + walkers // 4,
        target_num_walkers=walkers, rng_seed=seed,
        cm_diffusion_est=True)
    rng = np.random.default_rng(3)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(walkers)])
    state = sampling.build_state(confs)
    it = sampling.blocks(state, nts, burn_in_blocks=1)
    next(it)
    cmds, nws = [], []
    for _ in range(nblocks):
        b = next(it)
        cmds.append(np.asarray(b.iter_cmd, dtype=np.float64))
        nws.append(np.asarray(b.iter_props.num_walkers,
                              dtype=np.float64))
    return analysis.effective_mass_from_cm_diffusion(
        dt, np.stack(cmds), np.stack(nws), NOP)


@pytest.mark.slow
def test_galilean_invariance_flat_interacting_gas():
    # No lattice, strong interactions: the pair drift is antisymmetric
    # so the total drift cancels walker by walker; the CM random walk
    # has variance 2 tau / N exactly and the ratio is 1.  (Branching
    # makes walkers share ancestors, so <W^2> fluctuates block to
    # block far more than the naive 1/sqrt(walkers); average several
    # blocks.)
    ratio, err = _measure(v0=1e-6, gn=4.0, nts=192, nblocks=10)
    assert ratio == pytest.approx(1.0, abs=0.07), (ratio, err)


def test_ideal_lattice_gas_matches_band_curvature():
    v0 = 10.0
    target = ideal.effective_mass_ratio(v0, 1.0)
    assert 0.9 < target < 1.0  # sanity of the exact value
    ratio, err = _measure(v0=v0, gn=0.0, nts=512, nblocks=3)
    assert ratio == pytest.approx(target, rel=0.15), \
        (ratio, err, target)


def test_cmd_output_shape_and_burn_gating():
    spec = mrbp.Spec(lattice_depth=5.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)
    sampling = dmc.Sampling(spec, time_step=1e-3, max_num_walkers=40,
                            target_num_walkers=32, rng_seed=1,
                            cm_diffusion_est=True)
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(32)])
    it = sampling.blocks(sampling.build_state(confs), 8,
                         burn_in_blocks=1)
    burn = next(it)
    assert burn.iter_cmd is None
    b = next(it)
    assert np.asarray(b.iter_cmd).shape == (8, 2)
    # <W^2> grows with tau within the block.
    w2 = np.asarray(b.iter_cmd, dtype=np.float64)[:, 0]
    assert w2[-1] > w2[0] > 0


def test_cmd_with_measurement_cadence():
    """The CM displacement accumulates on EVERY step (including the
    transport-only steps of an est_every cadence); outputs land once
    per measured step and match the every-step run's subsamples."""
    spec = mrbp.Spec(lattice_depth=5.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)

    def run(est_every):
        sampling = dmc.Sampling(
            spec, time_step=1e-3, max_num_walkers=40,
            target_num_walkers=32, rng_seed=6, est_every=est_every,
            cm_diffusion_est=True)
        rng = np.random.default_rng(0)
        confs = np.stack([spec.init_get_sys_conf(rng=rng)
                          for _ in range(32)])
        it = sampling.blocks(sampling.build_state(confs), 16)
        return next(it)

    every = run(1)
    cad = run(4)
    assert np.asarray(cad.iter_cmd).shape == (4, 2)
    np.testing.assert_allclose(
        np.asarray(cad.iter_cmd),
        np.asarray(every.iter_cmd)[3::4], rtol=1e-12)


@pytest.mark.slow
def test_cmd_through_vmap_sweep():
    """iter_cmd flows through the vmap-fused ParamSweep bit-exactly.

    Slow tier: sweep-interaction gate; CM-diffusion mechanics stay
    fast (shape/burn/cadence/window tests above) and fused-sweep
    bit-exactness stays fast via the sweep fuzz corpus."""
    from phd_qmclib_tpu.parallel.sweep import ParamSweep

    def row(gn, seed):
        spec = mrbp.Spec(lattice_depth=5.0, lattice_ratio=1.0,
                         interaction_strength=gn, boson_number=NOP,
                         supercell_size=SC, tbf_contact_cutoff=0.3)
        return dmc.Sampling(spec, time_step=1e-3, max_num_walkers=40,
                            target_num_walkers=32, rng_seed=seed,
                            cm_diffusion_est=True)

    rows = tuple(row(gn, 15) for gn in (0.5, 2.0))
    sweep = ParamSweep(rows)
    rng = np.random.default_rng(4)
    conf_sets = [np.stack([r.model_spec.init_get_sys_conf(rng=rng)
                           for _ in range(32)]) for r in rows]
    state = sweep.build_states(conf_sets)
    fused = next(sweep.blocks(state, 8))
    assert np.asarray(fused.iter_cmd).shape == (2, 8, 2)
    for r, sampling in enumerate(rows):
        alone = next(sampling.blocks(
            sampling.build_state(conf_sets[r]), 8))
        np.testing.assert_allclose(
            np.asarray(fused.iter_cmd)[r],
            np.asarray(alone.iter_cmd), rtol=1e-12)


def test_cross_block_window_continues_accumulation():
    """With ``cm_window_blocks > 1`` the CM accumulator persists across
    block boundaries (tau no longer capped at ``nts * dt``); with the
    default per-block window it resets."""
    spec = mrbp.Spec(lattice_depth=5.0, lattice_ratio=1.0,
                     interaction_strength=0.0, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)

    def run(window):
        sampling = dmc.Sampling(
            spec, time_step=2e-3, max_num_walkers=160,
            target_num_walkers=128, rng_seed=9,
            cm_diffusion_est=True, cm_window_blocks=window)
        rng = np.random.default_rng(5)
        confs = np.stack([spec.init_get_sys_conf(rng=rng)
                          for _ in range(128)])
        state = sampling.build_state(confs)
        it = sampling.blocks(state, 16, burn_in_blocks=1)
        next(it)
        blocks = [next(it) for _ in range(2)]
        w2 = []
        for b in blocks:
            cmd = np.asarray(b.iter_cmd, dtype=np.float64)
            nw = np.asarray(b.iter_props.num_walkers, dtype=np.float64)
            w2.append(cmd[:, 0] / nw)
        return w2

    per_block = run(1)
    spanning = run(2)

    # Identical dynamics/noise within the first window.
    np.testing.assert_allclose(per_block[0], spanning[0], rtol=1e-12)
    # Per-block window: block 2 restarts near zero (one step of CM
    # diffusion).  Spanning window: block 2 continues from block 1's
    # accumulated <W^2>.
    assert per_block[1][0] < 0.5 * per_block[0][-1]
    assert spanning[1][0] > 0.8 * spanning[0][-1]
    # And <W^2> keeps growing roughly linearly over the joined window.
    assert spanning[1][-1] > 1.5 * spanning[0][-1]
