"""Configurable pure-estimator forward-walking window (VERDICT r2 #4).

The reference silently pins the window to one block
(``mrbp_qmc/dmc_exec/proc.py:274, 337``); here
``pfw_num_time_steps <= num_time_steps_block`` is honored end to end.
The window only gates estimator *accumulation* (frozen values keep
being transported through the branching ancestry), so the walker
dynamics must be bit-identical across window choices, and the measured
series must agree exactly on the pre-freeze steps.
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.samplers import dmc


@pytest.fixture(scope="module")
def model_spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=6,
                     supercell_size=6.0, tbf_contact_cutoff=0.25)


def _run(model_spec, pfw, nts=32, nblocks=2):
    sampling = dmc.Sampling(
        model_spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, rng_seed=17,
        density_est_spec=dmc.DensityEstSpec(num_bins=8, as_pure_est=True,
                                            pfw_num_time_steps=pfw),
        ssf_est_spec=dmc.SSFEstSpec(num_modes=3, as_pure_est=True,
                                    pfw_num_time_steps=pfw))
    rng = np.random.default_rng(2)
    confs = np.stack([model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(32)])
    state = sampling.build_state(confs)
    out = []
    it = sampling.blocks(state, num_time_steps_block=nts)
    for _ in range(nblocks):
        out.append(next(it))
    return out


def test_window_gates_accumulation_not_dynamics(model_spec):
    nts, pfw_short = 32, 8
    full = _run(model_spec, pfw=None, nts=nts)
    short = _run(model_spec, pfw=pfw_short, nts=nts)

    for bf, bs in zip(full, short):
        # Dynamics identical to the bit: same walkers, same energies.
        np.testing.assert_array_equal(
            np.asarray(bf.iter_props.energy),
            np.asarray(bs.iter_props.energy))
        np.testing.assert_array_equal(
            np.asarray(bf.last_state.pos), np.asarray(bs.last_state.pos))

    # Pre-freeze steps agree exactly; the density series diverges after
    # the short window freezes (values frozen, ancestry keeps moving).
    df = np.asarray(full[0].iter_density)
    ds = np.asarray(short[0].iter_density)
    np.testing.assert_array_equal(df[:pfw_short], ds[:pfw_short])
    assert not np.array_equal(df[-1], ds[-1])

    sf = np.asarray(full[0].iter_ssf)
    ss = np.asarray(short[0].iter_ssf)
    np.testing.assert_array_equal(sf[:pfw_short], ss[:pfw_short])

    # Both normalize to a sensible density: integral ~= N * num_walkers.
    nw = np.asarray(short[0].iter_props.num_walkers)
    bin_w = 6.0 / 8
    for d, n in ((ds[-1], nw[-1]), (df[-1], nw[-1])):
        assert d.sum() / n == pytest.approx(6.0, rel=0.05)


def test_proc_honors_and_roundtrips_pfw(model_spec):
    proc = dmc_exec.Proc(
        model_spec=model_spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, num_blocks=2, num_time_steps_block=16,
        burn_in_blocks=0, rng_seed=3, dtype="float64",
        ssf_spec=dmc_exec.SSFEstSpec(num_modes=3, as_pure_est=True,
                                     pfw_num_time_steps=8))
    # The sampler sees the configured window, not a pinned block.
    assert proc.sampling.ssf_est_spec.pfw_num_time_steps == 8
    config = proc.as_config()
    assert config["ssf_spec"]["pfw_num_time_steps"] == 8
    proc2 = dmc_exec.Proc.from_config(config)
    assert proc2 == proc

    result = proc.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))
    ssf = result.data.blocks.ss_factor
    assert np.all(np.isfinite(ssf.mean))


def test_pfw_validation(model_spec):
    kwargs = dict(model_spec=model_spec, time_step=1e-3,
                  max_num_walkers=48, target_num_walkers=32,
                  num_blocks=2, num_time_steps_block=16)
    with pytest.raises(ValueError, match="pure"):
        dmc_exec.Proc(**kwargs, ssf_spec=dmc_exec.SSFEstSpec(
            num_modes=3, as_pure_est=False, pfw_num_time_steps=8))
    # A window that TILES the run (pfw a multiple of the block length,
    # window count dividing num_blocks) is honored — the accumulators
    # persist across blocks.
    proc = dmc_exec.Proc(**kwargs, ssf_spec=dmc_exec.SSFEstSpec(
        num_modes=3, pfw_num_time_steps=32))
    assert proc.ssf_spec.pfw_num_time_steps == 32
    assert proc.sampling.pfw_window_blocks(16) == 2
    # Non-tiling windows CLAMP with a warning instead of erroring: the
    # reference silently pins the window to one block and its own
    # committed configs carry such values
    # (tests/qmc_exec/test_reference_configs.py runs one).
    with pytest.warns(UserWarning, match="clamping to one block"):
        proc = dmc_exec.Proc(**kwargs, ssf_spec=dmc_exec.SSFEstSpec(
            num_modes=3, pfw_num_time_steps=24))
    assert proc.ssf_spec.pfw_num_time_steps == 16
    with pytest.warns(UserWarning, match="clamping to one block"):
        # Tiles blocks but not the run: 3 windows into 2 blocks.
        proc = dmc_exec.Proc(**kwargs, ssf_spec=dmc_exec.SSFEstSpec(
            num_modes=3, pfw_num_time_steps=48))
    assert proc.ssf_spec.pfw_num_time_steps == 16
    with pytest.raises(ValueError, match="est_every"):
        dmc_exec.Proc(**kwargs, est_every=4,
                      ssf_spec=dmc_exec.SSFEstSpec(
                          num_modes=3, pfw_num_time_steps=6))


class TestMultiBlockWindows:
    """Forward-walking windows spanning blocks: the pure accumulators
    persist across block boundaries (an explicit aux carry, VERDICT r2
    #4's 'ideally')."""

    NOP = 6

    def _blocks(self, model_spec, pfw, nts=8, nblocks=4, seed=17):
        sampling = dmc.Sampling(
            model_spec, time_step=1e-3, max_num_walkers=48,
            target_num_walkers=32, rng_seed=seed,
            density_est_spec=dmc.DensityEstSpec(
                num_bins=8, as_pure_est=True, pfw_num_time_steps=pfw))
        rng = np.random.default_rng(2)
        confs = np.stack([model_spec.init_get_sys_conf(rng=rng)
                          for _ in range(32)])
        state = sampling.build_state(confs)
        it = sampling.blocks(state, num_time_steps_block=nts)
        return [next(it) for _ in range(nblocks)]

    def test_sum_rule_continues_across_blocks(self, model_spec):
        """The exact fingerprint of the carried aux + global step
        counter: the pure density estimate sums to N * nw at EVERY
        step of every window-interior block (a per-block reset would
        break the divisor/accumulator balance in block 2)."""
        nts = 8
        out = self._blocks(model_spec, pfw=2 * nts, nts=nts, nblocks=4)
        for b, block in enumerate(out):
            dens = np.asarray(block.iter_density, dtype=np.float64)
            nw = np.asarray(block.iter_props.num_walkers,
                            dtype=np.float64)
            np.testing.assert_allclose(
                dens.sum(axis=1), self.NOP * nw, rtol=1e-9,
                err_msg=f"block {b} (window "
                        f"{'start' if b % 2 == 0 else 'interior'})")

    def test_window_resets_are_periodic(self, model_spec):
        """The walker dynamics are window-independent, so at blocks
        where BOTH a 1-block and a 2-block window configuration start
        fresh (blocks 0 and 2) their first-step estimates must be
        bit-identical — and at window-interior blocks (1 and 3) they
        must differ (the 2-block window carries the accumulators
        through)."""
        nts = 8
        two = self._blocks(model_spec, pfw=2 * nts, nts=nts, nblocks=4)
        one = self._blocks(model_spec, pfw=nts, nts=nts, nblocks=4)
        for b in (0, 2):
            np.testing.assert_array_equal(
                np.asarray(two[b].iter_density)[0],
                np.asarray(one[b].iter_density)[0],
                err_msg=f"block {b} should start a window in both")
        for b in (1, 3):
            assert not np.array_equal(
                np.asarray(two[b].iter_density)[0],
                np.asarray(one[b].iter_density)[0]), \
                f"block {b} should be window-interior for the " \
                f"2-block window"

    def test_exec_window_statistics_and_hdf5(self, model_spec, tmp_path):
        proc = dmc_exec.Proc(
            model_spec=model_spec, time_step=1e-3, max_num_walkers=48,
            target_num_walkers=32, num_blocks=4,
            num_time_steps_block=8, burn_in_blocks=0, rng_seed=9,
            dtype="float64",
            density_spec=dmc_exec.DensityEstSpec(
                num_bins=8, as_pure_est=True, pfw_num_time_steps=16),
            ssf_spec=dmc_exec.SSFEstSpec(
                num_modes=3, as_pure_est=False))
        proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
        result = proc.exec(proc_input)
        blocks = result.data.blocks
        # Pure density: one sample per 2-block window; mixed S(k):
        # one per block.
        assert blocks.density.totals.shape == (2, 8)
        assert blocks.ss_factor.fdk_sqr_abs_part.totals.shape == (4, 3)
        # Window-final weights are the window-final walker counts.
        assert np.all(blocks.density.weight_totals > 0)
        np.testing.assert_allclose(blocks.density.mean.sum(), self.NOP,
                                   rtol=1e-9)
        from phd_qmclib_tpu.qmc_exec.io import DmcHDF5FileHandler
        path = str(tmp_path / "win.h5")
        handler = DmcHDF5FileHandler(path, group="w")
        handler.dump(result)
        loaded = handler.load()
        np.testing.assert_array_equal(loaded.data.blocks.density.totals,
                                      blocks.density.totals)
        assert loaded.proc.density_spec.pfw_num_time_steps == 16

    def test_keep_iter_data_window_statistics_match(self, model_spec):
        """keep_iter_data on/off must produce identical window
        statistics (same trajectory, same end-of-window samples)."""
        def run(keep):
            proc = dmc_exec.Proc(
                model_spec=model_spec, time_step=1e-3,
                max_num_walkers=48, target_num_walkers=32,
                num_blocks=4, num_time_steps_block=8,
                burn_in_blocks=0, rng_seed=9, dtype="float64",
                keep_iter_data=keep,
                density_spec=dmc_exec.DensityEstSpec(
                    num_bins=8, as_pure_est=True,
                    pfw_num_time_steps=16))
            proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
                dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
            return proc.exec(proc_input)

        kept, reduced = run(True), run(False)
        np.testing.assert_allclose(
            kept.data.blocks.density.totals,
            reduced.data.blocks.density.totals, rtol=1e-12)
        np.testing.assert_allclose(
            kept.data.blocks.density.weight_totals,
            reduced.data.blocks.density.weight_totals, rtol=1e-12)


def test_pending_rebalance_executes_at_window_boundary(model_spec,
                                                       monkeypatch):
    """A due rebalance mid-window is HELD and executed at the next
    window start, not dropped (regression: with rebalance_every=2, a
    2-block window and an odd burn-in the cadence and window phase
    never coincide, silently disabling rebalancing forever)."""
    import jax

    from phd_qmclib_tpu.parallel import make_walker_mesh

    calls = []
    orig = dmc.Sampling.rebalance

    def spy(self, state):
        calls.append(1)
        return orig(self, state)

    monkeypatch.setattr(dmc.Sampling, "rebalance", spy)
    mesh = make_walker_mesh(len(jax.devices()))
    sampling = dmc.Sampling(
        model_spec, time_step=1e-3, max_num_walkers=96,
        target_num_walkers=64, rng_seed=11, mesh=mesh,
        rebalance_every=2,
        density_est_spec=dmc.DensityEstSpec(
            num_bins=8, as_pure_est=True, pfw_num_time_steps=16))
    rng = np.random.default_rng(4)
    confs = np.stack([model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(64)])
    state = sampling.build_state(confs)
    it = sampling.blocks(state, num_time_steps_block=8,
                         burn_in_blocks=1)
    for _ in range(7):
        next(it)
    assert calls, ("the pending rebalance must fire at a window "
                   "boundary even when the cadence lands mid-window")


def test_accumulator_window_restart_drops_partial_window(model_spec):
    """After a stream restart (shard-collapse path) the interrupted
    window contributes no sample and subsequent windows realign."""
    from phd_qmclib_tpu.qmc_exec.dmc import _BlockAccumulator

    proc = dmc_exec.Proc(
        model_spec=model_spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, num_blocks=6, num_time_steps_block=8,
        burn_in_blocks=0, rng_seed=9, dtype="float64",
        density_spec=dmc_exec.DensityEstSpec(
            num_bins=4, as_pure_est=True, pfw_num_time_steps=16))
    acc = _BlockAccumulator(proc)
    assert acc.window == 2
    nts = 8
    ones = np.ones(nts)

    def add(idx, tag):
        acc.add(idx, ones, ones, 32 * ones, ones, ones,
                iter_density=np.full((nts, 4), tag, dtype=float))

    add(0, 1.0)
    # Collapse detected WHILE processing block 1 (the block that would
    # have closed window 0).  Proc.exec realigns the window BEFORE
    # folding the collapsed block's data — mirror that exact order:
    # restart_window(idx + 1) first, then add(idx).  The collapsed
    # block's under-projected partial accumulator must NOT be recorded
    # as a window sample.
    acc.restart_window(2)
    add(1, 2.0)
    assert acc.pure_samples["density"] == [], \
        "the collapsed block must not close the realigned window"
    add(2, 3.0)
    add(3, 4.0)   # closes the realigned window -> first sample
    add(4, 5.0)
    add(5, 6.0)   # closes the second window
    samples = acc.pure_samples["density"]
    assert len(samples) == 2
    np.testing.assert_array_equal(samples[0], np.full(4, 4.0))
    np.testing.assert_array_equal(samples[1], np.full(4, 6.0))
