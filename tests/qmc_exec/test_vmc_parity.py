"""VMC execution-layer parity with DMC (VERDICT r2 #5): mid-run
checkpoint/restore and estimator measurement cadence."""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec
from phd_qmclib_tpu.samplers import vmc as vmc_sampler

MODEL_CONFIG = dict(lattice_depth=10.0, lattice_ratio=1.0,
                    interaction_strength=1.0, boson_number=5,
                    supercell_size=5.0, tbf_contact_cutoff=0.3)


def make_proc(**kw):
    base = dict(model_spec=mrbp.Spec(**MODEL_CONFIG), move_spread=0.25,
                num_blocks=4, num_steps_block=64, burn_in_blocks=0,
                rng_seed=9, num_walkers=8, dtype="float64",
                ssf_spec=vmc_exec.SSFEstSpec(num_modes=3))
    base.update(kw)
    return vmc_exec.Proc(**base)


def run(proc):
    return proc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))


def test_mid_run_checkpoint_and_restore(tmp_path, monkeypatch):
    """Mirror of the DMC gate (``test_checkpoint.py``): kill after a
    mid-run checkpoint, restore, finish — bit-identical to the
    uninterrupted run (full-state resume)."""
    from tests.qmc_exec.test_checkpoint import kill_after_checkpoint

    ckpt = str(tmp_path / "vmc_ckpt.h5")
    proc = make_proc(checkpoint_file=ckpt, checkpoint_every=2)
    proc_input = vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    full = make_proc().exec(vmc_exec.ProcInput(proc_input.state))

    with monkeypatch.context() as mp:
        killed = kill_after_checkpoint(mp, vmc_exec.Proc, at_blocks=2)
        with pytest.raises(killed):
            proc.exec(proc_input)

    proc2, proc_input2 = vmc_exec.Proc.restore_checkpoint(ckpt)
    assert proc2.model_spec == proc.model_spec
    assert proc2.move_spread == proc.move_spread
    assert proc2.num_blocks == proc.num_blocks  # ORIGINAL config
    assert proc_input2.resume["blocks_completed"] == 2
    resumed = proc2.evolve({"checkpoint_file": None}).exec(proc_input2)
    np.testing.assert_array_equal(np.asarray(resumed.state.pos),
                                  np.asarray(full.state.pos))
    np.testing.assert_array_equal(
        resumed.data.blocks.energy.totals,
        full.data.blocks.energy.totals)
    f_ssf = full.data.blocks.ss_factor
    r_ssf = resumed.data.blocks.ss_factor
    np.testing.assert_array_equal(r_ssf.fdk_sqr_abs_part.totals,
                                  f_ssf.fdk_sqr_abs_part.totals)


def test_cadence_preserves_dynamics_and_subsamples_estimators():
    """est_every gates only the estimator evaluations: the chain
    trajectory is bit-identical, and the measured S(k) entries equal
    the every-step run's entries at the measured steps."""
    spec = mrbp.Spec(**MODEL_CONFIG)

    def sample(cadence):
        sampling = vmc_sampler.Sampling(
            spec, move_spread=0.25, rng_seed=13, num_walkers=8,
            ssf_est_spec=vmc_sampler.SSFEstSpec(num_modes=3),
            est_every=cadence)
        rng = np.random.default_rng(1)
        confs = np.stack([spec.init_get_sys_conf(rng=rng)[0]
                          for _ in range(8)])
        state = sampling.build_state(confs)
        return next(sampling.blocks(32, state))

    every = sample(1)
    k4 = sample(4)

    np.testing.assert_array_equal(np.asarray(k4.last_state.pos),
                                  np.asarray(every.last_state.pos))
    np.testing.assert_array_equal(np.asarray(k4.iter_props.energy),
                                  np.asarray(every.iter_props.energy))
    ssf_every = np.asarray(every.iter_ssf)
    ssf_k4 = np.asarray(k4.iter_ssf)
    assert ssf_k4.shape == (8, 3, 3)
    np.testing.assert_allclose(ssf_k4, ssf_every[3::4], rtol=1e-12)


def test_cadence_through_proc_and_config():
    proc = make_proc(est_every=4, keep_iter_data=True,
                     obd_spec=vmc_exec.OBDEstSpec(num_pos=4))
    assert proc.sampling.est_every == 4
    config = proc.as_config()
    assert config["est_every"] == 4
    assert vmc_exec.Proc.from_config(config) == proc
    result = run(proc)
    # Series carry one entry per measured step.
    assert result.data.series.ssf.shape == (4, 16, 3, 3)
    assert result.data.series.obd.shape == (4, 16, 4)
    assert np.all(np.isfinite(result.data.blocks.ss_factor.mean))


def test_cadence_validation():
    with pytest.raises(ValueError, match="divisible"):
        make_proc(num_steps_block=10, est_every=4)


class TestVmcObdEveryMult:
    """OBDM-specific cadence multiplier in the VMC layer."""

    def _sample(self, est_every, obd_mult, num_walkers=8, mesh=None):
        spec = mrbp.Spec(**MODEL_CONFIG)
        sampling = vmc_sampler.Sampling(
            spec, move_spread=0.25, rng_seed=13,
            num_walkers=num_walkers, mesh=mesh,
            ssf_est_spec=vmc_sampler.SSFEstSpec(num_modes=3),
            obd_est_spec=vmc_sampler.OBDEstSpec(
                num_pos=4, est_every_mult=obd_mult),
            est_every=est_every)
        rng = np.random.default_rng(1)
        confs = np.stack([spec.init_get_sys_conf(rng=rng)[0]
                          for _ in range(num_walkers)])
        state = sampling.build_state(confs)
        return next(sampling.blocks(32, state))

    def test_equivalent_step_sets_bit_identical(self):
        # est_every=4 and (est_every=2, mult=2) and (est_every=1,
        # mult=4) all measure the OBDM at steps 3, 7, 11, ...
        a = self._sample(4, 1)
        b = self._sample(2, 2)
        c = self._sample(1, 4)
        for other in (b, c):
            np.testing.assert_array_equal(
                np.asarray(a.last_state.pos),
                np.asarray(other.last_state.pos))
            np.testing.assert_allclose(np.asarray(a.iter_obd),
                                       np.asarray(other.iter_obd),
                                       rtol=1e-12)
        assert np.asarray(a.iter_obd).shape == (8, 4)

    def test_subsamples_every_step_run(self):
        full = self._sample(1, 1)
        m = self._sample(1, 4)
        np.testing.assert_allclose(np.asarray(m.iter_obd),
                                   np.asarray(full.iter_obd)[3::4],
                                   rtol=1e-12)
        # S(k) keeps the base cadence (every step here).
        np.testing.assert_allclose(np.asarray(m.iter_ssf),
                                   np.asarray(full.iter_ssf),
                                   rtol=1e-12)

    def test_sharded_mesh_runs(self):
        import jax

        from phd_qmclib_tpu.parallel import make_walker_mesh
        mesh = make_walker_mesh(len(jax.devices()))
        block = self._sample(2, 2, num_walkers=16, mesh=mesh)
        obd = np.asarray(block.iter_obd, dtype=np.float64)
        assert obd.shape == (8, 4)
        assert np.isfinite(obd).all() and (obd > 0).all()

    def test_through_proc_and_config(self):
        proc = make_proc(est_every=2, keep_iter_data=True,
                         obd_spec=vmc_exec.OBDEstSpec(
                             num_pos=4, est_every_mult=4))
        config = proc.as_config()
        assert config["obd_spec"]["est_every_mult"] == 4
        assert vmc_exec.Proc.from_config(config) == proc
        result = run(proc)
        assert result.data.series.obd.shape == (4, 8, 4)
        assert result.data.series.ssf.shape == (4, 32, 3, 3)
        assert np.all(np.isfinite(result.data.blocks.one_body_dm.mean))

    def test_validation(self):
        with pytest.raises(ValueError, match="divisible"):
            make_proc(obd_spec=vmc_exec.OBDEstSpec(num_pos=4,
                                                   est_every_mult=5))
        with pytest.raises(ValueError, match="positive"):
            make_proc(obd_spec=vmc_exec.OBDEstSpec(num_pos=4,
                                                   est_every_mult=0))
