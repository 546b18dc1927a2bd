"""End-to-end procedure tests: full Proc.exec runs plus HDF5
round-trips (reference pattern:
``/root/reference/tests/mrbp_qmc/test_dmc_exec_proc.py``).
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec, io as io_mod
from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec

MODEL_CONFIG = dict(lattice_depth=10.0, lattice_ratio=1.0,
                    interaction_strength=1.0, boson_number=5,
                    supercell_size=5.0, tbf_contact_cutoff=0.3)


def make_dmc_proc(**kw):
    base = dict(model_spec=mrbp.Spec(**MODEL_CONFIG), time_step=1e-3,
                max_num_walkers=96, target_num_walkers=64,
                num_blocks=6, num_time_steps_block=24, burn_in_blocks=1,
                rng_seed=14, dtype="float64",
                density_spec=dmc_exec.DensityEstSpec(num_bins=10,
                                                     as_pure_est=True),
                ssf_spec=dmc_exec.SSFEstSpec(num_modes=4,
                                             as_pure_est=True))
    base.update(kw)
    return dmc_exec.Proc(**base)


def make_vmc_proc(**kw):
    base = dict(model_spec=mrbp.Spec(**MODEL_CONFIG), move_spread=0.25,
                num_blocks=4, num_steps_block=128, burn_in_blocks=1,
                rng_seed=14, num_walkers=8, dtype="float64",
                ssf_spec=vmc_exec.SSFEstSpec(num_modes=4))
    base.update(kw)
    return vmc_exec.Proc(**base)


class TestDmcProc:

    @pytest.fixture(scope="class")
    def result(self):
        proc = make_dmc_proc()
        proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
        return proc.exec(proc_input)

    def test_energy_statistics(self, result):
        energy_blocks = result.data.blocks.energy
        e0 = result.proc.model_spec.obf_params.param_e0
        nop = result.proc.model_spec.boson_number
        mean = energy_blocks.mean
        assert np.isfinite(mean)
        # E/N must lie above the ideal band bottom.
        assert mean / nop > e0 - 0.5

    def test_estimator_shapes(self, result):
        proc = result.proc
        ssf = result.data.blocks.ss_factor
        assert ssf.mean.shape == (proc.ssf_spec.num_modes,)
        assert np.all(np.isfinite(ssf.mean))
        density = result.data.blocks.density
        assert density.mean.shape == (proc.density_spec.num_bins,)
        # Density integrates to N (each walker deposits N counts per
        # weight unit; the normalized profile means sum to N).
        assert float(density.mean.sum()) == pytest.approx(
            proc.model_spec.boson_number, rel=1e-6)

    def test_state_roundtrip_and_resume(self, result, tmp_path):
        handler = io_mod.DmcHDF5FileHandler(
            str(tmp_path / "dmc-result.h5"), group="dmc-proc-ID0",
            dump_replace=True)
        handler.dump(result)
        loaded = handler.load()
        np.testing.assert_allclose(np.asarray(loaded.state.pos),
                                   np.asarray(result.state.pos))
        np.testing.assert_allclose(np.asarray(loaded.state.weights),
                                   np.asarray(result.state.weights))
        np.testing.assert_array_equal(
            np.asarray(loaded.state.num_walkers),
            np.asarray(result.state.num_walkers))
        # Loaded data reproduces the statistics.
        assert loaded.data.blocks.energy.mean == pytest.approx(
            result.data.blocks.energy.mean)
        np.testing.assert_allclose(loaded.data.blocks.ss_factor.mean,
                                   result.data.blocks.ss_factor.mean)
        # Loaded proc spec matches.
        assert loaded.proc.time_step == result.proc.time_step
        assert loaded.proc.model_spec == result.proc.model_spec

        # Resume: a short continuation run from the loaded state.
        proc2 = make_dmc_proc(num_blocks=2, burn_in_blocks=0)
        proc_input2 = dmc_exec.ProcInput.from_result(loaded, proc2)
        result2 = proc2.exec(proc_input2)
        assert np.isfinite(result2.data.blocks.energy.mean)
        # Block data merges across the runs.
        merged = result.data.blocks.merge(result2.data.blocks)
        assert len(merged.energy) == len(result.data.blocks.energy) + 2

    def test_dump_replace_policy(self, result, tmp_path):
        handler = io_mod.DmcHDF5FileHandler(
            str(tmp_path / "dup.h5"), group="g", dump_replace=False)
        handler.dump(result)
        with pytest.raises(io_mod.HDF5FileHandlerGroupError):
            handler.dump(result)

    def test_config_roundtrip(self):
        proc = make_dmc_proc()
        config = proc.as_config()
        proc2 = dmc_exec.Proc.from_config(config)
        assert proc2 == proc

    def test_deprecated_aliases(self):
        config = make_dmc_proc().as_config()
        config["num_batches"] = config.pop("num_blocks")
        with pytest.warns(DeprecationWarning):
            proc = dmc_exec.Proc.from_config(config)
        assert proc.num_blocks == 6

    def test_multichip_proc(self, tmp_path):
        # Full production driver over the virtual 8-device mesh,
        # including estimators and HDF5 output.
        proc = make_dmc_proc(max_num_walkers=96, target_num_walkers=64,
                             num_mesh_devices=0, num_blocks=4,
                             burn_in_blocks=1)
        proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
        result = proc.exec(proc_input)
        assert np.isfinite(result.data.blocks.energy.mean)
        # Sharded state round-trips through HDF5.
        handler = io_mod.DmcHDF5FileHandler(
            str(tmp_path / "mesh.h5"), group="g")
        handler.dump(result)
        loaded = handler.load()
        np.testing.assert_array_equal(
            np.asarray(loaded.state.num_walkers),
            np.asarray(result.state.num_walkers))
        assert np.asarray(loaded.state.num_walkers).shape == (8,)

    def test_keep_iter_data(self):
        proc = make_dmc_proc(num_blocks=3, keep_iter_data=True,
                             density_spec=None, ssf_spec=None)
        proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
        result = proc.exec(proc_input)
        assert result.data.series is not None
        assert result.data.series.energy.shape == (3 * 24,)
        assert np.isfinite(result.data.blocks.energy.mean)


class TestVmcProc:

    @pytest.fixture(scope="class")
    def result(self):
        proc = make_vmc_proc()
        proc_input = vmc_exec.ProcInput.from_model_sys_conf_spec(
            vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
        return proc.exec(proc_input)

    def test_energy_statistics(self, result):
        nop = result.proc.model_spec.boson_number
        e0 = result.proc.model_spec.obf_params.param_e0
        mean = result.data.blocks.energy.mean
        # Variational bound per particle.
        assert mean / nop > e0 - 1e-6

    def test_ssf(self, result):
        ssf = result.data.blocks.ss_factor
        mean = ssf.mean
        assert mean.shape == (4,)
        # S(0) = <|rho_0|^2> - <Re>^2 - <Im>^2 == N^2 - N^2 = 0.
        assert mean[0] == pytest.approx(0.0, abs=1e-9)
        assert np.all(mean[1:] > -1e-9)

    def test_hdf5_roundtrip(self, result, tmp_path):
        handler = io_mod.VmcHDF5FileHandler(
            str(tmp_path / "vmc-result.h5"), group="vmc-proc-ID0")
        handler.dump(result)
        loaded = handler.load()
        np.testing.assert_allclose(np.asarray(loaded.state.pos),
                                   np.asarray(result.state.pos))
        assert loaded.data.blocks.energy.mean == pytest.approx(
            result.data.blocks.energy.mean)
        # Resume a short continuation.
        proc2 = make_vmc_proc(num_blocks=2, burn_in_blocks=0)
        proc_input2 = vmc_exec.ProcInput.from_result(loaded, proc2)
        result2 = proc2.exec(proc_input2)
        assert np.isfinite(result2.data.blocks.energy.mean)


def test_shard_collapse_auto_rebalance(caplog):
    """A run that reaches a zero-population shard must auto-rebalance
    and continue unbiased instead of only warning (a per-shard comb can
    never repopulate an empty shard)."""
    import logging

    import jax.numpy as jnp

    proc = make_dmc_proc(max_num_walkers=96, target_num_walkers=64,
                         num_mesh_devices=0, num_blocks=4,
                         burn_in_blocks=0, density_spec=None,
                         ssf_spec=None)
    sampling = proc.sampling
    rng = np.random.default_rng(5)
    confs = np.stack([proc.model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(64)])
    state = sampling.build_state(confs)
    # Collapse the ensemble onto the first shards: pack all valid
    # walkers into a slot prefix (shards 0-5 full, 6-7 empty).
    max_w, num_shards = 96, sampling.num_shards
    shard_size = max_w // num_shards
    pos = np.asarray(state.pos)
    valid = ~np.asarray(state.masks)
    n = int(valid.sum())
    new_pos = np.zeros_like(pos)
    new_e = np.zeros_like(np.asarray(state.energies))
    new_d = np.zeros_like(np.asarray(state.drift))
    new_pos[:n] = pos[valid]
    new_e[:n] = np.asarray(state.energies)[valid]
    new_d[:n] = np.asarray(state.drift)[valid]
    counts = np.minimum(
        np.maximum(n - np.arange(num_shards) * shard_size, 0),
        shard_size).astype(np.int32)
    slots = np.arange(max_w)
    new_valid = (slots % shard_size) < counts[slots // shard_size]
    state = state._replace(
        pos=jnp.asarray(new_pos), drift=jnp.asarray(new_d),
        energies=jnp.asarray(new_e),
        weights=jnp.asarray(new_valid, dtype=new_pos.dtype),
        masks=jnp.asarray(~new_valid),
        num_walkers=jnp.asarray(counts))
    assert counts.min() == 0

    exec_logger = logging.getLogger("phd-qmclib-tpu")
    exec_logger.propagate = True  # let caplog's root handler see it
    try:
        with caplog.at_level(logging.WARNING, logger="phd-qmclib-tpu"):
            result = proc.exec(dmc_exec.ProcInput(state))
    finally:
        exec_logger.propagate = False
    assert any("rebalanced" in rec.message for rec in caplog.records)
    final_counts = np.asarray(result.state.num_walkers)
    # Rebalanced and recovered: no shard left empty after the run.
    assert final_counts.min() >= 1
    e_per_n = result.data.blocks.energy.mean / \
        proc.model_spec.boson_number
    assert np.isfinite(e_per_n) and 0.0 < e_per_n < 30.0
