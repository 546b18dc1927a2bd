"""Mid-procedure checkpointing and jit retrace discipline."""
import jax
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.samplers import dmc as dmc_sampler

MODEL_CONFIG = dict(lattice_depth=10.0, lattice_ratio=1.0,
                    interaction_strength=1.0, boson_number=5,
                    supercell_size=5.0, tbf_contact_cutoff=0.3)


def test_mid_run_checkpoint_and_restore(tmp_path):
    ckpt = str(tmp_path / "ckpt.h5")
    proc = dmc_exec.Proc(model_spec=mrbp.Spec(**MODEL_CONFIG),
                         time_step=1e-3, max_num_walkers=64,
                         target_num_walkers=48, num_blocks=4,
                         num_time_steps_block=8, burn_in_blocks=0,
                         rng_seed=3, dtype="float64",
                         checkpoint_file=ckpt, checkpoint_every=2)
    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    result = proc.exec(proc_input)

    proc2, proc_input2 = dmc_exec.Proc.restore_checkpoint(ckpt)
    assert proc2.model_spec == proc.model_spec
    assert proc2.time_step == proc.time_step
    # The checkpoint holds the state at the last multiple of
    # checkpoint_every == num_blocks, i.e. the final state.
    np.testing.assert_allclose(np.asarray(proc_input2.state.pos),
                               np.asarray(result.state.pos))
    # And a continuation run starts from it cleanly.
    result2 = proc2.evolve({"num_blocks": 2, "burn_in_blocks": 0,
                            "checkpoint_file": None}).exec(proc_input2)
    assert np.isfinite(result2.data.blocks.energy.mean)


def test_block_fn_compiles_once():
    """The jit-retrace discipline guard (the TPU analog of the
    reference's numba memory-leak monitoring,
    ``tests/mrbp_qmc/test_dmc.py:223``): iterating blocks must not
    retrace or recompile the block kernel."""
    spec = mrbp.Spec(**MODEL_CONFIG)
    sampling = dmc_sampler.Sampling(spec, time_step=1e-3,
                                    max_num_walkers=64,
                                    target_num_walkers=48, rng_seed=5)
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(48)])
    state = sampling.build_state(confs)
    blocks = sampling.blocks(state, num_time_steps_block=4)
    for _ in range(4):
        next(blocks)
    block_fn = sampling._block_fn_measure
    assert block_fn._cache_size() == 1


def test_checkpoint_restore_with_cm_diffusion(tmp_path):
    """Restoring a checkpoint of a cm_diffusion run must open a fresh
    CM window instead of crashing on the absent accumulator
    (regression: the HDF5 state has no cmd_accum, and blocks() called
    zeros_like(None) — found by the hardware kill/restore soak)."""
    ckpt = str(tmp_path / "cmd-ckpt.h5")
    proc = dmc_exec.Proc(model_spec=mrbp.Spec(**MODEL_CONFIG),
                         time_step=1e-3, max_num_walkers=64,
                         target_num_walkers=48, num_blocks=2,
                         num_time_steps_block=8, burn_in_blocks=0,
                         rng_seed=3, dtype="float64",
                         cm_diffusion_spec=dmc_exec.CMDiffusionEstSpec(
                             window_blocks=1),
                         checkpoint_file=ckpt, checkpoint_every=1)
    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    proc.exec(proc_input)

    proc2, proc_input2 = dmc_exec.Proc.restore_checkpoint(ckpt)
    assert proc_input2.state.cmd_accum is None  # not persisted
    result = proc2.evolve({"num_blocks": 2, "burn_in_blocks": 0,
                           "checkpoint_file": None}).exec(proc_input2)
    cmd = result.data.blocks.cm_diffusion
    assert cmd is not None and cmd.num_windows == 2
    ratio, err = cmd.effective_mass_ratio()
    assert np.isfinite(ratio) and np.isfinite(err)
