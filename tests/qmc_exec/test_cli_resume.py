"""``mrbp-{dmc,vmc} resume`` — finish a killed run from its mid-run
checkpoint through the CLI, bit-exactly.

The reference has no mid-run recovery at all (its state saves happen
only at procedure completion, ``qmc_exec/dmc/io.py:35-80``); here a
production kill needs one command, not Python.
"""
import numpy as np
import pytest
from click.testing import CliRunner

from phd_qmclib_tpu import mrbp_cli
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec, vmc as vmc_exec
from phd_qmclib_tpu.qmc_exec.io import (DmcHDF5FileHandler,
                                        VmcHDF5FileHandler)

from tests.qmc_exec.test_checkpoint import kill_after_checkpoint

MODEL = {
    "lattice_depth": 10.0, "lattice_ratio": 1,
    "interaction_strength": 1.5, "boson_number": 5,
    "supercell_size": 5.0, "tbf_contact_cutoff": 0.3,
}


def _dmc_cfg(ckpt):
    return {
        "model_spec": dict(MODEL), "time_step": 1e-3,
        "max_num_walkers": 96, "target_num_walkers": 64,
        "num_blocks": 6, "num_time_steps_block": 8,
        "burn_in_blocks": 1, "rng_seed": 21, "dtype": "float64",
        "density_spec": {"num_bins": 8, "as_pure_est": True,
                         "pfw_num_time_steps": 16},
        # checkpoint at block 3 = INSIDE the 2-block pure window, so
        # the resume also exercises the window-carry restore.
        "checkpoint_file": ckpt, "checkpoint_every": 3,
    }


def test_dmc_resume_command_bit_exact(tmp_path, monkeypatch):
    ckpt = str(tmp_path / "run.ckpt.h5")
    cfg = _dmc_cfg(ckpt)
    proc = dmc_exec.Proc.from_config(cfg)
    pin = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)

    # The uninterrupted run (same seed/state) is the oracle.
    full = dmc_exec.Proc.from_config(
        {**cfg, "checkpoint_file": None}).exec(
        dmc_exec.ProcInput(pin.state))

    # Kill mid-run (inside the 2-block pure window).
    killed = kill_after_checkpoint(monkeypatch, dmc_exec.Proc,
                                   at_blocks=3)
    with pytest.raises(killed):
        proc.exec(pin)

    out = str(tmp_path / "resumed.h5")
    res = CliRunner().invoke(mrbp_cli.dmc_cli,
                             ["resume", ckpt, out, "-g", "rerun"])
    assert res.exit_code == 0, res.output
    assert "Resuming at block 3/6" in res.output

    loaded = DmcHDF5FileHandler(location=out, group="rerun").load()
    np.testing.assert_array_equal(np.asarray(loaded.state.pos),
                                  np.asarray(full.state.pos))
    np.testing.assert_array_equal(loaded.data.blocks.energy.totals,
                                  full.data.blocks.energy.totals)
    np.testing.assert_array_equal(
        loaded.data.blocks.density.totals,
        full.data.blocks.density.totals)


def test_vmc_resume_command_bit_exact(tmp_path, monkeypatch):
    ckpt = str(tmp_path / "vrun.ckpt.h5")
    cfg = {
        "model_spec": dict(MODEL), "move_spread": 0.25,
        "num_blocks": 5, "num_steps_block": 16, "burn_in_blocks": 1,
        "num_walkers": 16, "rng_seed": 31, "dtype": "float64",
        "ssf_spec": {"num_modes": 3},
        "checkpoint_file": ckpt, "checkpoint_every": 2,
    }
    proc = vmc_exec.Proc.from_config(cfg)
    pin = vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    full = vmc_exec.Proc.from_config(
        {**cfg, "checkpoint_file": None}).exec(
        vmc_exec.ProcInput(pin.state))

    killed = kill_after_checkpoint(monkeypatch, vmc_exec.Proc,
                                   at_blocks=2)
    with pytest.raises(killed):
        proc.exec(pin)

    out = str(tmp_path / "vresumed.h5")
    res = CliRunner().invoke(mrbp_cli.vmc_cli,
                             ["resume", ckpt, out, "--no-checkpointing"])
    assert res.exit_code == 0, res.output

    loaded = VmcHDF5FileHandler(location=out, group="resumed").load()
    np.testing.assert_array_equal(np.asarray(loaded.state.pos),
                                  np.asarray(full.state.pos))
    np.testing.assert_array_equal(loaded.data.blocks.energy.totals,
                                  full.data.blocks.energy.totals)


def test_resume_rejects_non_checkpoint(tmp_path):
    bad = tmp_path / "not-a-ckpt.h5"
    bad.write_bytes(b"junk")
    res = CliRunner().invoke(mrbp_cli.dmc_cli,
                             ["resume", str(bad),
                              str(tmp_path / "o.h5")])
    assert res.exit_code != 0
    assert "not a readable dmc checkpoint" in res.output


def test_resume_command_on_legacy_v1_checkpoint(tmp_path):
    """A v1 checkpoint (walker state only, no resume payload) must not
    crash the CLI — it continues from the saved state with fresh
    estimator windows (regression: ``pin.resume`` is ``None`` there)."""
    import h5py

    ckpt = str(tmp_path / "legacy.ckpt.h5")
    cfg = _dmc_cfg(ckpt)
    proc = dmc_exec.Proc.from_config(cfg)
    pin = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    proc.exec(pin)
    # Strip the v2 resume payload -> a v1-shaped file.
    with h5py.File(ckpt, "a") as fp:
        del fp["checkpoint/dmc/resume"]

    out = str(tmp_path / "legacy-resumed.h5")
    res = CliRunner().invoke(mrbp_cli.dmc_cli,
                             ["resume", ckpt, out,
                              "--no-checkpointing"])
    assert res.exit_code == 0, res.output
    assert "Legacy (v1) checkpoint" in res.output
    assert "Resuming at block 0/6" in res.output
    loaded = DmcHDF5FileHandler(location=out, group="resumed").load()
    assert np.isfinite(loaded.data.blocks.energy.mean)
