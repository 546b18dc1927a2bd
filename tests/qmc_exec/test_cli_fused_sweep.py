"""``fused_sweep: true`` in a multi-proc config: the CLI app layer runs
the DMC procedures as one fused dispatch stream and each output file is
bit-identical to the sequential run's."""
import pathlib

import h5py
import numpy as np
import pytest
import yaml

from phd_qmclib_tpu.qmc_exec import cli_app
from phd_qmclib_tpu.qmc_exec.config import Loader


def _config(tmp_path, fused: bool, subdir: str):
    out = tmp_path / subdir
    out.mkdir()
    spec = {
        "meta": {"name": "fused sweep test"},
        "app_spec": [],
    }
    if fused:
        spec["fused_sweep"] = True
    for i, gn in enumerate([0.5, 2.0]):
        spec["app_spec"].append({
            "proc": {
                "model_spec": {
                    "lattice_depth": 10, "lattice_ratio": 1,
                    "interaction_strength": gn, "boson_number": 5,
                    "supercell_size": 5.0, "tbf_contact_cutoff": 0.3,
                },
                "time_step": 1e-3, "num_blocks": 2,
                "num_time_steps_block": 8, "burn_in_blocks": 1,
                "max_num_walkers": 32, "target_num_walkers": 24,
                "rng_seed": 41 + i, "dtype": "float64",
                "ssf_spec": {"num_modes": 3, "as_pure_est": True},
            },
            "proc_input": {"type": "MODEL_SYS_CONF",
                           "dist_type": "RANDOM"},
            "proc_output": {"type": "HDF5_FILE",
                            "location": str(out / f"row{i}.h5"),
                            "group": "dmc"},
        })
    path = tmp_path / f"{subdir}.yml"
    path.write_text(yaml.safe_dump(spec))
    return path, out


@pytest.mark.slow
def test_fused_sweep_config_matches_sequential(tmp_path):
    fused_cfg, fused_dir = _config(tmp_path, True, "fused")
    seq_cfg, seq_dir = _config(tmp_path, False, "seq")

    fused_app = cli_app.CLIApp.from_config(Loader().load(fused_cfg),
                                           "dmc")
    assert fused_app.fused_sweep
    fused_app.exec()
    seq_app = cli_app.CLIApp.from_config(Loader().load(seq_cfg), "dmc")
    assert not seq_app.fused_sweep
    seq_app.exec()

    for i in range(2):
        with h5py.File(fused_dir / f"row{i}.h5", "r") as ff, \
                h5py.File(seq_dir / f"row{i}.h5", "r") as sf:
            for name in ("energy", "weight", "num_walkers"):
                np.testing.assert_allclose(
                    np.asarray(ff[f"dmc/dmc/data/blocks/{name}/totals"]),
                    np.asarray(sf[f"dmc/dmc/data/blocks/{name}/totals"]),
                    rtol=1e-12, err_msg=f"row {i} {name}")
            np.testing.assert_allclose(
                np.asarray(ff["dmc/dmc/state/confs"]),
                np.asarray(sf["dmc/dmc/state/confs"]), rtol=1e-12)


def _vmc_config(tmp_path, fused: bool, subdir: str):
    out = tmp_path / subdir
    out.mkdir()
    spec = {
        "meta": {"name": "vmc fused sweep test"},
        "app_spec": [],
    }
    if fused:
        spec["fused_sweep"] = True
    for i, gn in enumerate([0.5, 2.0]):
        spec["app_spec"].append({
            "proc": {
                "model_spec": {
                    "lattice_depth": 10, "lattice_ratio": 1,
                    "interaction_strength": gn, "boson_number": 5,
                    "supercell_size": 5.0, "tbf_contact_cutoff": 0.3,
                },
                "move_spread": 0.25, "num_blocks": 2,
                "num_steps_block": 32, "burn_in_blocks": 1,
                "num_walkers": 8, "rng_seed": 61 + i,
                "dtype": "float64",
                "ssf_spec": {"num_modes": 3},
                "pair_corr_spec": {"num_bins": 6},
            },
            "proc_input": {"type": "MODEL_SYS_CONF",
                           "dist_type": "RANDOM"},
            "proc_output": {"type": "HDF5_FILE",
                            "location": str(out / f"row{i}.h5"),
                            "group": "vmc"},
        })
    path = tmp_path / f"{subdir}.yml"
    path.write_text(yaml.safe_dump(spec))
    return path, out


def test_vmc_fused_sweep_config_matches_sequential(tmp_path):
    """VMC fused-sweep parity with the sequential CLI run (the VMC
    analog of the DMC gate above; rows vmap-fuse via VmcSweep)."""
    fused_cfg, fused_dir = _vmc_config(tmp_path, True, "vfused")
    seq_cfg, seq_dir = _vmc_config(tmp_path, False, "vseq")

    fused_app = cli_app.CLIApp.from_config(Loader().load(fused_cfg),
                                           "vmc")
    assert fused_app.fused_sweep
    fused_app.exec()
    seq_app = cli_app.CLIApp.from_config(Loader().load(seq_cfg), "vmc")
    seq_app.exec()

    for i in range(2):
        with h5py.File(fused_dir / f"row{i}.h5", "r") as ff, \
                h5py.File(seq_dir / f"row{i}.h5", "r") as sf:
            np.testing.assert_allclose(
                np.asarray(ff["vmc/vmc/data/blocks/energy/totals"]),
                np.asarray(sf["vmc/vmc/data/blocks/energy/totals"]),
                rtol=1e-12, err_msg=f"row {i} energy")
            np.testing.assert_allclose(
                np.asarray(
                    ff["vmc/vmc/data/blocks/ss_factor/"
                       "fdk_sqr_abs/totals"]),
                np.asarray(
                    sf["vmc/vmc/data/blocks/ss_factor/"
                       "fdk_sqr_abs/totals"]),
                rtol=1e-12, err_msg=f"row {i} ssf")
            np.testing.assert_allclose(
                np.asarray(ff["vmc/vmc/data/blocks/pair_corr/totals"]),
                np.asarray(sf["vmc/vmc/data/blocks/pair_corr/totals"]),
                rtol=1e-12, err_msg=f"row {i} g2")
            np.testing.assert_allclose(
                np.asarray(ff["vmc/vmc/state/sys_conf"]),
                np.asarray(sf["vmc/vmc/state/sys_conf"]), rtol=1e-12)


@pytest.mark.slow
def test_fused_sweep_mesh_config(tmp_path):
    """``fused_sweep_mesh: [R, W]``: the YAML-reachable 2-D meshed
    fused sweep.  Each row's output must match its standalone run on a
    same-size 1-D walker mesh bit-exactly (the sampler-level
    guarantee, here through the whole config/CLI/IO stack)."""
    from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec

    mesh_cfg, mesh_dir = _config(tmp_path, True, "meshed")
    spec = yaml.safe_load(mesh_cfg.read_text())
    spec["fused_sweep_mesh"] = [2, 2]
    mesh_cfg.write_text(yaml.safe_dump(spec))

    app = cli_app.CLIApp.from_config(Loader().load(mesh_cfg), "dmc")
    assert app.fused_sweep_mesh == (2, 2)
    app.exec()

    # Standalone reference per row: same config on a 2-device walker
    # mesh (same seed -> same confs -> bit-identical trajectories).
    for i, row_cfg in enumerate(spec["app_spec"]):
        proc = dmc_exec.Proc.from_config(
            dict(row_cfg["proc"], num_mesh_devices=2))
        res = proc.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))
        with h5py.File(mesh_dir / f"row{i}.h5", "r") as ff:
            np.testing.assert_array_equal(
                np.asarray(ff["dmc/dmc/data/blocks/energy/totals"]),
                res.data.blocks.energy.totals,
                err_msg=f"meshed CLI row {i} diverged from standalone")


def test_fused_sweep_mesh_validation(tmp_path):
    cfg, _ = _config(tmp_path, False, "badmesh")
    spec = yaml.safe_load(cfg.read_text())
    spec["fused_sweep_mesh"] = [2, 2]
    cfg.write_text(yaml.safe_dump(spec))
    with pytest.raises(ValueError, match="fused_sweep: true"):
        cli_app.CLIApp.from_config(Loader().load(cfg), "dmc")
    spec["fused_sweep"] = True
    spec["fused_sweep_mesh"] = [3]
    cfg.write_text(yaml.safe_dump(spec))
    with pytest.raises(ValueError, match="rows, walker_devices"):
        cli_app.CLIApp.from_config(Loader().load(cfg), "dmc")
    spec["fused_sweep_mesh"] = [3, 2]   # rows != procedures
    cfg.write_text(yaml.safe_dump(spec))
    app = cli_app.CLIApp.from_config(Loader().load(cfg), "dmc")
    with pytest.raises(ValueError, match="must equal the number"):
        app.exec()
