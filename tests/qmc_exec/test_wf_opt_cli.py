"""The ``proc_type: wf_opt`` config stanza: one YAML runs
VMC -> correlated-sampling optimization -> DMC at the optimized rm*
(VERDICT r3 next #5; the reference never surfaced its ``WFOptProc``
in the config layer, ``mrbp_qmc/wf_opt/wf_opt.py:13-67``)."""
import numpy as np
import pytest
import yaml

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import cli_app, vmc as vmc_exec
from phd_qmclib_tpu.wf_opt import WFOptProc

MODEL = {
    "lattice_depth": 0.0, "lattice_ratio": 1, "interaction_strength": 4.0,
    "boson_number": 8, "supercell_size": 8.0, "tbf_contact_cutoff": 1.0,
}
VMC_PROC = {
    "model_spec": MODEL, "move_spread": 0.25, "num_blocks": 3,
    "num_steps_block": 64, "burn_in_blocks": 1, "num_walkers": 64,
    "rng_seed": 44, "dtype": "float64",
}


def pipeline_config(tmp_path, method="grad", extra_dmc=True):
    spec = {
        "meta": {"name": "wf-opt pipeline test"},
        "app_spec": [
            {"proc_type": "wf_opt", "method": method,
             "num_sys_confs": 64, "proc": VMC_PROC,
             "input": {"type": "MODEL_SYS_CONF",
                       "dist_type": "RANDOM"}},
        ],
    }
    if extra_dmc:
        spec["app_spec"].append({
            "proc": {
                "model_spec": MODEL, "time_step": 1e-3,
                "max_num_walkers": 48, "target_num_walkers": 32,
                "num_blocks": 2, "num_time_steps_block": 8,
                "burn_in_blocks": 0, "rng_seed": 45,
                "dtype": "float64",
            },
            "proc_input": {"type": "MODEL_SYS_CONF",
                           "dist_type": "RANDOM"},
            "proc_output": {"type": "HDF5_FILE",
                            "location": str(tmp_path / "out.h5"),
                            "group": "dmc-at-rm-star"},
        })
    return spec


def test_pipeline_optimizes_and_propagates_rm(tmp_path):
    config = pipeline_config(tmp_path)
    app = cli_app.CLIApp.from_config(config, "dmc")
    results = app.exec()

    opt_spec, dmc_result = results
    assert isinstance(opt_spec, mrbp.Spec)
    rm_star = opt_spec.tbf_contact_cutoff
    assert rm_star != pytest.approx(1.0)  # moved off the guess
    assert 0.05 < rm_star < 0.5 * 8.0
    # The DMC stage ran AT the optimized value, not the declared one.
    assert dmc_result.proc.model_spec.tbf_contact_cutoff \
        == pytest.approx(rm_star)
    assert np.isfinite(dmc_result.data.blocks.energy.mean)

    # Parity with the direct Python API on the identical VMC chain.
    proc = vmc_exec.Proc.from_config(dict(VMC_PROC))
    vres = proc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))
    direct = WFOptProc(num_sys_confs=64, method="grad").exec(
        proc.model_spec, np.asarray(vres.state.pos),
        np.asarray(vres.state.wf_abs_log))
    assert direct.tbf_contact_cutoff == pytest.approx(rm_star,
                                                      rel=1e-9)


def test_wf_opt_stanza_from_stored_vmc_result(tmp_path):
    """An HDF5_FILE input reuses a stored VMC run instead of
    resampling."""
    from phd_qmclib_tpu.qmc_exec.io import VmcHDF5FileHandler

    proc = vmc_exec.Proc.from_config(dict(VMC_PROC))
    vres = proc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))
    path = str(tmp_path / "vmc-store.h5")
    VmcHDF5FileHandler(path, group="var").dump(vres)

    stanza = cli_app.WFOptAppSpec.from_config({
        "proc_type": "wf_opt", "method": "grad", "num_sys_confs": 64,
        "input": {"type": "HDF5_FILE", "location": path,
                  "group": "var"}})
    opt_spec = stanza.exec()
    direct = WFOptProc(num_sys_confs=64, method="grad").exec(
        proc.model_spec, np.asarray(vres.state.pos),
        np.asarray(vres.state.wf_abs_log))
    assert opt_spec.tbf_contact_cutoff == pytest.approx(
        direct.tbf_contact_cutoff, rel=1e-9)


def test_wf_opt_stanza_validation(tmp_path):
    with pytest.raises(TypeError, match="stored VMC result"):
        cli_app.WFOptAppSpec.from_config(
            {"proc_type": "wf_opt",
             "input": {"type": "MODEL_SYS_CONF"}})
    with pytest.raises(ValueError, match="fused sweep"):
        config = pipeline_config(tmp_path, extra_dmc=False)
        config["fused_sweep"] = True
        cli_app.CLIApp.from_config(config, "dmc")


def test_example_pipeline_config_parses():
    """The shipped example stays loadable (structure only — the full
    run is production-sized)."""
    import pathlib

    path = (pathlib.Path(__file__).parents[2] / "examples"
            / "wf_opt_pipeline.yml")
    config = yaml.safe_load(path.read_text())
    assert config["app_spec"][0]["proc_type"] == "wf_opt"
    # Stanza construction validates the nested VMC proc config.
    stanza = cli_app.WFOptAppSpec.from_config(config["app_spec"][0])
    assert stanza.vmc_proc.num_walkers == 512
    assert stanza.method == "grad"


def test_pipeline_through_the_cli(tmp_path, monkeypatch):
    """End to end through ``mrbp-dmc start`` (Loader + CLIApp)."""
    import h5py
    from click.testing import CliRunner

    from phd_qmclib_tpu import mrbp_cli

    config = pipeline_config(tmp_path)
    config["app_spec"][1]["proc_output"]["location"] = "cli-out.h5"
    cfg = tmp_path / "pipeline.yml"
    cfg.write_text(yaml.safe_dump(config))
    monkeypatch.chdir(tmp_path)
    out = CliRunner().invoke(mrbp_cli.dmc_cli,
                             ["start", "pipeline.yml"])
    assert out.exit_code == 0, out.output
    with h5py.File(tmp_path / "cli-out.h5", "r") as fp:
        spec_grp = fp["dmc-at-rm-star/dmc/proc_spec"]
        rm = float(spec_grp["model_spec"].attrs["tbf_contact_cutoff"])
    assert rm != pytest.approx(1.0)  # the DMC ran at rm*, not 1.0


def test_pipeline_joint_orbital_depth(tmp_path):
    """2-D optimization through the CLI stanza: with
    ``opt_obf_lattice_depth: true`` the trial-orbital depth optimizes
    jointly with rm and BOTH knobs flow into the downstream DMC stanza
    (the reference's optimizer caps at one parameter)."""
    model = dict(MODEL, lattice_depth=10.0)
    config = pipeline_config(tmp_path)
    config["app_spec"][0]["proc"]["model_spec"] = model
    config["app_spec"][0]["opt_obf_lattice_depth"] = True
    config["app_spec"][1]["proc"]["model_spec"] = model
    app = cli_app.CLIApp.from_config(config, "dmc")
    results = app.exec()
    opt_spec, dmc_result = results
    assert opt_spec.obf_lattice_depth is not None
    assert opt_spec.obf_lattice_depth > 0
    # Both optimized knobs propagated into the DMC stage.
    dmc_spec = dmc_result.proc.model_spec
    assert dmc_spec.tbf_contact_cutoff \
        == pytest.approx(opt_spec.tbf_contact_cutoff)
    assert dmc_spec.obf_lattice_depth \
        == pytest.approx(opt_spec.obf_lattice_depth)
    assert np.isfinite(dmc_result.data.blocks.energy.mean)
