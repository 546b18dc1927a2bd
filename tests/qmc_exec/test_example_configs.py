"""The committed example configs must parse into valid apps, and a
scaled-down exec of each flavor must run end to end."""
import pathlib

import numpy as np
import pytest

from phd_qmclib_tpu.qmc_exec import cli_app
from phd_qmclib_tpu.qmc_exec.config import Loader

EXAMPLES = pathlib.Path(__file__).parents[2] / "examples"


@pytest.mark.parametrize("name,flavor", [
    ("dmc_production.yml", "dmc"),
    ("eos_fused_sweep.yml", "dmc"),
    ("vmc_variational.yml", "vmc"),
])
def test_example_config_builds(name, flavor):
    config = Loader().load(EXAMPLES / name)
    app = cli_app.CLIApp.from_config(config, flavor)
    assert app.app_spec
    for spec in app.app_spec:
        # Specs materialize fully (validators run; sampler shapes ok).
        assert spec.proc.sampling is not None


def _shrink(proc_cfg, tmp_path, **overrides):
    cfg = dict(proc_cfg)
    cfg.update(overrides)
    if "checkpoint_file" in cfg:
        cfg["checkpoint_file"] = str(tmp_path / "ck.h5")
    return cfg


def test_production_config_execs_scaled_down(tmp_path):
    config = Loader().load(EXAMPLES / "dmc_production.yml")
    spec_cfg = config["app_spec"][0]
    proc_cfg = _shrink(spec_cfg["proc"], tmp_path,
                       max_num_walkers=48, target_num_walkers=32,
                       num_blocks=2, num_time_steps_block=16,
                       burn_in_blocks=1, dtype="float64", est_every=2,
                       density_spec={"num_bins": 8, "as_pure_est": True},
                       ssf_spec={"num_modes": 4, "as_pure_est": True,
                                 "pfw_num_time_steps": 16},
                       obd_spec={"num_pos": 4, "as_pure_est": True},
                       cm_diffusion_spec={"window_blocks": 2},
                       # Scale the lag depth with the run (deep lags
                       # cannot fill 2 x 16 steps at cadence 2 x 2);
                       # keep the shipped config's pure estimator.
                       itc_spec={"num_modes": 4, "num_lags": 3,
                                 "est_every_mult": 2,
                                 "as_pure_est": True})
    proc_cfg["model_spec"] = dict(proc_cfg["model_spec"],
                                  boson_number=5, supercell_size=5.0)
    out = str(tmp_path / "out.h5")
    app = cli_app.CLIApp.from_config({
        "app_spec": [{
            "proc": proc_cfg,
            "proc_input": {"type": "MODEL_SYS_CONF",
                           "dist_type": "RANDOM"},
            "proc_output": {"type": "HDF5_FILE", "location": out,
                            "group": "run1"},
        }]}, "dmc")
    (result,) = app.exec()
    assert np.isfinite(result.data.blocks.energy.mean)
    assert result.data.blocks.cm_diffusion is not None
    assert result.data.blocks.itc is not None
