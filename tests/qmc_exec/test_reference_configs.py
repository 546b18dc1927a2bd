"""The reference's OWN committed config files load and run unchanged.

`docs/MIGRATION.md` promises reference users their config files work
as-is; this test holds that promise against the actual files shipped in
the reference repo (``/root/reference/tests/mrbp_qmc/*.yml|*.toml``) —
deprecated aliases (``num_batches``/``num_time_steps_batch``/
``burn_in_batches``), ``proc_id`` tags, null burn-in, TOML and YAML.
Skipped when the reference checkout is absent.
"""
import pathlib
import shutil

import numpy as np
import pytest

from phd_qmclib_tpu.qmc_exec import cli_app
from phd_qmclib_tpu.qmc_exec.config import Loader

REF_DIR = pathlib.Path("/root/reference/tests/mrbp_qmc")

pytestmark = pytest.mark.skipif(not REF_DIR.exists(),
                                reason="reference checkout not present")


def _load(tmp_path, name):
    # Copy first: the loader resolves relative output paths against the
    # config dir, and the reference tree is read-only.
    shutil.copy(REF_DIR / name, tmp_path)
    return Loader().load(tmp_path / name)


@pytest.mark.parametrize("name,flavor,nop", [
    ("dmc-cli-app-spec.yml", "dmc", 16),
    ("dmc-cli-app-spec.toml", "dmc", 24),
    ("vmc-cli-app-spec.yml", "vmc", 16),
])
def test_reference_config_parses(tmp_path, name, flavor, nop):
    config = _load(tmp_path, name)
    with pytest.deprecated_call():
        app = cli_app.CLIApp.from_config(config, flavor)
    spec = app.app_spec[0]
    model = spec.proc.model_spec
    assert model.boson_number == nop
    assert model.supercell_size == float(nop)
    if flavor == "dmc":
        # Deprecated aliases mapped: num_batches -> num_blocks etc.
        assert spec.proc.num_blocks == 16
        assert spec.proc.num_time_steps_block == 64
        assert spec.proc.ssf_spec.num_modes == 24
        assert spec.proc.ssf_spec.as_pure_est


def test_reference_dmc_config_executes_scaled_down(tmp_path):
    config = _load(tmp_path, "dmc-cli-app-spec.yml")
    # Scale the workload down, touching nothing else.
    proc_cfg = config["app_spec"][0]["proc"]
    proc_cfg.update(num_batches=2, num_time_steps_batch=8,
                    burn_in_batches=0, max_num_walkers=48,
                    target_num_walkers=32, rng_seed=3, dtype="float64")
    with pytest.deprecated_call():
        app = cli_app.CLIApp.from_config(config, "dmc")
    app.exec()
    out = config["app_spec"][0]["proc_output"]["location"]
    import h5py

    with h5py.File(out, "r") as fp:
        group = fp["dmc-proc-ID0/dmc"]
        energy = np.asarray(group["data/blocks/energy/totals"])
        assert energy.shape == (2,)
        assert np.isfinite(energy).all()
        assert "data/blocks/ss_factor" in group
