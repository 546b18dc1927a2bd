"""Config/CLI tests: YAML+TOML app specs parsed and executed, template
rendering, CLI invocation (reference pattern:
``/root/reference/tests/mrbp_qmc/test_dmc_exec_cli_app.py``).
"""
import pathlib
import shutil

import h5py
import pytest
import yaml
from click.testing import CliRunner

from phd_qmclib_tpu import mrbp_cli
from phd_qmclib_tpu.qmc_exec import cli_app
from phd_qmclib_tpu.qmc_exec.config import Loader, Template

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture()
def workdir(tmp_path):
    shutil.copy(FIXTURES / "dmc-cli-app-spec.yml", tmp_path)
    shutil.copy(FIXTURES / "dmc-template.yml.j2", tmp_path)
    return tmp_path


class TestLoader:

    def test_yaml_load_and_path_fixing(self, workdir):
        config = Loader().load(workdir / "dmc-cli-app-spec.yml")
        app_spec = config["app_spec"][0]
        # Relative output location resolved against the config dir.
        assert app_spec["proc_output"]["location"].startswith(str(workdir))

    def test_toml_load(self, workdir):
        # The same schema as TOML.
        config = Loader().load(workdir / "dmc-cli-app-spec.yml")
        app = config["app_spec"][0]
        toml_text = f"""
[meta]
name = "toml test"
description = "d"
author = "a"
author_email = "e"
institution = "i"
category = "c"
tags = ["t"]

[[app_spec]]
proc_id = 7

[app_spec.proc]
time_step = 1e-3
num_blocks = 2
num_time_steps_block = 8
burn_in_blocks = 0
max_num_walkers = 32
target_num_walkers = 24
dtype = "float64"

[app_spec.proc.model_spec]
lattice_depth = 10
lattice_ratio = 1
interaction_strength = 1.0
boson_number = 5
supercell_size = 5.0
tbf_contact_cutoff = 0.3

[app_spec.proc_input]
type = "MODEL_SYS_CONF"
dist_type = "RANDOM"

[app_spec.proc_output]
type = "HDF5_FILE"
location = "./toml-out.h5"
group = "dmc"
"""
        toml_path = workdir / "spec.toml"
        toml_path.write_text(toml_text)
        config = Loader().load(toml_path)
        assert config["app_spec"][0]["proc_id"] == 7
        app = cli_app.CLIApp.from_config(config, "dmc")
        assert app.app_spec[0].proc.num_blocks == 2

    def test_legacy_main_proc_set_key(self, workdir):
        raw = yaml.safe_load((workdir / "dmc-cli-app-spec.yml").read_text())
        raw["main_proc_set"] = raw.pop("app_spec")
        legacy = workdir / "legacy.yml"
        legacy.write_text(yaml.safe_dump(raw))
        config = Loader().load(legacy)
        assert "app_spec" in config


class TestCLIApp:

    def test_from_config_and_exec(self, workdir):
        config = Loader().load(workdir / "dmc-cli-app-spec.yml")
        with pytest.warns(DeprecationWarning):
            app = cli_app.CLIApp.from_config(config, "dmc")
        assert app.meta.tags == "#qmc - #dmc - #multi-rods"
        spec = app.app_spec[0]
        assert spec.proc_id == 101
        assert spec.proc.num_blocks == 4

        results = app.exec()
        out_file = workdir / "test-out-file.h5"
        assert out_file.exists()
        with h5py.File(out_file, "r") as fp:
            assert "dmc-proc-ID0/dmc/state" in fp
            assert "dmc-proc-ID0/dmc/data/blocks/energy/totals" in fp
            assert "dmc-proc-ID0/dmc/data/blocks/one_body_dm" in fp
        assert len(results) == 1

    def test_restart_from_hdf5_input(self, workdir):
        config = Loader().load(workdir / "dmc-cli-app-spec.yml")
        with pytest.warns(DeprecationWarning):
            app = cli_app.CLIApp.from_config(config, "dmc")
        app.exec()
        # Second app: input from the produced HDF5 file.
        raw = yaml.safe_load((workdir / "dmc-cli-app-spec.yml").read_text())
        stanza = raw["app_spec"][0]
        stanza["proc_input"] = {
            "type": "HDF5_FILE",
            "location": "./test-out-file.h5",
            "group": "dmc-proc-ID0",
        }
        stanza["proc_output"]["location"] = "./restart-out.h5"
        restart_yml = workdir / "restart.yml"
        restart_yml.write_text(yaml.safe_dump(raw))
        config2 = Loader().load(restart_yml)
        with pytest.warns(DeprecationWarning):
            app2 = cli_app.CLIApp.from_config(config2, "dmc")
        app2.exec()
        assert (workdir / "restart-out.h5").exists()


class TestVmcCLI:

    def test_vmc_start(self, tmp_path, monkeypatch):
        shutil.copy(FIXTURES / "vmc-cli-app-spec.yml", tmp_path)
        monkeypatch.chdir(tmp_path)
        runner = CliRunner()
        result = runner.invoke(mrbp_cli.vmc_cli,
                               ["start", "vmc-cli-app-spec.yml"])
        assert result.exit_code == 0, result.output
        out = tmp_path / "vmc-out.h5"
        assert out.exists()
        with h5py.File(out, "r") as fp:
            assert "vmc-proc-ID0/vmc/state/sys_conf" in fp
            assert "vmc-proc-ID0/vmc/data/blocks/ss_factor" in fp
            assert "vmc-proc-ID0/vmc/data/blocks/one_body_dm" in fp


class TestCLI:

    def test_proc_template_and_start(self, workdir, monkeypatch):
        monkeypatch.chdir(workdir)
        runner = CliRunner()
        result = runner.invoke(
            mrbp_cli.dmc_cli,
            ["proc-template", "dmc-template.yml.j2", "-o", "run.yml"])
        assert result.exit_code == 0, result.output
        rendered = yaml.safe_load((workdir / "run.yml").read_text())
        # Unit constants were substituted.
        assert rendered["app_spec"][0]["proc"]["model_spec"][
            "lattice_depth"] == pytest.approx(9.8696, rel=1e-4)

        result = runner.invoke(mrbp_cli.dmc_cli, ["start", "run.yml"])
        assert result.exit_code == 0, result.output
        assert (workdir / "run.h5").exists()


class TestEdges:

    def test_unknown_io_handler_type(self):
        with pytest.raises(TypeError, match="unknown handler type"):
            cli_app.get_io_handler({"type": "CSV_FILE"}, "dmc")

    def test_app_meta_partial_config_and_tag_join(self):
        meta = cli_app.AppMeta.from_config(
            {"name": "x", "tags": ["a", "b"]})
        assert meta.tags == "#a - #b"
        assert meta.author == ""

    def test_output_must_be_hdf5(self, workdir):
        config = Loader().load(workdir / "dmc-cli-app-spec.yml")
        stanza = dict(config["app_spec"][0])
        stanza["proc_output"] = {"type": "MODEL_SYS_CONF",
                                 "dist_type": "RANDOM"}
        with pytest.raises(TypeError, match="HDF5_FILE"), \
                pytest.warns(DeprecationWarning):
            cli_app.AppSpec.from_config(stanza, "dmc")


class TestTemplate:

    def test_render_context(self, workdir):
        tpl = Template(workdir / "dmc-template.yml.j2",
                       vars=mrbp_cli.TEMPLATE_VARS)
        text = tpl.render(dict(mrbp_cli.TEMPLATE_VARS,
                               template_name="t", config_filename="c"))
        data = yaml.safe_load(text)
        assert data["app_spec"][0]["proc_output"]["location"] == "./c.h5"


def test_loader_resolves_checkpoint_file_config_relative(tmp_path):
    """Relative IO locations resolve against the config file's
    directory (reference behavior, ``qmc_exec/config.py:78-108``);
    the mid-run ``checkpoint_file`` — an extension — must resolve the
    SAME way, or one run's files split across two directories (found
    by the round-5 production chip run: output landed next to the
    config, the 305 MB checkpoint in the process CWD)."""
    import yaml

    from phd_qmclib_tpu.qmc_exec.config import Loader

    cfg = {
        "app_spec": [{
            "proc": {
                "model_spec": {
                    "lattice_depth": 0.0, "lattice_ratio": 1.0,
                    "interaction_strength": 1.0, "boson_number": 5,
                    "supercell_size": 5.0, "tbf_contact_cutoff": 0.3,
                },
                "time_step": 1e-3, "max_num_walkers": 48,
                "target_num_walkers": 32, "num_blocks": 2,
                "num_time_steps_block": 8,
                "checkpoint_file": "run.ckpt.h5",
            },
            "proc_input": {"type": "MODEL_SYS_CONF",
                           "dist_type": "RANDOM"},
            "proc_output": {"type": "HDF5_FILE",
                            "location": "run.h5", "group": "g"},
        }],
    }
    sub = tmp_path / "configs"
    sub.mkdir()
    path = sub / "app.yml"
    path.write_text(yaml.safe_dump(cfg))
    loaded = Loader().load(path)
    spec = loaded["app_spec"][0]
    assert spec["proc_output"]["location"] == str(sub / "run.h5")
    assert spec["proc"]["checkpoint_file"] == str(sub / "run.ckpt.h5")
    # Absolute paths pass through untouched.
    cfg["app_spec"][0]["proc"]["checkpoint_file"] = "/abs/c.h5"
    path.write_text(yaml.safe_dump(cfg))
    loaded = Loader().load(path)
    assert loaded["app_spec"][0]["proc"]["checkpoint_file"] \
        == "/abs/c.h5"
