"""The ``analyze`` report: physics rendered from stored HDF5 results."""
import pathlib
import shutil

import pytest

from tests.warn_utils import expect_opt_block_warning
import yaml
from click.testing import CliRunner

from phd_qmclib_tpu import mrbp_cli
from phd_qmclib_tpu.qmc_exec import cli_app
from phd_qmclib_tpu.qmc_exec.config import Loader
from phd_qmclib_tpu.qmc_exec.report import (find_result_groups,
                                            report_hdf5)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture()
def dmc_result_file(tmp_path):
    shutil.copy(FIXTURES / "dmc-cli-app-spec.yml", tmp_path)
    config = Loader().load(tmp_path / "dmc-cli-app-spec.yml")
    with pytest.warns(DeprecationWarning):
        app = cli_app.CLIApp.from_config(config, "dmc")
    results = app.exec()
    return tmp_path / "test-out-file.h5", results[0]


class TestReport:

    def test_find_result_groups(self, dmc_result_file):
        path, _ = dmc_result_file
        assert find_result_groups(str(path)) == [("dmc-proc-ID0", "dmc")]

    def test_dmc_report_values(self, dmc_result_file):
        path, result = dmc_result_file
        with expect_opt_block_warning():
            text = report_hdf5(str(path))
        nop = result.proc.model_spec.boson_number
        e_per_boson = float(result.data.blocks.energy.mean) / nop
        assert "== DMC result ==" in text
        assert "dmc-proc-ID0" in text
        assert f"N = {nop} bosons" in text
        # The rendered energy matches the blocks statistic.
        assert f"E/N = {e_per_boson:.6g}" in text
        # The fixture enables S(k) and the OBDM.
        assert "S(k)" in text
        assert "OBDM" in text
        assert "condensate fraction" in text
        assert "correlation tau_int" in text
        # Population renders PER-STEP averages (block totals are sums
        # over the block's steps).
        import re
        pct = float(re.search(r"\(([\d.]+)% of target\)", text).group(1))
        assert 50.0 < pct < 150.0

    def test_full_tables(self, dmc_result_file):
        path, result = dmc_result_file
        with expect_opt_block_warning():
            text = report_hdf5(str(path), full=True)
        # One line per displacement-grid point.
        num_pos = result.proc.obd_spec.num_pos
        assert text.count("sz = ") == num_pos

    def test_group_filter_and_errors(self, dmc_result_file):
        path, _ = dmc_result_file
        with expect_opt_block_warning():
            assert "== DMC result ==" in report_hdf5(
                str(path), group="dmc-proc-ID0")
        with pytest.raises(ValueError, match="no matching results"):
            report_hdf5(str(path), group="nope")
        with pytest.raises(ValueError, match="no matching results"):
            report_hdf5(str(path), sampling_type="vmc")

    def test_cli_analyze(self, dmc_result_file, monkeypatch):
        path, _ = dmc_result_file
        monkeypatch.chdir(path.parent)
        runner = CliRunner()
        with expect_opt_block_warning():
            out = runner.invoke(mrbp_cli.dmc_cli,
                                ["analyze", path.name])
        assert out.exit_code == 0, out.output
        assert "E/N = " in out.output

    def test_cli_analyze_json(self, dmc_result_file, monkeypatch):
        import json

        path, result = dmc_result_file
        monkeypatch.chdir(path.parent)
        runner = CliRunner()
        with expect_opt_block_warning():
            out = runner.invoke(mrbp_cli.dmc_cli,
                                ["analyze", path.name, "--json"])
        assert out.exit_code == 0, out.output
        payload = json.loads(out.output)
        assert isinstance(payload, list) and payload
        entry = payload[0]
        nop = result.proc.model_spec.boson_number
        assert entry["sampling_type"] == "dmc"
        assert entry["energy_per_particle"] == pytest.approx(
            float(result.data.blocks.energy.mean) / nop)
        assert entry["model_spec"]["boson_number"] == nop
        # Curves present when the run measured them.
        if result.data.blocks.ss_factor is not None:
            assert len(entry["ssf"]) == len(entry["ssf_err"])

    def test_cli_analyze_vmc(self, tmp_path, monkeypatch):
        shutil.copy(FIXTURES / "vmc-cli-app-spec.yml", tmp_path)
        monkeypatch.chdir(tmp_path)
        runner = CliRunner()
        assert runner.invoke(mrbp_cli.vmc_cli,
                             ["start", "vmc-cli-app-spec.yml"]) \
            .exit_code == 0
        with expect_opt_block_warning():
            out = runner.invoke(mrbp_cli.vmc_cli,
                                ["analyze", "vmc-out.h5", "--full"])
        assert out.exit_code == 0, out.output
        assert "== VMC result ==" in out.output
        assert "variational upper bound" in out.output


def test_exact_ll_reference_lines_for_free_gas_runs():
    """A v0 = 0 run's report carries the exact Bethe-ansatz reference
    (E/N with a sigma deviation, c, K) and the JSON summary the full
    exact block; lattice runs carry neither."""
    import numpy as np

    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
    from phd_qmclib_tpu.qmc_exec.report import describe_dmc, summarize
    from phd_qmclib_tpu.lieb_liniger import ground_state
    from tests.warn_utils import expect_opt_block_warning

    spec = dict(lattice_depth=0.0, lattice_ratio=1.0,
                interaction_strength=2.0, boson_number=8,
                supercell_size=8.0, tbf_contact_cutoff=2.0)
    proc = dmc_exec.Proc(
        model_spec=mrbp.Spec(**spec), time_step=2e-3,
        max_num_walkers=144, target_num_walkers=128, num_blocks=4,
        num_time_steps_block=32, burn_in_blocks=2, rng_seed=5,
        dtype="float64")
    pin = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="REGULAR"), proc)
    result = proc.exec(pin)
    with expect_opt_block_warning():
        report = describe_dmc(result, full=False)
    assert "exact Lieb-Liniger" in report
    with expect_opt_block_warning():
        s = summarize(result, "dmc")
    exact = s["exact_lieb_liniger"]
    gs = ground_state(2.0 / (2 * 1.0), density=1.0, num_points=256)
    assert exact["e_per_particle"] == gs["e"]
    assert exact["luttinger_k"] == gs["luttinger_k"]
    # The coupling map carries the model's n^2 reduction
    # (gamma = gn/(2 n^2), models/mrbp.py lgm) — pinned away from
    # n = 1 where both conventions coincide (verified on chip: 5
    # densities land within 1.5-6.6 sigma of exact ONLY under this
    # map, eos_sound_speed.py).
    from phd_qmclib_tpu.qmc_exec.report import _exact_ll_reference

    half = _exact_ll_reference(mrbp.Spec(**{**spec,
                                            "supercell_size": 16.0,
                                            "tbf_contact_cutoff": 4.0}))
    gs_half = ground_state(2.0 / (2 * 0.5 ** 2), density=0.5,
                           num_points=256)
    assert half["e"] == gs_half["e"]
    assert half["sound_speed"] == gs_half["sound_speed"]
    # The short f64 run really sits near the exact energy (coarse
    # gate: dt bias + 4 tiny blocks; the precision version is the
    # chip benchmark eos_sound_speed.py, 2.8e-3 absolute).
    assert abs(s["energy_per_particle"] - gs["e"]) < 0.1
    # Lattice runs: no exact line.
    proc_latt = dmc_exec.Proc(
        model_spec=mrbp.Spec(**{**spec, "lattice_depth": 4.0,
                                "tbf_contact_cutoff": 0.3}),
        time_step=2e-3, max_num_walkers=96, target_num_walkers=64,
        num_blocks=3, num_time_steps_block=16, burn_in_blocks=1,
        rng_seed=5, dtype="float64")
    pin2 = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc_latt)
    res2 = proc_latt.exec(pin2)
    with expect_opt_block_warning():
        assert "exact Lieb-Liniger" not in describe_dmc(res2)
    with expect_opt_block_warning():
        assert "exact_lieb_liniger" not in summarize(res2, "dmc")


def test_exact_ll_variational_gap_in_vmc_report():
    """VMC reports on the free gas quote the exact energy and the
    variational gap (trial-function quality readout)."""
    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec
    from phd_qmclib_tpu.qmc_exec.report import describe_vmc

    proc = vmc_exec.Proc(
        model_spec=mrbp.Spec(lattice_depth=0.0, lattice_ratio=1.0,
                             interaction_strength=2.0, boson_number=8,
                             supercell_size=8.0,
                             tbf_contact_cutoff=2.0),
        move_spread=0.5, num_walkers=64, num_blocks=4,
        num_steps_block=32, burn_in_blocks=2, rng_seed=9,
        dtype="float64")
    pin = vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    result = proc.exec(pin)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        report = describe_vmc(result)
    assert "variational gap" in report
    (line,) = [ln for ln in report.splitlines()
               if "variational gap" in ln]
    # The gap the line quotes must be non-negative (within noise): the
    # VMC energy bounds the exact one from above.
    assert float(line.split("gap")[1].split("(")[0]) > -0.05


def test_luttinger_obdm_line_carries_upper_bound_caveat():
    """The OBDM-tail K is biased high (BASELINE.md Luttinger study);
    the report must say so inline instead of presenting it as 'the'
    Luttinger parameter (VERDICT r3 weak #6)."""
    from types import SimpleNamespace

    import numpy as np

    from phd_qmclib_tpu.qmc_exec.report import _luttinger_lines

    sc, nop = 8.0, 8
    d = np.linspace(0.0, 0.5 * sc, 12)
    # Clean power-law envelope n1 ~ |chord|^{-1/2K} with K = 2.
    chord = np.abs(2 * sc / np.pi * np.sin(np.pi * d / sc))
    n1 = np.where(chord > 0, chord, 1.0) ** (-1.0 / (2 * 2.0))
    n1[0] = 1.0
    blocks = SimpleNamespace(
        one_body_dm=SimpleNamespace(mean=n1, mean_error=0.01 * n1),
        ss_factor=None, cm_diffusion=None)
    proc = SimpleNamespace(obd_spec=object(),
                           model_spec=SimpleNamespace(lattice_depth=0.0))
    lines = _luttinger_lines(blocks, proc, nop, sc)
    assert lines and "K from the OBDM tail" in lines[0]
    caveat = "\n".join(lines[1:])
    assert "UPPER bound" in caveat and "hydrodynamic" in caveat
