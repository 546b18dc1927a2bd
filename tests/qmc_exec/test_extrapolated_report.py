"""Extrapolated-estimator reporting: ``2 <DMC mixed> - <VMC>`` from a
matched pair of stored runs (the standard second-order correction for
the mixed-estimator trial-function bias; recommended by this
framework's own OBDM docs).
"""
import numpy as np

from tests.warn_utils import expect_opt_block_warning
import pytest
from click.testing import CliRunner

from phd_qmclib_tpu import mrbp_cli
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.qmc_exec import report
from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec
from phd_qmclib_tpu.qmc_exec.io import (DmcHDF5FileHandler,
                                        VmcHDF5FileHandler)


def make_spec(**kw):
    base = dict(lattice_depth=5.0, lattice_ratio=1.0,
                interaction_strength=2.0, boson_number=6,
                supercell_size=6.0, tbf_contact_cutoff=1.5)
    base.update(kw)
    return mrbp.Spec(**base)


def run_pair(spec, pure=False):
    dproc = dmc_exec.Proc(
        model_spec=spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, num_blocks=3, num_time_steps_block=8,
        burn_in_blocks=1, rng_seed=5, dtype="float64",
        obd_spec=dmc_exec.OBDEstSpec(num_pos=4, as_pure_est=pure),
        ssf_spec=dmc_exec.SSFEstSpec(num_modes=3, as_pure_est=pure),
        pair_corr_spec=dmc_exec.PairCorrEstSpec(num_bins=5,
                                                as_pure_est=pure))
    dres = dproc.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), dproc))
    vproc = vmc_exec.Proc(
        model_spec=spec, move_spread=0.4, num_walkers=32, num_blocks=3,
        num_steps_block=8, burn_in_blocks=1, rng_seed=6,
        dtype="float64",
        obd_spec=vmc_exec.OBDEstSpec(num_pos=4),
        ssf_spec=vmc_exec.SSFEstSpec(num_modes=3),
        pair_corr_spec=vmc_exec.PairCorrEstSpec(num_bins=5))
    vres = vproc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), vproc))
    return dres, vres


import pytest as _pytest


@_pytest.fixture(scope="module")
def default_pair():
    """The default-spec DMC+VMC pair, shared by every test that needs
    the mixed-estimator result (one exec instead of four)."""
    return run_pair(make_spec())


def test_extrapolated_math_and_lines(default_pair):
    dres, vres = default_pair
    with expect_opt_block_warning():
        text = report.describe_extrapolated(dres, vres, full=True)
    assert "extrapolated estimators" in text
    assert "n1_ext" in text and "condensate fraction" in text
    assert "S(k)" in text and "g2(r)" in text
    # The curve is exactly 2*mixed - variational.
    n1_d = np.asarray(dres.data.blocks.one_body_dm.mean)
    n1_v = np.asarray(vres.data.blocks.one_body_dm.mean)
    want = 2 * n1_d[-1] - n1_v[-1]
    assert f"{want:.6G}"[:6] in text


def test_pure_estimators_are_skipped_with_note():
    dres, vres = run_pair(make_spec(), pure=True)
    text = report.describe_extrapolated(dres, vres)
    assert text.count("forward walking") == 3  # OBDM, S(k), g2 skipped


def test_model_mismatch_raises(default_pair):
    dres, _ = default_pair
    _, vres = run_pair(make_spec(interaction_strength=3.0))
    with pytest.raises(ValueError, match="matching model specs"):
        report.describe_extrapolated(dres, vres)


def test_cli_extrapolate_option(tmp_path, default_pair):
    dres, vres = default_pair
    dpath, vpath = str(tmp_path / "d.h5"), str(tmp_path / "v.h5")
    DmcHDF5FileHandler(dpath, group="run").dump(dres)
    VmcHDF5FileHandler(vpath, group="var").dump(vres)
    runner = CliRunner()
    with expect_opt_block_warning():
        out = runner.invoke(mrbp_cli.dmc_cli,
                            ["analyze", dpath,
                             "--extrapolate-with", vpath])
    assert out.exit_code == 0, out.output
    assert "extrapolated estimators" in out.output
    assert "n1_ext" in out.output


def test_cli_json_with_extrapolation_is_valid_json(tmp_path,
                                                   default_pair):
    """--json + --extrapolate-with must emit ONE parseable JSON payload
    with the extrapolated values folded in (regression: the text block
    used to be appended after the JSON array)."""
    import json

    dres, vres = default_pair
    dpath, vpath = str(tmp_path / "d.h5"), str(tmp_path / "v.h5")
    DmcHDF5FileHandler(dpath, group="run").dump(dres)
    VmcHDF5FileHandler(vpath, group="var").dump(vres)
    runner = CliRunner()
    with expect_opt_block_warning():
        out = runner.invoke(mrbp_cli.dmc_cli,
                            ["analyze", dpath, "--json",
                             "--extrapolate-with", vpath])
    assert out.exit_code == 0, out.output
    payload = json.loads(out.output)  # must not raise "Extra data"
    entry = payload[0]
    extra = entry["extrapolated"]
    assert "obdm_ext" in extra and "condensate_fraction_ext" in extra
    n1_d = np.asarray(dres.data.blocks.one_body_dm.mean)
    n1_v = np.asarray(vres.data.blocks.one_body_dm.mean)
    np.testing.assert_allclose(extra["obdm_ext"], 2 * n1_d - n1_v,
                               rtol=1e-12)
