"""``analyze --dt-fit``: time-step extrapolation E(dt) -> E(0) across
the DMC results stored in one HDF5 file (the production face of
``benchmarks/dt_sweep.py``; the reference leaves dt studies to notebook
code outside the package)."""
import dataclasses

import numpy as np
import pytest
from click.testing import CliRunner

from phd_qmclib_tpu import mrbp_cli
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.qmc_exec.io import DmcHDF5FileHandler
from phd_qmclib_tpu.qmc_exec.report import (dt_fit_hdf5,
                                            summarize_dt_fit,
                                            summarize_nw_fit,
                                            sweep_fit_hdf5)
from tests.warn_utils import expect_opt_block_warning

# v0 = 0 (pure Lieb-Liniger) so the exact Bethe-ansatz reference is
# attached to the fit summary.
MODEL_CONFIG = dict(lattice_depth=0.0, lattice_ratio=1.0,
                    interaction_strength=1.0, boson_number=5,
                    supercell_size=5.0, tbf_contact_cutoff=0.3)
TIME_STEPS = (4e-3, 1e-3, 2e-3)        # deliberately unsorted


def _run_dmc(time_step: float, seed: int = 7, **kw):
    base = dict(model_spec=mrbp.Spec(**MODEL_CONFIG),
                time_step=time_step, max_num_walkers=48,
                target_num_walkers=32, num_blocks=3,
                num_time_steps_block=12, burn_in_blocks=1,
                rng_seed=seed, dtype="float64")
    base.update(kw)
    proc = dmc_exec.Proc(**base)
    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    return proc.exec(proc_input)


@pytest.fixture(scope="module")
def sweep_file(tmp_path_factory):
    """Three otherwise-identical DMC rows at different dt, stored as
    groups ``dt0..dt2`` of one file (the fused-sweep output layout)."""
    path = tmp_path_factory.mktemp("dtfit") / "sweep.h5"
    results = []
    for i, dt in enumerate(TIME_STEPS):
        result = _run_dmc(dt, seed=7 + i)
        DmcHDF5FileHandler(location=str(path),
                           group=f"dt{i}").dump(result)
        results.append(result)
    return str(path), results


def test_summary_matches_independent_fit(sweep_file):
    path, results = sweep_file
    with expect_opt_block_warning():
        summary = dt_fit_hdf5(path)
    assert summary["num_points"] == 3
    # Rows come out sorted by dt regardless of storage order.
    assert summary["time_steps"] == sorted(TIME_STEPS)
    nop = MODEL_CONFIG["boson_number"]
    with expect_opt_block_warning():   # reblocking on short series
        by_dt = {float(r.proc.time_step):
                 (float(r.data.blocks.energy.mean) / nop,
                  float(r.data.blocks.energy.mean_error) / nop)
                 for r in results}
    x = np.array(sorted(TIME_STEPS))
    y = np.array([by_dt[dt][0] for dt in x])
    y_err = np.array([by_dt[dt][1] for dt in x])
    np.testing.assert_allclose(summary["energy_per_particle"], y,
                               rtol=1e-12)
    # Independent recompute of the weighted fit and its covariance.
    coeffs, cov = np.polyfit(x, y, 1, w=1.0 / y_err, cov="unscaled")
    assert summary["e0"] == pytest.approx(coeffs[-1], rel=1e-10)
    assert summary["slope"] == pytest.approx(coeffs[-2], rel=1e-10)
    assert summary["e0_err"] == pytest.approx(
        float(np.sqrt(cov[-1, -1])), rel=1e-10)
    resid = (y - np.polyval(coeffs, x)) / y_err
    assert summary["chi2_dof"] == pytest.approx(
        float((resid ** 2).sum()), rel=1e-10)          # dof = 1
    # v0 = 0: the exact Lieb-Liniger reference rides along.
    assert "exact_ll" in summary
    assert np.isfinite(summary["exact_ll"]["sigma_dev"])


def test_mismatched_model_specs_rejected(sweep_file):
    _, results = sweep_file
    entries = [(f"dt{i}", r) for i, r in enumerate(results)]
    bad_spec = results[1].proc.model_spec.evolve(
        interaction_strength=2.0)
    bad_proc = dataclasses.replace(results[1].proc,
                                   model_spec=bad_spec)
    entries[1] = ("dt1", dataclasses.replace(results[1],
                                             proc=bad_proc))
    with expect_opt_block_warning(), \
            pytest.raises(ValueError, match="share one model spec"):
        summarize_dt_fit(entries)


def test_walker_target_mismatch_is_a_caveat(sweep_file):
    """Differing population-control settings do not block the fit but
    must be called out (the O(1/N_w) bias is not constant)."""
    _, results = sweep_file
    entries = [(f"dt{i}", r) for i, r in enumerate(results)]
    other = dataclasses.replace(results[2].proc,
                                target_num_walkers=64)
    entries[2] = ("dt2", dataclasses.replace(results[2], proc=other))
    with expect_opt_block_warning():
        summary = summarize_dt_fit(entries)
    assert any("target_num_walkers" in c for c in summary["caveats"])


def test_too_few_rows_rejected(sweep_file):
    _, results = sweep_file
    with pytest.raises(ValueError, match="at least two"):
        summarize_dt_fit([("dt0", results[0])])
    # Two rows at the SAME dt cannot fix a line either.
    twin = [("a", results[0]), ("b", results[0])]
    with expect_opt_block_warning(), \
            pytest.raises(ValueError, match="distinct time-step"):
        summarize_dt_fit(twin)


@pytest.fixture(scope="module")
def nw_file(sweep_file, tmp_path_factory):
    """The same three rows re-labelled as a WALKER-TARGET sweep at one
    dt (replaced proc metadata; the energies only parametrize the fit
    math here)."""
    _, results = sweep_file
    path = tmp_path_factory.mktemp("nwfit") / "nw.h5"
    for i, (result, nw) in enumerate(zip(results, (32, 48, 64))):
        proc = dataclasses.replace(result.proc, time_step=1e-3,
                                   target_num_walkers=nw)
        DmcHDF5FileHandler(location=str(path), group=f"nw{i}").dump(
            dataclasses.replace(result, proc=proc))
    return str(path)


def test_nw_fit_math_and_caveat(sweep_file):
    """E(N_w) -> E(inf) against an independent polyfit in 1/N_w; rows
    at differing dt must carry the Trotter-contamination caveat."""
    _, results = sweep_file
    targets = (32, 48, 64)
    entries = [(f"nw{i}",
                dataclasses.replace(r, proc=dataclasses.replace(
                    r.proc, target_num_walkers=nw)))
               for i, (r, nw) in enumerate(zip(results, targets))]
    with expect_opt_block_warning():
        summary = summarize_nw_fit(entries)
    nop = MODEL_CONFIG["boson_number"]
    with expect_opt_block_warning():
        pts = sorted(
            (1.0 / nw,
             float(r.data.blocks.energy.mean) / nop,
             float(r.data.blocks.energy.mean_error) / nop)
            for (_, r), nw in zip(entries, targets))
    x, y, y_err = (np.array(c) for c in zip(*pts))
    np.testing.assert_allclose(summary["inv_walkers"], x, rtol=1e-12)
    coeffs, cov = np.polyfit(x, y, 1, w=1.0 / y_err, cov="unscaled")
    assert summary["e0"] == pytest.approx(coeffs[-1], rel=1e-10)
    assert summary["e0_err"] == pytest.approx(
        float(np.sqrt(cov[-1, -1])), rel=1e-10)
    # The source rows differ in dt -> the caveat must fire.
    assert any("time_step" in c for c in summary["caveats"])


def test_nw_fit_needs_distinct_targets(sweep_file):
    _, results = sweep_file          # all rows share target 32
    entries = [(f"dt{i}", r) for i, r in enumerate(results)]
    with expect_opt_block_warning(), \
            pytest.raises(ValueError,
                          match="distinct walker-number"):
        summarize_nw_fit(entries)


def test_cli_nw_fit(nw_file):
    import json

    with expect_opt_block_warning():
        out = CliRunner().invoke(
            mrbp_cli.dmc_cli,
            ["analyze", nw_file, "--nw-fit", "--json"])
    assert out.exit_code == 0, out.output
    payload = json.loads(out.output)
    fit = payload[-1]
    assert fit["sampling_type"] == "nw_fit"
    assert fit["inv_walkers"] == [1 / 64, 1 / 48, 1 / 32]
    assert np.isfinite(fit["e0"])
    assert "caveats" not in fit      # one shared dt after relabeling
    with expect_opt_block_warning():
        human = CliRunner().invoke(
            mrbp_cli.dmc_cli, ["analyze", nw_file, "--nw-fit"])
    assert "population-control extrapolation" in human.output
    assert "N_w = 64" in human.output


def test_sweep_fit_hdf5_kind_dispatch(nw_file):
    with expect_opt_block_warning():
        summary = sweep_fit_hdf5(nw_file, "nw")
    assert "inv_walkers" in summary
    with expect_opt_block_warning(), \
            pytest.raises(ValueError, match="distinct time-step"):
        sweep_fit_hdf5(nw_file, "dt")   # one shared dt -> no dt fit


def test_cli_human_report(sweep_file):
    path, _ = sweep_file
    with expect_opt_block_warning():
        out = CliRunner().invoke(mrbp_cli.dmc_cli,
                                 ["analyze", path, "--dt-fit"])
    assert out.exit_code == 0, out.output
    assert "time-step extrapolation" in out.output
    assert "exact Lieb-Liniger" in out.output
    # The per-row reports still print.
    assert out.output.count("== DMC result ==") == 3


def test_cli_json_payload(sweep_file):
    import json

    path, _ = sweep_file
    with expect_opt_block_warning():
        out = CliRunner().invoke(
            mrbp_cli.dmc_cli,
            ["analyze", path, "--dt-fit", "--json", "-g", "dt"])
    assert out.exit_code == 0, out.output
    payload = json.loads(out.output)
    assert len(payload) == 4           # 3 rows + the fit entry
    fit = payload[-1]
    assert fit["sampling_type"] == "dt_fit"
    assert np.isfinite(fit["e0"]) and np.isfinite(fit["e0_err"])
    assert fit["groups"] == ["dt1", "dt2", "dt0"]   # sorted by dt


def test_cli_prefix_without_matches_fails_cleanly(sweep_file):
    path, _ = sweep_file
    out = CliRunner().invoke(
        mrbp_cli.dmc_cli, ["analyze", path, "--dt-fit", "-g", "zz"])
    assert out.exit_code != 0
    assert "at least two stored DMC results" in out.output


def test_vmc_cli_rejects_dt_fit(sweep_file):
    path, _ = sweep_file
    out = CliRunner().invoke(mrbp_cli.vmc_cli,
                             ["analyze", path, "--dt-fit"])
    assert out.exit_code != 0
    assert "--dt-fit applies to DMC results" in out.output


def test_fit_order_zero_fails_cleanly(sweep_file):
    """--dt-fit-order 0 has no slope/extrapolation content; it must
    fail with the one-line ClickException every other bad input gets,
    not a raw IndexError traceback (advisor finding, round 4)."""
    path, _ = sweep_file
    out = CliRunner().invoke(
        mrbp_cli.dmc_cli,
        ["analyze", path, "--dt-fit", "--dt-fit-order", "0"])
    assert out.exit_code != 0
    assert "order >= 1" in out.output
    assert "Traceback" not in out.output


@pytest.mark.slow  # tier budget: runs an extra VMC procedure
def test_cli_fit_prefix_with_extrapolate(sweep_file, tmp_path):
    """With a fit flag active, -g is a group PREFIX — combining it
    with --extrapolate-with must resolve the first stored group
    matching the prefix instead of treating the prefix as a literal
    group name (advisor finding, round 4: this combination used to
    raise an unwrapped ValueError traceback)."""
    from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec
    from phd_qmclib_tpu.qmc_exec.io import VmcHDF5FileHandler

    path, _ = sweep_file
    vproc = vmc_exec.Proc(
        model_spec=mrbp.Spec(**MODEL_CONFIG), move_spread=0.4,
        num_walkers=32, num_blocks=2, num_steps_block=8,
        burn_in_blocks=1, rng_seed=9, dtype="float64")
    vres = vproc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), vproc))
    vpath = str(tmp_path / "v.h5")
    VmcHDF5FileHandler(vpath, group="var").dump(vres)
    with expect_opt_block_warning():
        out = CliRunner().invoke(
            mrbp_cli.dmc_cli,
            ["analyze", path, "--dt-fit", "-g", "dt",
             "--extrapolate-with", vpath])
    assert out.exit_code == 0, out.output
    assert "extrapolated estimators" in out.output
    assert "chi2/dof" in out.output  # the fit summary printed too
