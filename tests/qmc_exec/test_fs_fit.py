"""``analyze --fs-fit``: finite-size extrapolation E/N(N) -> E/N(inf)
in x = 1/N^2 (the PBC Luttinger-liquid Casimir correction) across DMC
results at matched density and coupling — the third standard DMC
convergence axis next to --dt-fit and --nw-fit.  The reference leaves
size studies to notebook code outside the package."""
import numpy as np
import pytest
from click.testing import CliRunner

from phd_qmclib_tpu import mrbp_cli
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.qmc_exec.io import DmcHDF5FileHandler
from phd_qmclib_tpu.qmc_exec.report import (summarize_fs_fit,
                                            sweep_fit_hdf5)
from tests.warn_utils import expect_opt_block_warning

# v0 = 0 at unit density: the exact Bethe-ansatz reference attached to
# the summary IS the thermodynamic-limit energy the fit targets.
BASE_CONFIG = dict(lattice_depth=0.0, lattice_ratio=1.0,
                   interaction_strength=1.0, tbf_contact_cutoff=0.3)
SIZES = (8, 4, 6)            # deliberately unsorted


def _run_dmc(nop: int, seed: int = 7, **kw):
    base = dict(model_spec=mrbp.Spec(boson_number=nop,
                                     supercell_size=float(nop),
                                     **BASE_CONFIG),
                time_step=1e-3, max_num_walkers=48,
                target_num_walkers=32, num_blocks=3,
                num_time_steps_block=12, burn_in_blocks=1,
                rng_seed=seed, dtype="float64")
    base.update(kw)
    proc = dmc_exec.Proc(**base)
    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    return proc.exec(proc_input)


@pytest.fixture(scope="module")
def size_file(tmp_path_factory):
    """Three DMC rows at N = L = 8, 4, 6 (unit density), stored as
    groups ``n0..n2`` of one file."""
    path = tmp_path_factory.mktemp("fsfit") / "sizes.h5"
    results = []
    for i, nop in enumerate(SIZES):
        result = _run_dmc(nop, seed=7 + i)
        DmcHDF5FileHandler(location=str(path),
                           group=f"n{i}").dump(result)
        results.append(result)
    return str(path), results


def test_summary_matches_independent_fit(size_file):
    path, results = size_file
    with expect_opt_block_warning():
        summary = sweep_fit_hdf5(path, "fs")
    assert summary["num_points"] == 3
    # Rows come back sorted by x = 1/N^2 (i.e. descending N).
    np.testing.assert_allclose(summary["inv_nop_sq"],
                               sorted(1.0 / np.array(SIZES) ** 2))
    # Independent weighted linear fit in 1/N^2.
    x = np.array([1.0 / n ** 2 for n in SIZES])
    y = np.array([float(r.data.blocks.energy.mean)
                  / r.proc.model_spec.boson_number for r in results])
    w = np.array([1.0 / max(float(r.data.blocks.energy.mean_error)
                            / r.proc.model_spec.boson_number, 1e-300)
                  for r in results])
    coeffs = np.polyfit(x, y, 1, w=w)
    assert summary["e0"] == pytest.approx(coeffs[1], rel=1e-9)
    assert summary["slope"] == pytest.approx(coeffs[0], rel=1e-9)
    # v0 = 0: the exact TDL reference rides along.
    assert "exact_ll" in summary
    assert np.isfinite(summary["exact_ll"]["sigma_dev"])


@pytest.mark.slow  # tier budget: runs two extra DMC rows; the
# spec-key logic is unit-shaped by test_coupling-free paths
def test_density_mismatch_rejected(size_file, tmp_path):
    path, _ = size_file
    # Same N range but a different density in one row.
    other = _run_dmc(6, model_spec=mrbp.Spec(
        boson_number=6, supercell_size=8.0, **BASE_CONFIG))
    bad = str(tmp_path / "bad.h5")
    DmcHDF5FileHandler(location=bad, group="a").dump(other)
    DmcHDF5FileHandler(location=bad, group="b").dump(_run_dmc(4))
    with pytest.raises(ValueError, match="one model spec"), \
            expect_opt_block_warning():
        sweep_fit_hdf5(bad, "fs")


def test_dt_mismatch_is_a_caveat(size_file, tmp_path):
    other_path = str(tmp_path / "mixed_dt.h5")
    DmcHDF5FileHandler(location=other_path, group="a").dump(
        _run_dmc(4, time_step=1e-3))
    DmcHDF5FileHandler(location=other_path, group="b").dump(
        _run_dmc(6, time_step=2e-3))
    with expect_opt_block_warning():
        summary = sweep_fit_hdf5(other_path, "fs")
    assert any("time_step" in c for c in summary.get("caveats", ()))


@pytest.mark.slow  # tier budget: two extra DMC rows
def test_coupling_mismatch_rejected(tmp_path):
    bad = str(tmp_path / "badg.h5")
    DmcHDF5FileHandler(location=bad, group="a").dump(_run_dmc(4))
    DmcHDF5FileHandler(location=bad, group="b").dump(
        _run_dmc(6, model_spec=mrbp.Spec(
            boson_number=6, supercell_size=6.0,
            **{**BASE_CONFIG, "interaction_strength": 2.0})))
    with pytest.raises(ValueError, match="one model spec"), \
            expect_opt_block_warning():
        sweep_fit_hdf5(bad, "fs")


def test_cli_human_and_json(size_file):
    path, _ = size_file
    with expect_opt_block_warning():
        out = CliRunner().invoke(mrbp_cli.dmc_cli,
                                 ["analyze", path, "--fs-fit"])
    assert out.exit_code == 0, out.output
    assert "finite-size extrapolation" in out.output
    assert "E/N(N->inf)" in out.output
    with expect_opt_block_warning():
        js = CliRunner().invoke(
            mrbp_cli.dmc_cli,
            ["analyze", path, "--fs-fit", "--json"])
    assert js.exit_code == 0, js.output
    import json
    payload = json.loads(js.output)
    entry = next(e for e in payload
                 if e["sampling_type"] == "fs_fit")
    assert entry["num_points"] == 3
    assert "inv_nop_sq" in entry


def test_vmc_cli_rejects_fs_fit(size_file):
    path, _ = size_file
    out = CliRunner().invoke(mrbp_cli.vmc_cli,
                             ["analyze", path, "--fs-fit"])
    assert out.exit_code != 0
    assert "--fs-fit applies to DMC results" in out.output


def test_direct_summary_order_guard(size_file):
    _, results = size_file
    entries = [(f"n{i}", r) for i, r in enumerate(results)]
    with pytest.raises(ValueError, match="order >= 1"):
        summarize_fs_fit(entries, order=0)
