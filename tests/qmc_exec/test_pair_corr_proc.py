"""Execution-layer tests of the direct pair-correlation estimator:
config plumbing, HDF5 round trip, restart merge, the analyze report
line, and a physics cross-check of the direct histogram against the
Fourier (from-S(k)) route on the same run.
"""
import numpy as np

from tests.warn_utils import expect_opt_block_warning
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.qmc_exec import report
from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec
from phd_qmclib_tpu.qmc_exec.io import (DmcHDF5FileHandler,
                                        VmcHDF5FileHandler)


def make_spec(**kw):
    base = dict(lattice_depth=0.0, lattice_ratio=1.0,
                interaction_strength=4.0, boson_number=8,
                supercell_size=8.0, tbf_contact_cutoff=0.49 * 8)
    base.update(kw)
    return mrbp.Spec(**base)


def dmc_proc(spec, **kw):
    base = dict(model_spec=spec, time_step=2e-3, max_num_walkers=96,
                target_num_walkers=80, num_blocks=3,
                num_time_steps_block=16, burn_in_blocks=1, rng_seed=5,
                dtype="float64",
                pair_corr_spec=dmc_exec.PairCorrEstSpec(
                    num_bins=10, as_pure_est=True, est_every_mult=2))
    base.update(kw)
    return dmc_exec.Proc(**base)


def run_dmc(proc):
    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    return proc.exec(proc_input)


def test_config_round_trip():
    proc = dmc_proc(make_spec())
    config = proc.as_config()
    assert config["pair_corr_spec"] == {
        "num_bins": 10, "as_pure_est": True, "est_every_mult": 2}
    proc2 = dmc_exec.Proc.from_config(config)
    assert proc2.pair_corr_spec.num_bins == 10
    assert proc2.pair_corr_spec.est_every_mult == 2
    evolved = proc.evolve({"pair_corr_spec": {"num_bins": 10,
                                              "est_every_mult": 1}})
    assert evolved.pair_corr_spec.est_every_mult == 1
    assert evolved.pair_corr_spec.as_pure_est is True


def test_validation():
    with pytest.raises(ValueError, match="est_every_mult"):
        dmc_proc(make_spec(), pair_corr_spec=dmc_exec.PairCorrEstSpec(
            num_bins=4, est_every_mult=3))  # 16 % 3 != 0


def test_dmc_hdf5_and_report(tmp_path):
    proc = dmc_proc(make_spec())
    result = run_dmc(proc)
    g2b = result.data.blocks.pair_corr
    assert g2b is not None
    path = str(tmp_path / "g2.h5")
    handler = DmcHDF5FileHandler(path, group="run")
    handler.dump(result)
    loaded = handler.load()
    np.testing.assert_array_equal(loaded.data.blocks.pair_corr.totals,
                                  g2b.totals)
    assert loaded.proc.pair_corr_spec == proc.pair_corr_spec
    with expect_opt_block_warning():
        text = report.describe_dmc(loaded, full=True)
    assert "g2(r)" in text and "contact" in text
    # Restart merge concatenates the block axis.
    merged = loaded.data.blocks.merge(result.data.blocks)
    assert merged.pair_corr.totals.shape[0] == 2 * proc.num_blocks


def test_series_round_trip(tmp_path):
    proc = dmc_proc(make_spec(), keep_iter_data=True)
    result = run_dmc(proc)
    assert result.data.series.g2 is not None
    assert result.data.series.g2.shape == (3, 16 // 2, 10)
    path = str(tmp_path / "g2s.h5")
    handler = DmcHDF5FileHandler(path, group="run")
    handler.dump(result)
    loaded = handler.load()
    np.testing.assert_array_equal(loaded.data.series.g2,
                                  result.data.series.g2)


def test_direct_vs_fourier_g2_cross_check():
    """The direct histogram and the Fourier inversion of the measured
    S(k) must agree on the same run (the Fourier route carries a mode
    cutoff, so compare loosely away from the contact region)."""
    spec = make_spec()
    nop, sc = spec.boson_number, spec.supercell_size
    proc = dmc_proc(
        spec, num_blocks=6, num_time_steps_block=32, burn_in_blocks=2,
        pair_corr_spec=dmc_exec.PairCorrEstSpec(num_bins=10,
                                                as_pure_est=False),
        ssf_spec=dmc_exec.SSFEstSpec(num_modes=24, as_pure_est=False))
    result = run_dmc(proc)
    with expect_opt_block_warning():
        r, g2_direct, g2_err = \
            result.data.blocks.pair_corr.pair_correlation(nop, sc)
        g2_fourier, g2f_err = \
            result.data.blocks.ss_factor.pair_correlation(r, nop, sc)
    # Away from r=0 the truncated Fourier series converges; tolerate
    # a few sigma plus the truncation scale.
    mask = r > sc / 8
    diff = np.abs(g2_direct[mask] - g2_fourier[mask])
    tol = 5 * (g2_err[mask] + g2f_err[mask]) + 0.12
    assert np.all(diff < tol), (diff, tol)
    # Repulsion suppresses the contact value (1 for the free gas).
    assert g2_direct[0] < 0.75


def test_vmc_exec_g2(tmp_path):
    spec = make_spec()
    proc = vmc_exec.Proc(
        model_spec=spec, move_spread=0.6, num_walkers=64, num_blocks=3,
        num_steps_block=16, burn_in_blocks=1, rng_seed=6,
        dtype="float64",
        pair_corr_spec=vmc_exec.PairCorrEstSpec(num_bins=10,
                                                est_every_mult=2))
    proc_input = vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    result = proc.exec(proc_input)
    g2b = result.data.blocks.pair_corr
    with expect_opt_block_warning():
        r, g2, g2_err = g2b.pair_correlation(spec.boson_number,
                                             spec.supercell_size)
    assert np.all(np.isfinite(g2))
    path = str(tmp_path / "g2v.h5")
    handler = VmcHDF5FileHandler(path, group="run")
    handler.dump(result)
    loaded = handler.load()
    np.testing.assert_array_equal(loaded.data.blocks.pair_corr.totals,
                                  g2b.totals)
    assert loaded.proc.pair_corr_spec == proc.pair_corr_spec
    with expect_opt_block_warning():
        text = report.describe_vmc(loaded)
    assert "g2(r)" in text
