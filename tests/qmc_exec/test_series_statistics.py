"""Per-step series statistics: ``keep_iter_data`` on/off must produce
IDENTICAL block statistics, and the full series must round-trip through
HDF5.

The reference's ``keep_iter_data=True`` path reblocks the full 3-D
per-step series of *pure* estimators with per-step weights faked by
``pure_est_reduce_factor`` (``qmc_exec/data/dmc.py:360-370``,
``dmc/proc.py:319-320``).  That is statistically wrong twice over: the
per-step values inside a forward-walking window are nested partial sums
of one history (not samples), and the early-window entries are still
under-projected.  Here only the end-of-block value enters the block
statistics, weighted by the final step's walker count, so both modes
agree exactly (see ``_pure_aware_totals``).
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_proc, vmc as vmc_proc
from phd_qmclib_tpu.qmc_exec.io import (DmcHDF5FileHandler,
                                        VmcHDF5FileHandler)


@pytest.fixture(scope="module")
def model_spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=8,
                     supercell_size=8.0, tbf_contact_cutoff=0.3)


def _dmc_result(model_spec, keep_iter_data, as_pure_est):
    proc = dmc_proc.Proc(
        model_spec=model_spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, rng_seed=31, num_blocks=3,
        num_time_steps_block=12, burn_in_blocks=1, dtype="float64",
        keep_iter_data=keep_iter_data,
        density_spec=dmc_proc.DensityEstSpec(num_bins=16,
                                             as_pure_est=as_pure_est),
        ssf_spec=dmc_proc.SSFEstSpec(num_modes=6,
                                     as_pure_est=as_pure_est))
    proc_input = dmc_proc.ProcInput.from_model_sys_conf_spec(
        dmc_proc.ModelSysConfSpec(type="MODEL_SYS_CONF"), proc)
    return proc.exec(proc_input)


@pytest.mark.parametrize("as_pure_est", [True, False],
                         ids=["pure", "mixed"])
def test_keep_iter_data_modes_agree(model_spec, as_pure_est):
    """Same seed, same trajectory - the block statistics must be
    bit-identical whether or not the per-step series is kept."""
    kept = _dmc_result(model_spec, True, as_pure_est)
    reduced = _dmc_result(model_spec, False, as_pure_est)

    kb, rb = kept.data.blocks, reduced.data.blocks
    np.testing.assert_allclose(kb.energy.totals, rb.energy.totals,
                               rtol=1e-12)
    np.testing.assert_allclose(kb.energy.weight_totals,
                               rb.energy.weight_totals, rtol=1e-12)
    np.testing.assert_allclose(kb.weight.totals, rb.weight.totals,
                               rtol=1e-12)
    np.testing.assert_allclose(kb.density.totals, rb.density.totals,
                               rtol=1e-12)
    # This is the fix: the pure density/S(k) weight is the final step's
    # walker count in BOTH modes (the reference's kept mode uses the
    # final step's continuous weight sum instead, so its modes
    # disagree).
    np.testing.assert_allclose(kb.density.weight_totals,
                               rb.density.weight_totals, rtol=1e-12)
    np.testing.assert_allclose(kb.ss_factor.fdk_sqr_abs_part.totals,
                               rb.ss_factor.fdk_sqr_abs_part.totals,
                               rtol=1e-12)
    np.testing.assert_allclose(
        kb.ss_factor.fdk_sqr_abs_part.weight_totals,
        rb.ss_factor.fdk_sqr_abs_part.weight_totals, rtol=1e-12)
    np.testing.assert_allclose(kb.density.mean, rb.density.mean,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(kb.ss_factor.mean),
                               np.asarray(rb.ss_factor.mean), rtol=1e-12)

    # The kept run also carries the full series.
    assert kept.data.series is not None
    assert reduced.data.series is None
    series = kept.data.series
    assert np.asarray(series.iter_props.energy).shape == (3, 12)
    assert series.density.shape == (3, 12, 16)
    assert series.ssf.shape == (3, 12, 6, 3)


def test_dmc_series_hdf5_roundtrip(model_spec, tmp_path):
    result = _dmc_result(model_spec, True, True)
    path = str(tmp_path / "series.h5")
    handler = DmcHDF5FileHandler(path, group="run")
    handler.dump(result)
    loaded = handler.load()
    series = loaded.data.series
    assert series is not None
    for name in ("energy", "weight", "num_walkers", "ref_energy",
                 "accum_energy"):
        np.testing.assert_array_equal(
            np.asarray(getattr(series.iter_props, name)),
            np.asarray(getattr(result.data.series.iter_props, name)))
    np.testing.assert_array_equal(series.density,
                                  result.data.series.density)
    np.testing.assert_array_equal(series.ssf, result.data.series.ssf)
    # Block statistics survive the round trip too.
    np.testing.assert_allclose(loaded.data.blocks.density.mean,
                               result.data.blocks.density.mean)
    # Flattened series views.
    assert series.energy.shape == (36,)
    assert np.all(np.isfinite(series.energy))


def test_vmc_series_hdf5_roundtrip(model_spec, tmp_path):
    proc = vmc_proc.Proc(
        model_spec=model_spec, move_spread=0.25, rng_seed=13,
        num_blocks=3, num_steps_block=32, burn_in_blocks=1,
        keep_iter_data=True, num_walkers=8, dtype="float64",
        ssf_spec=vmc_proc.SSFEstSpec(num_modes=6))
    proc_input = vmc_proc.ProcInput.from_model_sys_conf_spec(
        vmc_proc.ModelSysConfSpec(type="MODEL_SYS_CONF"), proc)
    result = proc.exec(proc_input)
    assert result.data.series is not None

    path = str(tmp_path / "vmc-series.h5")
    handler = VmcHDF5FileHandler(path, group="run")
    handler.dump(result)
    loaded = handler.load()
    series = loaded.data.series
    assert series is not None
    np.testing.assert_array_equal(
        np.asarray(series.iter_props.energy),
        np.asarray(result.data.series.iter_props.energy))
    if result.data.series.ssf is not None:
        np.testing.assert_array_equal(series.ssf,
                                      result.data.series.ssf)


def test_ratio_error_clamps_negative_bracket():
    """Near-perfectly correlated totals/weights (an estimator bin whose
    counts track the walker count exactly) push the delta-method
    variance bracket negative by floating-point noise; the error must
    clamp to ~0 instead of going NaN (regression: the 256-block
    production run's g2 errors were NaN in 13 bins before the clamp,
    which then crashed the contact fit's SVD)."""
    from phd_qmclib_tpu.qmc_exec.data.dmc import PropBlocks

    rng = np.random.default_rng(7)
    weights = rng.uniform(100.0, 130.0, size=64)
    blocks = PropBlocks(totals=2.0 * weights, weight_totals=weights)
    assert blocks.mean == pytest.approx(2.0, rel=1e-12)
    err = blocks.mean_error
    # Finite (the pre-clamp behavior was sqrt(negative) = NaN) and far
    # below the naive uncorrelated error (the correlation is real; the
    # residual comes from the numerator/denominator reblockings
    # estimating slightly different effective sizes).
    assert np.isfinite(err) and err >= 0.0
    naive = float(np.std(2.0 * weights) / np.sqrt(64) / weights.mean())
    assert err < naive


def test_cm_diffusion_jackknife_error_sees_window_scatter():
    """The m/m* error must reflect between-window scatter (a
    delete-one jackknife), not just the fit residuals of the
    window-mean curve — regression for the 64-vs-256-block production
    runs whose fit-only errors made compatible values look 50 sigma
    apart."""
    from phd_qmclib_tpu.qmc_exec.data.dmc import CMDiffusionBlocks

    rng = np.random.default_rng(3)
    tau_step, n_tau, n_win, nop = 0.05, 40, 16, 8
    tau = (np.arange(n_tau) + 1.0) * tau_step
    true_slope = 0.2  # m/m* = nop/2 * 0.2 = 0.8
    # Per-window slope scatter ~10%, tiny in-curve noise.
    slopes = true_slope * (1.0 + 0.1 * rng.standard_normal(n_win))
    w2 = slopes[:, None] * tau[None, :] \
        + 1e-4 * rng.standard_normal((n_win, n_tau))
    blocks = CMDiffusionBlocks(w2, tau_step, nop)
    ratio, err = blocks.effective_mass_ratio()
    assert ratio == pytest.approx(0.5 * nop * slopes.mean(), rel=1e-3)
    # Jackknife error ~ std/sqrt(n) of the window slopes.
    expect = 0.5 * nop * slopes.std(ddof=1) / np.sqrt(n_win)
    assert err == pytest.approx(expect, rel=0.05)
    # A single window falls back to the fit covariance (finite).
    one = CMDiffusionBlocks(w2[:1], tau_step, nop)
    r1, e1 = one.effective_mass_ratio()
    assert np.isfinite(e1)
