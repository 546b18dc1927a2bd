"""Analysis-helper tests: momentum distribution from an OBDM grid."""
import pathlib

import numpy as np
import pytest

from phd_qmclib_tpu import analysis
from tests.warn_utils import expect_opt_block_warning
from phd_qmclib_tpu.models import mrbp


class TestMomentumDistribution:

    def test_recovers_known_occupations(self):
        # Build n1 from a known symmetric mode-occupation set and check
        # the cosine transform recovers it exactly (the transform is
        # exact for band-limited n1 on the uniform grid).
        L, N, M = 16.0, 8, 33
        offsets = np.linspace(0.0, L / 2, M)
        momenta = np.arange(M) * 2 * np.pi / L
        f = np.zeros(M)
        f[0] = 5.0          # condensate mode
        f[1] = 1.2          # +-k_1 each
        f[2] = 0.3
        # n1(z) = (1/N) [f0 + sum_{j>0} 2 f_j cos(k_j z)] with
        # f0 + 2 f1 + 2 f2 = N.
        assert f[0] + 2 * (f[1] + f[2]) == pytest.approx(N)
        n1 = (f[0] + 2 * (f[1:, None]
                          * np.cos(momenta[1:, None] * offsets)).sum(0)) / N
        k, occ = analysis.momentum_distribution(offsets, n1, L, N)
        np.testing.assert_allclose(k, momenta)
        np.testing.assert_allclose(occ[0], f[0], atol=1e-10)
        np.testing.assert_allclose(occ[1], f[1], atol=1e-10)
        np.testing.assert_allclose(occ[2], f[2], atol=1e-10)
        np.testing.assert_allclose(occ[3:], 0.0, atol=1e-10)

    def test_constant_n1_is_pure_condensate(self):
        L, N, M = 8.0, 4, 17
        offsets = np.linspace(0.0, L / 2, M)
        k, occ = analysis.momentum_distribution(offsets, np.ones(M), L, N)
        assert occ[0] == pytest.approx(N)
        np.testing.assert_allclose(occ[1:], 0.0, atol=1e-12)

    def test_error_propagation_shape(self):
        L, N, M = 8.0, 4, 9
        offsets = np.linspace(0.0, L / 2, M)
        k, occ, err = analysis.momentum_distribution(
            offsets, np.ones(M), L, N, n1_err=np.full(M, 0.01))
        assert err.shape == occ.shape
        assert np.all(err > 0)

    def test_rejects_single_point_grid(self):
        with pytest.raises(ValueError, match="two displacement"):
            analysis.momentum_distribution(np.zeros(1), np.ones(1), 8.0, 4)


class TestExtrapolatedEstimate:

    def test_cancels_first_order_bias(self):
        exact = np.array([1.0, 0.8, 0.5])
        delta = np.array([0.05, -0.02, 0.01])
        mixed = exact + delta          # first-order-biased mixed
        variational = exact + 2 * delta  # doubly-biased variational
        np.testing.assert_allclose(
            analysis.extrapolated_estimate(mixed, variational), exact)

    def test_error_combination(self):
        est, err = analysis.extrapolated_estimate(
            np.ones(3), np.ones(3), mixed_err=np.full(3, 0.1),
            variational_err=np.full(3, 0.2))
        np.testing.assert_allclose(est, 1.0)
        np.testing.assert_allclose(err, np.sqrt(4 * 0.01 + 0.04))


class TestPairCorrelationFromSSF:

    def test_uncorrelated_gas_is_flat(self):
        # Uniform ideal gas: <|rho_k|^2> = N for every k > 0 (no pair
        # correlations), N^2 at k = 0 -> g2 == 1 everywhere.
        L, N, M = 16.0, 8, 24
        momenta = np.arange(M) * 2 * np.pi / L
        rho2 = np.full(M, float(N))
        rho2[0] = N * N
        r = np.linspace(0.0, L / 2, 33)
        g2 = analysis.pair_correlation_from_ssf(momenta, rho2, r, N, L)
        np.testing.assert_allclose(g2, 1.0, atol=1e-12)

    def test_free_fermion_exact_inversion(self):
        # Tonks-Girardeau = free fermions: the finite-N S(k) is exactly
        # j/N for j <= N and 1 beyond, and the one-body density matrix
        # is the Dirichlet kernel D(r) = sin(N pi r / L) /
        # (N sin(pi r / L)).  With modes past 2 k_F included the
        # truncated inversion is exact, so compare to the closed form.
        L, N = 16.0, 9  # odd N: unambiguous symmetric Fermi shell
        M = 2 * N + 3  # includes every mode with S(k) != 1 support
        momenta = np.arange(M) * 2 * np.pi / L
        j = np.arange(M)
        ssf = np.minimum(j / N, 1.0)
        rho2 = N * ssf
        rho2[0] = N * N
        r = np.linspace(1e-9, L / 2, 101)
        g2 = analysis.pair_correlation_from_ssf(momenta, rho2, r, N, L)
        dirichlet = np.sin(N * np.pi * r / L) \
            / (N * np.sin(np.pi * r / L))
        # Wick: rho_2(r) = n^2 (1 - D(r)^2)  ->  g2 = N (1 - D^2)/(N-1).
        g2_exact = N * (1.0 - dirichlet ** 2) / (N - 1)
        np.testing.assert_allclose(g2, g2_exact, atol=1e-10)
        # Contact hole: fermions/TG bosons never coincide.
        g2_0 = analysis.pair_correlation_from_ssf(
            momenta, rho2, np.zeros(1), N, L)
        np.testing.assert_allclose(g2_0, 0.0, atol=1e-12)

    def test_error_propagation_and_validation(self):
        L, N, M = 8.0, 4, 6
        momenta = np.arange(M) * 2 * np.pi / L
        rho2 = np.full(M, float(N))
        rho2[0] = N * N
        g2, err = analysis.pair_correlation_from_ssf(
            momenta, rho2, np.linspace(0, 4, 9), N, L,
            rho2_err=np.full(M, 0.1))
        assert err.shape == g2.shape and np.all(err > 0)
        with pytest.raises(ValueError, match="k = 0"):
            analysis.pair_correlation_from_ssf(
                momenta + 1.0, rho2, np.zeros(1), N, L)
        with pytest.raises(ValueError, match="two particles"):
            analysis.pair_correlation_from_ssf(
                momenta, rho2, np.zeros(1), 1, L)

    @pytest.mark.slow
    def test_contact_hole_deepens_with_coupling(self):
        # Full-tier: three coupled VMC runs; the class's exactness
        # tests (free-fermion closed form, sum rule) stay fast.
        """End to end: g2(0) from measured VMC S(k) parts falls as the
        repulsion grows (the contact hole the interaction digs)."""
        from phd_qmclib_tpu.models import mrbp
        from phd_qmclib_tpu.samplers import vmc

        def g2_contact(gn):
            spec = mrbp.Spec(lattice_depth=2.0, lattice_ratio=1.0,
                             interaction_strength=gn, boson_number=8,
                             supercell_size=8.0, tbf_contact_cutoff=0.45)
            s = vmc.Sampling(spec, move_spread=0.3, rng_seed=17,
                             num_walkers=128,
                             ssf_est_spec=vmc.SSFEstSpec(num_modes=17))
            rng = np.random.default_rng(4)
            confs = np.stack([spec.init_get_sys_conf(rng=rng)
                              for _ in range(128)])
            it = s.blocks(512, s.build_state(confs))
            next(it)                      # equilibrate
            block = next(it)
            # Per-walker <|rho_k|^2>: sum over walkers and steps, then
            # divide by the walker-steps count.
            parts = np.asarray(block.iter_ssf, dtype=np.float64)
            rho2 = parts[..., 0].sum(axis=0) / (512 * 128)
            g2 = analysis.pair_correlation_from_ssf(
                s.ssf_momenta, rho2, np.zeros(1), 8, 8.0)
            return float(g2[0])

        weak, strong = g2_contact(0.2), g2_contact(8.0)
        assert strong < weak < 1.3, (weak, strong)
        assert strong < 0.5

    def test_ssf_blocks_convenience_methods(self):
        """Both data-layer SSFBlocks expose g2 with error bars,
        agreeing with the analysis helper on the same inputs."""
        from phd_qmclib_tpu.qmc_exec.data import dmc as ddata
        from phd_qmclib_tpu.qmc_exec.data import vmc as vdata

        L, N, M, B = 8.0, 4, 6, 12
        momenta = np.arange(M) * 2 * np.pi / L
        rng = np.random.default_rng(8)
        # Per-block totals with a known per-walker mean structure
        # (weights vary block to block so the ratio error is defined).
        weights = 10.0 + rng.random(B)
        base = np.full(M, float(N))
        base[0] = N * N
        noise = 0.01 * rng.standard_normal((B, M))
        dmc_totals = (base + noise) * weights[:, None]
        r = np.linspace(0.0, L / 2, 9)

        part = ddata.SSFPartBlocks(dmc_totals, np.broadcast_to(
            weights[:, None], (B, M)).copy())
        blocks = ddata.SSFBlocks(part, part, part)
        with expect_opt_block_warning():
            g2_d, err_d = blocks.pair_correlation(r, N, L)
            ref = analysis.pair_correlation_from_ssf(
                momenta, part.mean, r, N, L,
                rho2_err=part.mean_error)
        np.testing.assert_allclose(g2_d, ref[0])
        np.testing.assert_allclose(err_d, ref[1])
        assert np.all(err_d > 0)

        vpart = vdata.SSFPartBlocks(base + noise)
        vblocks = vdata.SSFBlocks(vpart, vpart, vpart)
        with expect_opt_block_warning():
            g2_v, err_v = vblocks.pair_correlation(r, N, L)
            vref = analysis.pair_correlation_from_ssf(
                momenta, vpart.mean, r, N, L,
                rho2_err=vpart.mean_error)
        np.testing.assert_allclose(g2_v, vref[0])
        np.testing.assert_allclose(g2_v, 1.0, atol=0.1)


class TestDensityFromSSF:
    """Density profile synthesized from the stored S(k) Re/Im parts
    must match the binned histogram estimator from the SAME run."""

    @pytest.fixture(scope="class")
    def result(self):
        from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec

        spec = mrbp.Spec(lattice_depth=12.0, lattice_ratio=1.0,
                         interaction_strength=1.0, boson_number=8,
                         supercell_size=8.0, tbf_contact_cutoff=0.3)
        proc = dmc_exec.Proc(
            model_spec=spec, time_step=1e-3, max_num_walkers=192,
            target_num_walkers=160, num_blocks=4,
            num_time_steps_block=48, burn_in_blocks=2, rng_seed=21,
            dtype="float64",
            density_spec=dmc_exec.DensityEstSpec(num_bins=16,
                                                 as_pure_est=False),
            ssf_spec=dmc_exec.SSFEstSpec(num_modes=25,
                                         as_pure_est=False))
        return proc.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))

    def test_matches_binned_histogram(self, result):
        blocks = result.data.blocks
        nop, sc = 8, 8.0
        bins = 16
        width = sc / bins
        # The histogram measures BIN AVERAGES of a strongly-varying
        # lattice profile; average the synthesized profile over each
        # bin with a fine sub-grid before comparing.
        sub = 32
        z = (np.arange(bins * sub) + 0.5) * (width / sub)
        with expect_opt_block_warning():
            n_fine, _ = blocks.ss_factor.density_profile(z, nop, sc)
        n_fourier = n_fine.reshape(bins, sub).mean(axis=1)
        binned = blocks.density.mean / width  # counts -> density
        assert np.allclose(n_fourier, binned,
                           atol=0.08 * nop / sc), \
            np.abs(n_fourier - binned).max()

    def test_normalization_and_errors(self, result):
        blocks = result.data.blocks
        z = np.linspace(0, 8.0, 4001)
        with expect_opt_block_warning():
            n, n_err = blocks.ss_factor.density_profile(z, 8, 8.0)
        # integral n dz == N (the k=0 mode pins it).
        assert np.trapezoid(n, z) == pytest.approx(8.0, rel=1e-3)
        assert np.all(np.isfinite(n_err))
        # The profile is lattice-periodic: one maximum per well.
        assert n.max() > 1.2 * n.min()


@pytest.mark.slow  # re-tiered r5: exact-orbital oracle duplicate
# (the ssf->density route is fast-gated on synthetic data)
def test_vmc_density_from_ssf_matches_exact_orbital():
    """VMC has no binned density estimator (reference parity); the
    Fourier synthesis from its S(k) parts IS its density profile.  For
    the ideal lattice gas the trial orbital is exact, so the sampled
    density must equal ``N |phi|^2 / integral |phi|^2``."""
    from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec

    nop, sc = 8, 8.0
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=0.0, boson_number=nop,
                     supercell_size=sc, tbf_contact_cutoff=0.3)
    proc = vmc_exec.Proc(model_spec=spec, move_spread=0.4,
                         num_blocks=6, num_steps_block=512,
                         burn_in_blocks=2, rng_seed=5, num_walkers=64,
                         dtype="float64",
                         ssf_spec=vmc_exec.SSFEstSpec(num_modes=25))
    result = proc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))

    z = np.linspace(0.0, 1.0, 201)  # one lattice period
    with expect_opt_block_warning():
        n, n_err = result.data.blocks.ss_factor.density_profile(
            z, nop, sc)

    import jax.numpy as jnp
    from phd_qmclib_tpu.models.mrbp import core_funcs
    funcs = core_funcs(spec)
    # Ideal gas: density is exactly proportional to |phi|^2 of the KP
    # orbital; compare unit-mass normalized shapes over one period.
    phi2 = np.asarray(jnp.exp(
        2.0 * funcs.log_psi(jnp.asarray(z)[:, None], spec.cfc_params)))
    n_norm = n / np.trapezoid(n, z)
    e_norm = phi2 / np.trapezoid(phi2, z)
    assert np.abs(n_norm - e_norm).max() < 0.08 * e_norm.max(), \
        np.abs(n_norm - e_norm).max()


class TestZeroLimitExtrapolation:
    """dt -> 0 / 1/N_w -> 0 extrapolation with measurement errors."""

    def test_recovers_linear_limit_with_calibrated_error(self):
        from phd_qmclib_tpu.analysis import zero_limit_extrapolation

        rng = np.random.default_rng(11)
        x = np.array([1e-3, 2e-3, 4e-3, 8e-3])
        errs = np.full(4, 1e-3)
        true = 8.417
        hits = 0
        for _ in range(300):
            y = true + 3.0 * x + rng.normal(0.0, errs)
            lim, err, coeffs = zero_limit_extrapolation(x, y, errs)
            hits += abs(lim - true) < 1.96 * err
        # 95% nominal coverage; allow wide binomial slack.
        assert 0.90 < hits / 300 <= 1.0
        assert coeffs[-1] == lim

    def test_exact_interpolation_error_propagation(self):
        from phd_qmclib_tpu.analysis import zero_limit_extrapolation

        # Two points: y(0) = 2 y1 - y2 for x2 = 2 x1, so
        # err = sqrt(4 e1^2 + e2^2).
        x = np.array([1e-3, 2e-3])
        y = 5.0 + 7.0 * x
        e = np.array([1e-3, 2e-3])
        lim, err, _ = zero_limit_extrapolation(x, y, e)
        assert lim == pytest.approx(5.0, abs=1e-12)
        assert err == pytest.approx(np.hypot(2e-3, 2e-3), rel=1e-12)

    def test_quadratic_bias_needs_order_two(self):
        from phd_qmclib_tpu.analysis import zero_limit_extrapolation

        x = np.array([1.0, 2.0, 3.0, 4.0]) * 1e-3
        y = 3.0 + 0.5 * x + 4e4 * x ** 2   # strong curvature
        lim2, _, _ = zero_limit_extrapolation(x, y, None, order=2)
        lim1, _, _ = zero_limit_extrapolation(x, y, None, order=1)
        assert lim2 == pytest.approx(3.0, abs=1e-9)
        assert abs(lim1 - 3.0) > 1e-2

    def test_validation(self):
        from phd_qmclib_tpu.analysis import zero_limit_extrapolation

        with pytest.raises(ValueError, match="equal-length"):
            zero_limit_extrapolation([1.0, 2.0], [1.0])
        with pytest.raises(ValueError, match="at least"):
            zero_limit_extrapolation([1.0, 2.0], [1.0, 2.0], order=2)


class TestFeynmanSpectrum:
    """Bijl-Feynman spectrum + sound speed from S(k)."""

    def test_tonks_girardeau_exact_phonon(self):
        from phd_qmclib_tpu.analysis import (feynman_spectrum,
                                             sound_speed_from_ssf)

        # Unit filling: kF = pi; S(k)/N = k / 2kF below 2kF, so the
        # Feynman bound is the exact TG phonon omega = 2 kF k.
        kf = np.pi
        k = np.arange(8) * 2 * np.pi / 16.0
        s = k / (2 * kf)
        kk, om = feynman_spectrum(k, s)
        np.testing.assert_allclose(om, 2 * kf * kk, rtol=1e-12)
        c, _ = sound_speed_from_ssf(k, s)
        assert c == pytest.approx(2 * kf, rel=1e-12)

    def test_bogoliubov_self_consistency(self):
        from phd_qmclib_tpu.analysis import (feynman_spectrum,
                                             sound_speed_from_ssf)

        # S = k^2 / omega_B reproduces omega_B exactly, and the k^2
        # extrapolation recovers c = 2 sqrt(gn) to the O(k^4) tail.
        gn = 2.0
        k = np.arange(8) * 2 * np.pi / 16.0
        om_b = np.sqrt(k ** 4 + 4 * gn * k ** 2)
        s_b = np.where(k > 0, k ** 2 / np.where(om_b > 0, om_b, 1.0),
                       0.0)
        kk, om = feynman_spectrum(k, s_b)
        np.testing.assert_allclose(om, om_b[1:], rtol=1e-12)
        c, _ = sound_speed_from_ssf(k, s_b)
        assert c == pytest.approx(2 * np.sqrt(gn), rel=1e-3)

    def test_error_propagation(self):
        from phd_qmclib_tpu.analysis import feynman_spectrum

        k = np.array([0.0, 0.5, 1.0])
        s = np.array([0.0, 0.25, 0.5])
        err = np.array([0.0, 0.025, 0.05])  # 10% errors
        _, om, om_err = feynman_spectrum(k, s, err)
        np.testing.assert_allclose(om_err, 0.1 * om, rtol=1e-12)

    def test_ssf_blocks_method_on_stored_results(self):
        import h5py

        from phd_qmclib_tpu.qmc_exec.data import dmc as dmc_data

        path = (pathlib.Path(__file__).parent / "fixtures"
                / "test-dmc-ssf-results.h5")
        with h5py.File(path, "r") as fp:
            blocks = dmc_data.SSFBlocks.from_hdf5_data(
                fp["ssf-data-group/dmc/data/blocks/ss_factor"])
        with expect_opt_block_warning():
            kk, om, om_err = blocks.feynman_spectrum(8, 8.0)
        assert kk.shape == om.shape == om_err.shape == (15,)
        assert np.isfinite(om).all() and (om > 0).all()
        with expect_opt_block_warning():
            c, c_err = blocks.sound_speed(8, 8.0)
        assert np.isfinite(c) and c > 0


class TestLeggettBound:
    """Leggett's density-profile upper bound on the superfluid
    fraction (no reference analog)."""

    def test_homogeneous_profile_saturates_at_one(self):
        from phd_qmclib_tpu.analysis import leggett_bound

        bound, err = leggett_bound(np.full(64, 3.7))
        assert bound == pytest.approx(1.0, abs=1e-14)
        assert np.isnan(err)

    def test_cosine_modulation_closed_form(self):
        # <rho> <1/rho> for rho = 1 + A cos x gives f_s <= sqrt(1-A^2).
        from phd_qmclib_tpu.analysis import leggett_bound

        x = np.linspace(0, 2 * np.pi, 8192, endpoint=False)
        for amp in (0.2, 0.5, 0.9):
            bound, _ = leggett_bound(1.0 + amp * np.cos(x))
            assert bound == pytest.approx(np.sqrt(1 - amp ** 2),
                                          rel=1e-5)

    def test_scale_invariance_and_empty_bin(self):
        from phd_qmclib_tpu.analysis import leggett_bound

        x = np.linspace(0, 2 * np.pi, 512, endpoint=False)
        rho = 2.0 + np.cos(x)
        b1, _ = leggett_bound(rho)
        b2, _ = leggett_bound(137.0 * rho)   # raw histogram counts ok
        assert b1 == pytest.approx(b2, rel=1e-14)
        bound, _ = leggett_bound(np.array([1.0, 0.0, 2.0]))
        assert bound == 0.0

    def test_error_propagation_matches_finite_difference(self):
        from phd_qmclib_tpu.analysis import leggett_bound

        rng = np.random.default_rng(5)
        rho = 1.0 + 0.4 * rng.uniform(size=32)
        err = 0.01 * rng.uniform(0.5, 1.5, size=32)
        bound, bound_err = leggett_bound(rho, err)
        grad = np.empty_like(rho)
        for b in range(rho.size):
            d = np.zeros_like(rho)
            d[b] = 1e-7
            grad[b] = (leggett_bound(rho + d)[0]
                       - leggett_bound(rho - d)[0]) / 2e-7
        expect = np.sqrt(((grad * err) ** 2).sum())
        assert bound_err == pytest.approx(expect, rel=1e-5)

    def test_saturates_ideal_band_curvature(self):
        # In 1D the Leggett bound is SATURATED for the ideal lattice
        # gas: the bound computed from the exact KP one-body density
        # |phi_0|^2 equals the band-curvature m/m* from the dispersion
        # solve — two completely independent computations.
        import jax.numpy as jnp

        from phd_qmclib_tpu import ideal
        from phd_qmclib_tpu.analysis import leggett_bound
        from phd_qmclib_tpu.models import mrbp
        from phd_qmclib_tpu.models.mrbp import _one_body

        z = jnp.asarray(np.linspace(0.0, 1.0, 512, endpoint=False))
        for v0 in (2.0, 10.0, 25.0):
            spec = mrbp.Spec(lattice_depth=v0, lattice_ratio=1.0,
                             interaction_strength=1.0, boson_number=8,
                             supercell_size=8.0,
                             tbf_contact_cutoff=0.2 * 8)
            phi = np.asarray(_one_body(z, spec.cfc_params))
            bound, _ = leggett_bound(np.abs(phi) ** 2)
            exact = ideal.effective_mass_ratio(v0, 1.0)
            assert bound == pytest.approx(exact, rel=2e-5), (v0, bound,
                                                             exact)
            assert bound <= 1.0 + 1e-12


class TestPairCorrelationHelpers:
    def test_counts_normalization_uniform_is_one(self):
        from phd_qmclib_tpu.analysis import pair_correlation_from_counts

        nop, sc, bins = 10, 10.0, 16
        dr = 0.5 * sc / bins
        counts = np.full(bins, nop * (nop - 1) / 2 * dr / (0.5 * sc))
        r, g2, err = pair_correlation_from_counts(
            counts, nop, sc, counts_err=0.1 * counts)
        np.testing.assert_allclose(g2, 1.0, rtol=1e-12)
        np.testing.assert_allclose(err, 0.1, rtol=1e-12)
        np.testing.assert_allclose(r[0], 0.5 * dr)
        with pytest.raises(ValueError, match="fewer than two"):
            pair_correlation_from_counts(counts, 1, sc)

    def test_contact_fit_recovers_cusp_form_exactly(self):
        from phd_qmclib_tpu.analysis import contact_from_pair_correlation

        g, c0, b = 3.0, 0.42, 0.8
        r = (np.arange(32) + 0.5) * 0.02
        g2 = c0 * (1.0 + g * r) + b * r ** 2
        err = np.full_like(g2, 0.01)
        c, c_err = contact_from_pair_correlation(r, g2, err, g)
        assert c == pytest.approx(c0, rel=1e-9)
        assert c_err < 0.05
        # A plain first-bin read is biased high vs the fit's intercept.
        assert g2[0] > c0

    def test_contact_fit_survives_zero_error_bins(self):
        # Empty histogram bins deep in the correlation hole report
        # err = 0 on long runs; the weighted fit must not blow up
        # (regression: SVD non-convergence from 1e12 weights).
        from phd_qmclib_tpu.analysis import contact_from_pair_correlation

        g = 2.0
        r = (np.arange(16) + 0.5) * 0.02
        g2 = 0.3 * (1.0 + g * r)
        err = np.full_like(g2, 0.01)
        err[:2] = 0.0
        g2[:2] = 0.3 * (1.0 + g * r[:2])
        c, c_err = contact_from_pair_correlation(r, g2, err, g)
        assert np.isfinite(c) and np.isfinite(c_err)
        assert c == pytest.approx(0.3, rel=1e-6)


class TestLuttingerParameter:
    def test_recovers_synthetic_power_law_exactly(self):
        from phd_qmclib_tpu.analysis import luttinger_parameter_from_obdm

        L, K = 64.0, 2.5
        offsets = np.linspace(0.0, L / 2, 33)
        chord = (L / np.pi) * np.sin(np.pi * np.maximum(offsets, 1e-9)
                                     / L)
        n1 = 0.9 * chord ** (-1.0 / (2 * K))
        k_fit, k_err = luttinger_parameter_from_obdm(offsets, n1, L)
        assert k_fit == pytest.approx(K, rel=1e-9)

    def test_tg_limit_exponent(self):
        """Tonks-Girardeau: K = 1 exactly (n1 ~ r^{-1/2}).  Use the
        known leading asymptotic form on the chord grid; the fit must
        return K near 1 despite subleading oscillations being absent
        from this synthetic curve."""
        from phd_qmclib_tpu.analysis import luttinger_parameter_from_obdm

        L = 32.0
        offsets = np.linspace(0.0, L / 2, 65)
        chord = (L / np.pi) * np.sin(np.pi * np.maximum(offsets, 1e-9)
                                     / L)
        rho_inf = 0.92418  # G(1/2)^4 / (pi sqrt(2*e)) prefactor scale
        n1 = rho_inf * chord ** -0.5
        k_fit, _ = luttinger_parameter_from_obdm(offsets, n1, L)
        assert k_fit == pytest.approx(1.0, rel=1e-9)

    def test_free_bosons_report_infinite_k(self):
        from phd_qmclib_tpu.analysis import luttinger_parameter_from_obdm

        L = 32.0
        offsets = np.linspace(0.0, L / 2, 17)
        n1 = np.ones_like(offsets)  # constant OBDM: true condensate
        k_fit, _ = luttinger_parameter_from_obdm(offsets, n1, L)
        assert k_fit == float("inf")

    def test_weighted_fit_ignores_zero_error_floor(self):
        from phd_qmclib_tpu.analysis import luttinger_parameter_from_obdm

        L, K = 48.0, 4.0
        offsets = np.linspace(0.0, L / 2, 25)
        chord = (L / np.pi) * np.sin(np.pi * np.maximum(offsets, 1e-9)
                                     / L)
        n1 = chord ** (-1.0 / (2 * K))
        err = np.full_like(n1, 1e-3)
        err[::5] = 0.0
        k_fit, k_err = luttinger_parameter_from_obdm(offsets, n1, L,
                                                     n1_err=err)
        assert k_fit == pytest.approx(K, rel=1e-9)
        assert np.isfinite(k_err)

    def test_contact_fit_survives_nan_error_bins(self):
        # Empty bins reach the fit as NaN errors (ratio-of-means 0/0),
        # not zero — the weighted fit must stay finite (regression:
        # np.maximum(NaN, floor) propagated NaN into lstsq -> SVD
        # failure).
        from phd_qmclib_tpu.analysis import contact_from_pair_correlation

        g = 2.0
        r = (np.arange(16) + 0.5) * 0.02
        g2 = 0.3 * (1.0 + g * r)
        err = np.full_like(g2, 0.01)
        err[0] = np.nan
        err[3] = np.nan
        c, c_err = contact_from_pair_correlation(r, g2, err, g)
        assert np.isfinite(c) and np.isfinite(c_err)
        assert c == pytest.approx(0.3, rel=1e-6)

    def test_luttinger_fit_survives_nan_errors(self):
        from phd_qmclib_tpu.analysis import luttinger_parameter_from_obdm

        L, K = 48.0, 4.0
        offsets = np.linspace(0.0, L / 2, 25)
        chord = (L / np.pi) * np.sin(np.pi * np.maximum(offsets, 1e-9)
                                     / L)
        n1 = chord ** (-1.0 / (2 * K))
        err = np.full_like(n1, 1e-3)
        err[6] = np.nan
        k_fit, k_err = luttinger_parameter_from_obdm(offsets, n1, L,
                                                     n1_err=err)
        assert k_fit == pytest.approx(K, rel=1e-9)
        assert np.isfinite(k_err)


class TestSpectralFunctionFromITC:
    """Regularized inverse Laplace of F(k, tau): moments are exact
    functionals, peaks resolve at the 1/tau_max scale."""

    def test_two_pole_moments_and_mass_recovery(self):
        from phd_qmclib_tpu.analysis import spectral_function_from_itc

        tau = np.arange(33) * 0.125          # tau_max = 4
        f = 0.7 * np.exp(-1.0 * tau) + 0.3 * np.exp(-3.5 * tau)
        sig = 1e-4
        omega, s, info = spectral_function_from_itc(
            tau, f, np.full_like(f, sig), num_omega=96)
        assert (s >= 0).all()
        assert info["m0"] == pytest.approx(1.0, abs=5e-3)
        assert info["m1"] == pytest.approx(1.75, rel=0.02)
        assert info["omega_mean"] == pytest.approx(1.75, rel=0.02)
        # Deep-tau, low-noise: both poles separate, with the right
        # weight in each basin.
        mass_1 = np.trapezoid(np.where(abs(omega - 1.0) < 0.8, s, 0),
                              omega)
        mass_2 = np.trapezoid(np.where(abs(omega - 3.5) < 1.2, s, 0),
                              omega)
        assert mass_1 == pytest.approx(0.7, abs=0.07)
        assert mass_2 == pytest.approx(0.3, abs=0.07)
        assert info["omega_peak"] == pytest.approx(1.0, abs=0.15)

    def test_discrepancy_principle_and_fixed_reg_contract(self):
        from phd_qmclib_tpu.analysis import spectral_function_from_itc

        # This realization CAN be fit below the chi^2 = n target (the
        # non-negative exponential-mixture cone is a hard constraint:
        # mixtures are completely monotone in tau, so a generic noise
        # draw leaves a residual floor and the solver then returns the
        # minimum-smoothing solution instead — also exercised below).
        rng = np.random.default_rng(0)
        tau = np.arange(17) * 0.125
        sig = 1e-3
        f = (0.7 * np.exp(-1.0 * tau) + 0.3 * np.exp(-3.5 * tau)
             + rng.normal(0, sig, tau.shape))
        omega, s, info = spectral_function_from_itc(
            tau, f, np.full_like(f, sig))
        assert info["chi2"] == pytest.approx(tau.size, rel=0.05)
        assert info["lambda"] > 1e-7      # the bisect path engaged
        # Fixed-reg mode reproduces the same solution (the jackknife
        # contract: resamples share the full-data smoothing).
        _, s2, info2 = spectral_function_from_itc(
            tau, f, np.full_like(f, sig), reg=info["lambda"],
            omega_max=float(omega[-1]))
        np.testing.assert_allclose(s2, s, rtol=1e-8, atol=1e-12)
        # A noise draw the cone cannot absorb: chi^2 floors above n
        # and the returned weight is the minimum (no silent failure,
        # moments still sane).
        rng = np.random.default_rng(3)
        f3 = np.exp(-2.0 * np.arange(17) * 0.25)
        f3 = f3 + rng.normal(0, 2e-2, f3.shape)
        f3[0] = 1.0
        _, s3, info3 = spectral_function_from_itc(
            np.arange(17) * 0.25, f3, np.full(17, 2e-2))
        assert info3["chi2"] > 17
        assert info3["m0"] == pytest.approx(1.0, abs=0.1)

    def test_rejects_unusable_input(self):
        from phd_qmclib_tpu.analysis import spectral_function_from_itc

        tau = np.arange(5) * 0.1
        with pytest.raises(ValueError):   # too few finite points
            spectral_function_from_itc(tau, np.array(
                [1.0, np.nan, np.nan, np.nan, 0.5]))
        with pytest.raises(ValueError):   # S(k) <= 0
            spectral_function_from_itc(tau, -np.ones(5))
        with pytest.raises(ValueError):   # growing F, no omega_max
            spectral_function_from_itc(tau, np.exp(+tau))
        # ... but an explicit omega_max lets noisy-growing data through.
        omega, s, info = spectral_function_from_itc(
            tau, np.array([1.0, 0.9, 0.95, 0.8, 0.7]), omega_max=20.0)
        assert np.isfinite(s).all()

    def test_nan_lags_are_masked_not_fatal(self):
        from phd_qmclib_tpu.analysis import spectral_function_from_itc

        tau = np.arange(17) * 0.25
        f = np.exp(-1.2 * tau)
        f[-3:] = np.nan                   # unfilled ring-buffer rows
        omega, s, info = spectral_function_from_itc(
            tau, f, np.full_like(f, 1e-4))
        assert info["omega_mean"] == pytest.approx(1.2, rel=0.03)

    def test_tg_free_fermion_spectrum_support_and_moments(self):
        """Tonks-Girardeau point, exact F(k, tau): the inversion must
        put the spectral weight inside the particle-hole band
        [omega_min(k), omega_max(k)] (up to the 1/tau_max resolution
        broadening) and reproduce the exact channel moments — the same
        multi-channel decay the sampler gate
        ``tests/samplers/test_itc.py`` validates dynamically."""
        from phd_qmclib_tpu.analysis import spectral_function_from_itc

        nop, sc = 5, 5.0
        k1 = 2 * np.pi / sc
        q = 2 * np.pi / sc * np.arange(-(nop // 2), nop // 2 + 1)
        fermi = set(np.round(q, 12))
        for j in (1, 2):
            k = j * k1
            omegas = np.array([(qi + k) ** 2 - qi ** 2 for qi in q
                               if round(qi + k, 12) not in fermi])
            tau = np.linspace(0, 3.0 / omegas.min(), 48)
            f = np.exp(-np.outer(tau, omegas)).sum(axis=1) / nop
            om, s, info = spectral_function_from_itc(
                tau, f, np.full_like(f, 1e-5 * f[0]), num_omega=128,
                omega_max=1.5 * omegas.max())
            # Exact channel moments (weights 1/N each).
            assert info["m0"] == pytest.approx(omegas.size / nop,
                                               rel=0.01)
            assert info["m1"] == pytest.approx(omegas.sum() / nop,
                                               rel=0.02)
            # >= 95% of the weight inside the (resolution-padded)
            # particle-hole band.
            pad = 2.0 / tau[-1]
            inside = (om >= omegas.min() - pad) & \
                     (om <= omegas.max() + pad)
            frac = np.trapezoid(np.where(inside, s, 0.0), om) \
                / info["m0"]
            assert frac > 0.95


class TestSpectralResolutionSystematic:
    """Self-calibrated finite-resolution systematic: a sharp single
    pole at the recovered mean frequency pushed through the same
    inversion operator measures the smoothing bias the jackknife
    cannot see (the TG exact-F control isolated it at ~10% of
    omega_mean for omega_1 tau_max ~ 0.6, BASELINE.md)."""

    def _invert(self, omega0, tau_max, n_lags=17, sig=1e-3):
        from phd_qmclib_tpu.analysis import spectral_function_from_itc

        tau = np.linspace(0.0, tau_max, n_lags)
        f = np.exp(-omega0 * tau)
        return spectral_function_from_itc(
            tau, f, np.full_like(f, sig), num_omega=96)

    def test_single_pole_sys_tracks_the_true_bias(self):
        # Shallow lags: omega0 * tau_max = 0.6, the documented regime
        # where smoothing inflates omega_mean by ~10%.
        omega0 = 3.0
        _, _, info = self._invert(omega0, tau_max=0.2)
        bias = info["omega_mean"] - omega0
        assert bias > 0.02 * omega0          # the overshoot is real
        sys = info["omega_mean_sys"]
        assert np.isfinite(sys) and sys > 0
        # The self-calibration must capture the actual bias to within
        # a factor ~2 (the control sits at the recovered frequency,
        # not the unknown true one — a second-order mismatch).
        assert 0.4 * bias < sys < 2.5 * bias
        # And subtracting it must move the estimate TOWARD the truth.
        assert abs(info["omega_mean"] - sys - omega0) < abs(bias)

    def test_sys_shrinks_with_deeper_lags(self):
        omega0 = 3.0
        _, _, shallow = self._invert(omega0, tau_max=0.2)
        _, _, deep = self._invert(omega0, tau_max=1.2, n_lags=49)
        assert np.isfinite(shallow["omega_mean_sys"])
        assert np.isfinite(deep["omega_mean_sys"])
        assert abs(deep["omega_mean_sys"]) \
            < 0.5 * abs(shallow["omega_mean_sys"])
        # m1 carries the matching shift estimate.
        assert np.isfinite(shallow["m1_sys"])

    def test_blocks_surface_and_report_json_keys(self):
        from phd_qmclib_tpu.qmc_exec.data.dmc import ITCBlocks

        num_lags, modes, n_blocks, tau_step = 10, 3, 4, 0.05
        nop, sc = 8, 8.0
        omega = np.array([0.0, 2.0, 5.0])
        tau = np.arange(num_lags + 1) * tau_step
        f = np.exp(-omega[None, :] * tau[:, None])
        counts = np.full((n_blocks, num_lags + 1), 64.0)
        sums = np.broadcast_to(f * 64.0 * nop,
                               (n_blocks, num_lags + 1, modes)).copy()
        blocks = ITCBlocks(sums, counts, tau_step, nop, sc)
        spec = blocks.spectral_function(num_omega=64)
        for key in ("omega_mean_sys", "omega_peak_sys", "m1_sys"):
            assert key in spec
            assert np.isfinite(spec[key][1:]).all()
        assert np.isnan(spec["omega_mean_sys"][0])  # k = 0 excluded
