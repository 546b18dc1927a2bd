"""Analysis-helper tests: momentum distribution from an OBDM grid."""
import numpy as np
import pytest

from phd_qmclib_tpu import analysis


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
