"""Reblocking engine tests.

Mirrors the reference test strategy
(``/root/reference/tests/stats/test_reblock.py``): the on-the-fly table
analysis must agree with the explicit-reshaping analysis on identical
data, the optimal-block-size warning path must trigger on uncorrelated
data of marginal length, and tables must merge/extend across simulated
restarts.
"""
import warnings

import numpy as np
import pytest

from phd_qmclib_tpu.stats import reblock


def make_correlated_series(n, tau=8.0, seed=577):
    rng = np.random.default_rng(seed)
    alpha = np.exp(-1.0 / tau)
    noise = rng.normal(size=n)
    out = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = alpha * acc + np.sqrt(1 - alpha ** 2) * noise[i]
        out[i] = acc
    return out + 5.0


class TestObjectVsOTF:

    def test_vars_match_explicit_reshaping(self):
        data = make_correlated_series(2 ** 12)
        explicit = reblock.Object(data)
        otf = reblock.OTFObject.from_non_obj_data(data)

        # Compare over the shared block sizes (the OTF table includes
        # every order with >= 2 blocks; Object excludes none here).
        n = min(len(explicit.block_sizes), len(otf.block_sizes))
        assert np.all(explicit.block_sizes[:n] == otf.block_sizes[:n])
        assert np.allclose(explicit.means[:n], otf.means[:n])
        assert np.allclose(explicit.vars[:n], otf.vars[:n])
        assert np.allclose(explicit.errors[:n], otf.errors[:n])
        assert np.allclose(explicit.iac_times[:n], otf.iac_times[:n])

    def test_mean_and_error_sane(self):
        tau = 8.0
        data = make_correlated_series(2 ** 15, tau=tau)
        otf = reblock.OTFObject.from_non_obj_data(data)
        assert otf.mean == pytest.approx(data.mean())
        # IAC time should come out near the series tau.
        assert 0.3 * tau < otf.opt_iac_time < 3.0 * tau
        # The effective error must exceed the naive (uncorrelated) error.
        naive = np.sqrt(data.var(ddof=1) / len(data))
        assert otf.mean_eff_error > 1.5 * naive

    def test_constant_series_is_defined_and_warning_free(self):
        # A zero-variance series (e.g. num_walkers pinned at the cap, or
        # S(0)) must yield defined statistics, no NaNs, and no
        # RuntimeWarnings from 0/0 in the IAC times.
        data = np.full(2 ** 10, 7.0)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            for obj in (reblock.Object(data),
                        reblock.OTFObject.from_non_obj_data(data)):
                assert obj.mean == pytest.approx(7.0)
                assert obj.var == 0.0
                assert np.all(np.isfinite(obj.iac_times))
                # Uncorrelated-limit IAC by definition for constant data.
                assert np.allclose(obj.iac_times, 0.5)
                assert obj.opt_block_size in obj.block_sizes
                assert obj.mean_eff_error == 0.0

    def test_constant_column_in_set(self):
        rng = np.random.default_rng(3)
        tab = np.stack([rng.normal(size=2 ** 10),
                        np.full(2 ** 10, 2.5)], axis=1)
        oset = reblock.OTFSet.from_non_obj_data(tab)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            const = oset[1]
            assert np.all(np.isfinite(const.iac_times))
            assert const.mean_eff_error == 0.0

    def test_opt_block_size_warning(self):
        # Strongly correlated, short series: criterion unsatisfied.
        data = make_correlated_series(2 ** 6, tau=64.0)
        otf = reblock.OTFObject.from_non_obj_data(data)
        with pytest.warns(RuntimeWarning):
            opt = otf.opt_block_size
        assert opt == otf.block_sizes.max()


class TestMergeAndExtend:

    def test_update_equals_concat_counts(self):
        a = make_correlated_series(2 ** 10, seed=1)
        b = make_correlated_series(2 ** 10, seed=2)
        ta = reblock.on_the_fly_obj_create(a)
        tb = reblock.on_the_fly_obj_create(b)
        reblock.on_the_fly_obj_data_update(ta, tb)
        tc = reblock.on_the_fly_obj_create(np.concatenate([a, b]))
        # Merged counts/sums match the concatenated series at every
        # shared order (the concat table has one extra order).
        n = ta.shape[0]
        for field in (reblock.MEANS_FIELD, reblock.NUM_BLOCKS_FIELD):
            assert np.allclose(ta[field], tc[field][:n])

    def test_extend_obj_data_set(self):
        num_runs, run_len = 8, 2 ** 9
        runs = [make_correlated_series(run_len, seed=s)
                for s in range(num_runs)]
        tables = np.stack([reblock.on_the_fly_obj_create(r) for r in runs])
        extended = reblock.on_the_fly_extend_obj_data_set(tables)
        obj = reblock.OTFObject(extended)
        full = np.concatenate(runs)
        # Mean must equal the full-series mean; deeper orders exist.
        assert obj.mean == pytest.approx(full.mean())
        assert extended.shape[0] > tables.shape[1]
        # Low orders agree exactly with the full-series reblocking.
        tc = reblock.on_the_fly_obj_create(full)
        low = tables.shape[1]
        assert np.allclose(extended[reblock.MEANS_FIELD][:low],
                           tc[reblock.MEANS_FIELD][:low])

    def test_set_interface(self):
        data = np.stack([make_correlated_series(2 ** 10, seed=s)
                         for s in range(4)], axis=1)  # (n, 4 cols)
        otf_set = reblock.OTFSet.from_non_obj_data(data)
        assert len(otf_set) == 4
        for col, obj in enumerate(otf_set):
            single = reblock.OTFObject.from_non_obj_data(data[:, col])
            assert np.allclose(obj.means, single.means)
            assert np.allclose(obj.vars, single.vars)
        assert np.allclose(otf_set.mean, data.mean(axis=0))


class TestNativeCascade:

    def test_native_matches_numpy(self):
        from phd_qmclib_tpu.stats import native
        if not native.native_available():
            pytest.skip("native library not built (make -C csrc)")
        rng = np.random.default_rng(8)
        # 2D data large enough to trigger the native path.
        data = rng.normal(size=(2 ** 15, 3)) + 1.5
        t_native = reblock.on_the_fly_obj_create(data)
        max_order = reblock.on_the_fly_obj_data_order(data)
        ms, msq, nb = native.otf_reblock_native(data, max_order)
        # Independent re-computation via explicit reshaping.
        for col in range(3):
            explicit = reblock.Object(data[:, col])
            n = len(explicit.block_sizes)
            np.testing.assert_allclose(
                (ms[col] / nb[col])[:n], explicit.means[:n])
        assert np.all(t_native["NUM_BLOCKS"] == nb)


class TestIACTimeFit:

    def test_fit_recovers_plateau(self):
        times = np.array([1, 2, 4, 8, 16, 32, 64, 128, 256], dtype=float)
        true = reblock.IACTimeFit.__func__(times, 8.0, 12.0, 7.5)
        fit = reblock.IACTimeFit(times, true)
        assert fit.iac_time == pytest.approx(8.0, rel=1e-4)
        assert fit.eac_time == pytest.approx(12.0, rel=1e-3)
        assert np.allclose(fit(times), true, rtol=1e-5)
