"""Estimator cadence through the execution layer.

The trajectories are cadence-independent (same key stream), so the
mixed estimator statistics of an ``est_every=K`` procedure must be
exactly computable from the every-step run's series — and the
``keep_iter_data`` on/off invariant must hold at any cadence.
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec

K = 4
NTS = 16


def _proc(est_every, keep, as_pure):
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=1.5, boson_number=6,
                     supercell_size=6.0, tbf_contact_cutoff=0.3)
    return dmc_exec.Proc(
        model_spec=spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, num_blocks=3, num_time_steps_block=NTS,
        burn_in_blocks=1, rng_seed=19, dtype="float64",
        keep_iter_data=keep, est_every=est_every,
        density_spec=dmc_exec.DensityEstSpec(num_bins=12,
                                             as_pure_est=as_pure),
        ssf_spec=dmc_exec.SSFEstSpec(num_modes=4, as_pure_est=as_pure))


def _exec(proc):
    inp = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    return proc.exec(inp)


@pytest.mark.slow
def test_mixed_cadence_mean_matches_series_subsample():
    full = _exec(_proc(1, keep=True, as_pure=False))
    cad = _exec(_proc(K, keep=False, as_pure=False))

    series = full.data.series
    dens = np.asarray(series.density)              # (B, nts, bins)
    weights = np.asarray(series.iter_props.weight)  # (B, nts)
    # Expected cadence statistics: measured-step sums over the SAME
    # trajectory, normalized by the measured steps' weights.
    totals = dens[:, K - 1::K].sum(axis=1)
    wtot = weights[:, K - 1::K].sum(axis=1)
    cd = cad.data.blocks.density
    np.testing.assert_allclose(np.asarray(cd.totals), totals,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cd.weight_totals)[..., 0],
                               wtot, rtol=1e-12)
    # Walker-averaged density still integrates to N.
    np.testing.assert_allclose(cd.mean.sum(), 6.0, rtol=1e-9)


@pytest.mark.parametrize("as_pure", [False, True])
@pytest.mark.slow
def test_keep_iter_invariant_at_cadence(as_pure):
    on = _exec(_proc(K, keep=True, as_pure=as_pure))
    off = _exec(_proc(K, keep=False, as_pure=as_pure))
    for attr in ("density", "ss_factor"):
        a = getattr(on.data.blocks, attr)
        b = getattr(off.data.blocks, attr)
        if attr == "ss_factor":
            np.testing.assert_allclose(a.mean, b.mean, rtol=1e-10)
        else:
            np.testing.assert_allclose(np.asarray(a.totals),
                                       np.asarray(b.totals), rtol=1e-12)
            np.testing.assert_allclose(a.mean, b.mean, rtol=1e-10)


def test_proc_validation_and_config_roundtrip():
    with pytest.raises(ValueError, match="divisible"):
        _proc(5, keep=False, as_pure=False)
    proc = _proc(K, keep=False, as_pure=True)
    config = proc.as_config()
    assert config["est_every"] == K
    rebuilt = dmc_exec.Proc.from_config(config)
    assert rebuilt.est_every == K


def _proc_obd(est_every, obd_mult, keep, as_pure, obd_pure=None):
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=1.5, boson_number=6,
                     supercell_size=6.0, tbf_contact_cutoff=0.3)
    return dmc_exec.Proc(
        model_spec=spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, num_blocks=3, num_time_steps_block=NTS,
        burn_in_blocks=1, rng_seed=19, dtype="float64",
        keep_iter_data=keep, est_every=est_every,
        ssf_spec=dmc_exec.SSFEstSpec(num_modes=4, as_pure_est=as_pure),
        obd_spec=dmc_exec.OBDEstSpec(
            num_pos=4, as_pure_est=as_pure if obd_pure is None
            else obd_pure, est_every_mult=obd_mult))


class TestObdEveryMultProc:
    """The OBDM cadence multiplier through the execution layer."""

    @pytest.mark.slow
    def test_mixed_obd_mean_matches_series_subsample(self):
        full = _exec(_proc_obd(1, 1, keep=True, as_pure=False))
        m = _exec(_proc_obd(1, K, keep=False, as_pure=False))
        series_obd = np.asarray(full.data.series.obd)      # (B, nts, P)
        weights = np.asarray(full.data.series.iter_props.weight)
        ob = m.data.blocks.one_body_dm
        np.testing.assert_allclose(
            np.asarray(ob.totals), series_obd[:, K - 1::K].sum(axis=1),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ob.weight_totals)[..., 0],
            weights[:, K - 1::K].sum(axis=1), rtol=1e-12)
        # The cheap estimator is untouched by the OBDM cadence.
        np.testing.assert_allclose(
            m.data.blocks.ss_factor.mean,
            full.data.blocks.ss_factor.mean, rtol=1e-10)

    @pytest.mark.parametrize("as_pure", [False, True])
    @pytest.mark.slow
    def test_keep_iter_invariant(self, as_pure):
        on = _exec(_proc_obd(2, 2, keep=True, as_pure=as_pure))
        off = _exec(_proc_obd(2, 2, keep=False, as_pure=as_pure))
        a, b = on.data.blocks.one_body_dm, off.data.blocks.one_body_dm
        np.testing.assert_allclose(np.asarray(a.totals),
                                   np.asarray(b.totals), rtol=1e-12)
        np.testing.assert_allclose(a.mean, b.mean, rtol=1e-10)

    @pytest.mark.parametrize("as_pure", [False, True])
    @pytest.mark.slow
    def test_equivalent_cadence_factorizations_identical(self, as_pure):
        # est_every=4 and (est_every=2, mult=2) measure the OBDM at the
        # same steps of the same trajectory: identical obd statistics.
        a = _exec(_proc_obd(4, 1, keep=False, as_pure=as_pure))
        b = _exec(_proc_obd(2, 2, keep=False, as_pure=as_pure))
        np.testing.assert_allclose(
            np.asarray(a.data.blocks.one_body_dm.totals),
            np.asarray(b.data.blocks.one_body_dm.totals), rtol=1e-12)

    def test_config_roundtrip_and_validation(self):
        proc = _proc_obd(2, 2, keep=False, as_pure=True)
        config = proc.as_config()
        assert config["obd_spec"]["est_every_mult"] == 2
        rebuilt = dmc_exec.Proc.from_config(config)
        assert rebuilt.obd_spec.est_every_mult == 2
        with pytest.raises(ValueError, match="divisible"):
            _proc_obd(2, 3, keep=False, as_pure=False)  # 16 % 6 != 0
        with pytest.raises(ValueError, match="positive"):
            _proc_obd(1, 0, keep=False, as_pure=False)
