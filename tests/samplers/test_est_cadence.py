"""Estimator measurement cadence (``est_every``).

The walker dynamics draw the same key stream regardless of cadence, so
the trajectories — and therefore every per-step ensemble property —
must be IDENTICAL between ``est_every=1`` and ``est_every=K``; the
mixed estimator entries of the cadence run must equal the K-th entries
of the every-step run bit-for-bit; and the pure (forward-walking)
estimators must stay consistent with the every-step accumulation.
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc

NOP = 8
SC = 8.0
K = 4
NTS = 16


def _spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=1.5, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)


def _run(est_every, as_pure, nblocks=2):
    sampling = dmc.Sampling(
        _spec(), time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, rng_seed=7, est_every=est_every,
        density_est_spec=dmc.DensityEstSpec(num_bins=16,
                                            as_pure_est=as_pure),
        ssf_est_spec=dmc.SSFEstSpec(num_modes=4, as_pure_est=as_pure),
        obd_est_spec=dmc.OBDEstSpec(num_pos=5, as_pure_est=as_pure))
    rng = np.random.default_rng(2)
    confs = np.stack([sampling.model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(32)])
    state = sampling.build_state(confs)
    it = sampling.blocks(state, NTS)
    return [next(it) for _ in range(nblocks)]


@pytest.mark.parametrize("as_pure", [False, True])
def test_dynamics_identical_across_cadence(as_pure):
    b1 = _run(1, as_pure)
    bk = _run(K, as_pure)
    for a, b in zip(b1, bk):
        for name in dmc.PropsData._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a.iter_props, name)),
                np.asarray(getattr(b.iter_props, name)), err_msg=name)
        np.testing.assert_array_equal(np.asarray(a.last_state.pos),
                                      np.asarray(b.last_state.pos))


def test_mixed_cadence_entries_subsample_every_step_run():
    b1 = _run(1, as_pure=False)
    bk = _run(K, as_pure=False)
    for a, b in zip(b1, bk):
        assert np.asarray(b.iter_density).shape == (NTS // K, 16)
        assert np.asarray(b.iter_ssf).shape == (NTS // K, 4, 3)
        assert np.asarray(b.iter_obd).shape == (NTS // K, 5)
        for name in ("iter_density", "iter_ssf", "iter_obd"):
            every = np.asarray(getattr(a, name))
            cad = np.asarray(getattr(b, name))
            np.testing.assert_array_equal(
                cad, every[K - 1::K], err_msg=name)


def test_pure_cadence_consistent_with_every_step():
    """Pure accumulators subsample the same trajectory, so the
    end-of-window estimate must agree with the every-step accumulation
    within the subsampling scatter (identical ensembles, K-fold fewer
    samples averaged)."""
    b1 = _run(1, as_pure=True, nblocks=3)
    bk = _run(K, as_pure=True, nblocks=3)
    d1 = np.asarray(b1[-1].iter_density, dtype=np.float64)[-1]
    dk = np.asarray(bk[-1].iter_density, dtype=np.float64)[-1]
    nw = float(np.asarray(b1[-1].iter_props.num_walkers)[-1])
    # Same normalization (per-walker occupation sums to N).
    np.testing.assert_allclose(d1.sum() / nw, NOP, rtol=1e-6)
    np.testing.assert_allclose(dk.sum() / nw, NOP, rtol=1e-6)
    # Bin-wise agreement at the level of the subsampling noise.
    np.testing.assert_allclose(dk, d1, rtol=0.5, atol=0.5 * d1.max())


def test_validation():
    with pytest.raises(ValueError, match="positive"):
        dmc.Sampling(_spec(), 1e-3, 48, 32, rng_seed=1, est_every=0)
    with pytest.raises(ValueError, match="divisible"):
        dmc.Sampling(_spec(), 1e-3, 48, 32, rng_seed=1, est_every=4,
                     density_est_spec=dmc.DensityEstSpec(
                         num_bins=8, as_pure_est=True,
                         pfw_num_time_steps=6))
    s = dmc.Sampling(_spec(), 1e-3, 48, 32, rng_seed=1, est_every=3,
                     density_est_spec=dmc.DensityEstSpec(num_bins=8))
    rng = np.random.default_rng(0)
    confs = np.stack([s.model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(32)])
    state = s.build_state(confs)
    with pytest.raises(ValueError, match="divisible"):
        next(s.blocks(state, 16))


def _run_obd(est_every, obd_mult, as_pure, nblocks=2, mesh=None):
    sampling = dmc.Sampling(
        _spec(), time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, rng_seed=7, est_every=est_every,
        mesh=mesh,
        density_est_spec=dmc.DensityEstSpec(num_bins=16,
                                            as_pure_est=as_pure),
        ssf_est_spec=dmc.SSFEstSpec(num_modes=4, as_pure_est=as_pure),
        obd_est_spec=dmc.OBDEstSpec(num_pos=5, as_pure_est=as_pure,
                                    est_every_mult=obd_mult),
        pair_corr_est_spec=dmc.PairCorrEstSpec(
            num_bins=6, as_pure_est=as_pure, est_every_mult=obd_mult))
    rng = np.random.default_rng(2)
    confs = np.stack([sampling.model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(32)])
    state = sampling.build_state(confs)
    it = sampling.blocks(state, NTS)
    return [next(it) for _ in range(nblocks)]


class TestObdEveryMult:
    """OBDM-specific cadence multiplier (``OBDEstSpec.est_every_mult``)."""

    @pytest.mark.parametrize("as_pure", [False, True])
    def test_equivalent_step_sets_bit_identical(self, as_pure):
        # est_every=2 and (est_every=1, mult=2) measure the OBDM at the
        # SAME steps with the same trajectory: outputs must be
        # bit-identical (pure accumulators included).
        a = _run_obd(2, 1, as_pure)
        b = _run_obd(1, 2, as_pure)
        for x, y in zip(a, b):
            assert np.asarray(x.iter_obd).shape == (NTS // 2, 5)
            np.testing.assert_array_equal(np.asarray(x.iter_obd),
                                          np.asarray(y.iter_obd))
            np.testing.assert_array_equal(np.asarray(x.last_state.pos),
                                          np.asarray(y.last_state.pos))

    def test_mixed_entries_subsample_every_step_run(self):
        full = _run_obd(1, 1, as_pure=False)
        m = _run_obd(1, 4, as_pure=False)
        for a, b in zip(full, m):
            assert np.asarray(b.iter_obd).shape == (NTS // 4, 5)
            np.testing.assert_array_equal(
                np.asarray(b.iter_obd), np.asarray(a.iter_obd)[3::4])

    @pytest.mark.parametrize("as_pure", [False, True])
    def test_other_estimators_and_dynamics_unaffected(self, as_pure):
        a = _run_obd(2, 1, as_pure)
        b = _run_obd(2, 4, as_pure)
        for x, y in zip(a, b):
            for name in dmc.PropsData._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(x.iter_props, name)),
                    np.asarray(getattr(y.iter_props, name)),
                    err_msg=name)
            np.testing.assert_array_equal(np.asarray(x.iter_density),
                                          np.asarray(y.iter_density))
            np.testing.assert_array_equal(np.asarray(x.iter_ssf),
                                          np.asarray(y.iter_ssf))
            assert np.asarray(y.iter_obd).shape == (NTS // 8, 5)

    def test_sharded_mesh_runs(self):
        import jax

        from phd_qmclib_tpu.parallel import make_walker_mesh
        mesh = make_walker_mesh(len(jax.devices()))
        blocks = _run_obd(2, 2, as_pure=True, mesh=mesh)
        obd = np.asarray(blocks[-1].iter_obd, dtype=np.float64)
        assert obd.shape == (NTS // 4, 5)
        assert np.isfinite(obd).all() and (obd > 0).all()
        # The cond-gated g2 multiplier rides the same shard_map
        # vartype pattern; pair-count sum rule must hold on the mesh.
        g2 = np.asarray(blocks[-1].iter_g2, dtype=np.float64)
        nw = np.asarray(blocks[-1].iter_props.num_walkers,
                        dtype=np.float64)[3::4]
        np.testing.assert_allclose(g2.sum(axis=1),
                                   NOP * (NOP - 1) / 2 * nw, rtol=1e-7)

    def test_validation(self):
        with pytest.raises(ValueError, match="positive integer"):
            _run_obd(1, 0, as_pure=False)
        with pytest.raises(ValueError, match="divisible"):
            _run_obd(1, 3, as_pure=False)  # NTS=16 not divisible by 3
