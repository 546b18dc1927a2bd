"""Parameter-sweep mesh axis: one DMC sampling per sweep row, all rows
advanced by one dispatch on a 2-D ("sweep", "walkers") mesh.

Exactness gate: each row of the fused dispatch must reproduce the
sequential (single-row) sampling bit-for-bit when given the same seed
and walker-shard layout, because the sweep wrapper folds the same
per-row/per-shard key stream and runs the identical per-shard body.
"""
import numpy as np
import pytest

import jax

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.parallel.sweep import ParamSweep
from phd_qmclib_tpu.samplers import dmc

GNS = [0.5, 1.0, 2.0, 4.0]


def _spec(gn):
    return mrbp.Spec(lattice_depth=12.0, lattice_ratio=1.0,
                     interaction_strength=gn, boson_number=8,
                     supercell_size=8.0, tbf_contact_cutoff=0.3)


def _confs(spec, num, seed=5):
    rng = np.random.default_rng(seed)
    return np.stack([spec.init_get_sys_conf(rng=rng)
                     for _ in range(num)])


@pytest.fixture(scope="module")
def sweep_mesh():
    devices = jax.devices()[:8]
    return jax.make_mesh((4, 2), ("sweep", "walkers"), devices=devices)


def test_static_structure_enforced(sweep_mesh):
    rows = [dmc.Sampling(_spec(gn), 1e-3, 32, 16, rng_seed=1)
            for gn in GNS[:3]]
    ideal_spec = mrbp.Spec(lattice_depth=12.0, lattice_ratio=1.0,
                           interaction_strength=0.0, boson_number=8,
                           supercell_size=8.0, tbf_contact_cutoff=0.3)
    rows.append(dmc.Sampling(ideal_spec, 1e-3, 32, 16, rng_seed=1))
    with pytest.raises(ValueError, match="static structure"):
        ParamSweep(tuple(rows), sweep_mesh)


@pytest.mark.slow
def test_sweep_matches_sequential_rows(sweep_mesh):
    """The fused 2-D dispatch reproduces each coupling's sequential
    sharded run exactly (same seed, same per-shard key folds)."""
    max_w, target = 32, 16
    nts, nblocks = 8, 3
    rows = tuple(
        dmc.Sampling(_spec(gn), 1e-3, max_w, target, rng_seed=21)
        for gn in GNS)
    sweep = ParamSweep(rows, sweep_mesh)
    conf_sets = [_confs(s.model_spec, target) for s in rows]
    state = sweep.build_states(conf_sets)

    fused = []
    it = sweep.blocks(state, nts)
    for _ in range(nblocks):
        block = next(it)
        fused.append(jax.tree.map(np.asarray, block.iter_props))

    # Sequential reference: each row on a 2-device walker mesh with the
    # same shard layout and the same seed.
    seq_mesh = jax.make_mesh((2,), ("walkers",),
                             devices=jax.devices()[:2])
    for r, gn in enumerate(GNS):
        sampling = dmc.Sampling(_spec(gn), 1e-3, max_w, target,
                                rng_seed=21, mesh=seq_mesh)
        row_state = sampling.build_state(conf_sets[r])
        it = sampling.blocks(row_state, nts)
        for b in range(nblocks):
            block = next(it)
            seq_e = np.asarray(block.iter_props.energy,
                               dtype=np.float64)
            seq_w = np.asarray(block.iter_props.weight,
                               dtype=np.float64)
            np.testing.assert_allclose(
                np.asarray(fused[b].energy[:, r], dtype=np.float64),
                seq_e, rtol=1e-12,
                err_msg=f"row {r} (gn={gn}) block {b}")
            np.testing.assert_allclose(
                np.asarray(fused[b].weight[:, r], dtype=np.float64),
                seq_w, rtol=1e-12)

    # And the physics: energies increase with coupling at fixed
    # lattice (equation of state is monotone in gn).
    last = fused[-1]
    e_per_n = last.energy[-1] / last.weight[-1] / 8
    assert np.all(np.diff(e_per_n) > 0), e_per_n


@pytest.mark.slow
def test_sweep_carries_estimators_including_obdm(sweep_mesh):
    """Estimator outputs (density, S(k), OBDM — mixed and pure) flow
    through the fused sweep dispatch and match each row's standalone
    sharded run bit-for-bit."""
    max_w, target = 32, 16
    nts, nblocks = 6, 2
    ests = dict(
        density_est_spec=dmc.DensityEstSpec(num_bins=16),
        ssf_est_spec=dmc.SSFEstSpec(num_modes=5),
        obd_est_spec=dmc.OBDEstSpec(num_pos=9, as_pure_est=True))
    rows = tuple(
        dmc.Sampling(_spec(gn), 1e-3, max_w, target, rng_seed=13, **ests)
        for gn in GNS)
    sweep = ParamSweep(rows, sweep_mesh)
    conf_sets = [_confs(s.model_spec, target) for s in rows]
    state = sweep.build_states(conf_sets)

    it = sweep.blocks(state, nts)
    fused = [next(it) for _ in range(nblocks)]
    assert fused[0].iter_obd.shape == (4, nts, 9)
    assert fused[0].iter_density.shape[0] == 4
    assert fused[0].iter_ssf.shape[0] == 4

    seq_mesh = jax.make_mesh((2,), ("walkers",),
                             devices=jax.devices()[:2])
    for r, gn in enumerate(GNS):
        sampling = dmc.Sampling(_spec(gn), 1e-3, max_w, target,
                                rng_seed=13, mesh=seq_mesh, **ests)
        row_state = sampling.build_state(conf_sets[r])
        rit = sampling.blocks(row_state, nts)
        for b in range(nblocks):
            block = next(rit)
            for name in ("iter_density", "iter_ssf", "iter_obd"):
                np.testing.assert_allclose(
                    np.asarray(getattr(fused[b], name))[r],
                    np.asarray(getattr(block, name)), rtol=1e-12,
                    err_msg=f"{name} row {r} (gn={gn}) block {b}")
    # Sanity on the OBDM values: finite, positive diagonal on every
    # row (the coupling ordering of the decay needs an equilibrated
    # run — covered by benchmarks/obdm_scan.py on hardware).
    n1 = np.asarray(fused[-1].iter_obd, dtype=np.float64)[:, -1, :]
    assert np.all(np.isfinite(n1))
    assert np.all(n1[:, 0] > 0)


@pytest.mark.slow
def test_vmap_fused_sweep_matches_sequential_rows():
    """mesh=None: rows vmap-fused on one device must reproduce each
    row's standalone single-device run bit-for-bit (same seed, same
    key folds) — the production form for underfilled-chip scans."""
    max_w, target = 32, 16
    nts, nblocks = 8, 2
    ests = dict(density_est_spec=dmc.DensityEstSpec(num_bins=8),
                obd_est_spec=dmc.OBDEstSpec(num_pos=5))
    rows = tuple(
        dmc.Sampling(_spec(gn), 1e-3, max_w, target, rng_seed=29, **ests)
        for gn in GNS)
    sweep = ParamSweep(rows)
    conf_sets = [_confs(s.model_spec, target) for s in rows]
    state = sweep.build_states(conf_sets)
    assert state.pos.shape == (4, 32, 8)

    it = sweep.blocks(state, nts)
    fused = [next(it) for _ in range(nblocks)]

    for r, gn in enumerate(GNS):
        sampling = dmc.Sampling(_spec(gn), 1e-3, max_w, target,
                                rng_seed=29, **ests)
        row_state = sampling.build_state(conf_sets[r])
        rit = sampling.blocks(row_state, nts)
        for b in range(nblocks):
            block = next(rit)
            np.testing.assert_allclose(
                np.asarray(fused[b].iter_props.energy,
                           dtype=np.float64)[:, r],
                np.asarray(block.iter_props.energy, dtype=np.float64),
                rtol=1e-12, err_msg=f"row {r} (gn={gn}) block {b}")
            for name in ("iter_density", "iter_obd"):
                np.testing.assert_allclose(
                    np.asarray(getattr(fused[b], name))[r],
                    np.asarray(getattr(block, name)), rtol=1e-12)


def test_sweep_build_states_layout(sweep_mesh):
    rows = tuple(
        dmc.Sampling(_spec(gn), 1e-3, 32, 14, rng_seed=3)
        for gn in GNS)
    sweep = ParamSweep(rows, sweep_mesh)
    state = sweep.build_states(
        [_confs(s.model_spec, 14) for s in rows])
    assert state.pos.shape == (4, 32, 8)
    counts = np.asarray(state.num_walkers)
    assert counts.shape == (4, 2)
    # 14 walkers dealt over 2 shards -> 7 + 7.
    np.testing.assert_array_equal(counts, np.full((4, 2), 7))
    # Valid walkers form a prefix of each shard slice.
    masks = np.asarray(state.masks)
    shard_size = 16
    for r in range(4):
        for s in range(2):
            sl = masks[r, s * shard_size:(s + 1) * shard_size]
            assert not sl[:7].any() and sl[7:].all()


@pytest.mark.slow
def test_vmc_sweep_matches_sequential_rows():
    """VmcSweep: rows vmap-fused on one device reproduce each row's
    standalone run bit-for-bit (same seed, same key folds)."""
    from phd_qmclib_tpu.parallel.sweep import VmcSweep
    from phd_qmclib_tpu.samplers import vmc

    nts, nblocks = 32, 2
    ests = dict(ssf_est_spec=vmc.SSFEstSpec(num_modes=4),
                obd_est_spec=vmc.OBDEstSpec(num_pos=5),
                pair_corr_est_spec=vmc.PairCorrEstSpec(num_bins=6))
    rows = tuple(
        vmc.Sampling(_spec(gn), move_spread=0.2 + 0.02 * i,
                     rng_seed=33 + i, num_walkers=16, **ests)
        for i, gn in enumerate(GNS))
    sweep = VmcSweep(rows)
    conf_sets = [_confs(s.model_spec, 16) for s in rows]
    state = sweep.build_states(conf_sets)
    assert state.pos.shape == (4, 16, 8)

    it = sweep.blocks(nts, state)
    fused = [next(it) for _ in range(nblocks)]
    assert fused[0].iter_ssf.shape == (4, nts, 4, 3)
    assert fused[0].accept_rate.shape == (4,)

    for r, gn in enumerate(GNS):
        sampling = vmc.Sampling(_spec(gn), move_spread=0.2 + 0.02 * r,
                                rng_seed=33 + r, num_walkers=16, **ests)
        row_state = sampling.build_state(conf_sets[r])
        rit = sampling.blocks(nts, row_state)
        for b in range(nblocks):
            block = next(rit)
            np.testing.assert_allclose(
                np.asarray(fused[b].iter_props.energy)[r],
                np.asarray(block.iter_props.energy), rtol=1e-12,
                err_msg=f"row {r} (gn={gn}) block {b}")
            np.testing.assert_allclose(
                np.asarray(fused[b].iter_ssf)[r],
                np.asarray(block.iter_ssf), rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(fused[b].iter_obd)[r],
                np.asarray(block.iter_obd), rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(fused[b].iter_g2)[r],
                np.asarray(block.iter_g2), rtol=1e-12)
            assert np.isclose(float(fused[b].accept_rate[r]),
                              float(block.accept_rate), rtol=1e-12)


def test_vmc_sweep_validation():
    from phd_qmclib_tpu.parallel.sweep import VmcSweep
    from phd_qmclib_tpu.samplers import vmc

    with pytest.raises(ValueError, match="at least one"):
        VmcSweep(())
    rows = (vmc.Sampling(_spec(0.5), move_spread=0.2, rng_seed=1,
                         num_walkers=16),
            vmc.Sampling(_spec(1.0), move_spread=0.2, rng_seed=1,
                         num_walkers=32))
    with pytest.raises(ValueError, match="chain count"):
        VmcSweep(rows)


def test_sweep_exec_smoke(sweep_mesh):
    """Fast-tier coverage of the fused sweep execution path (the full
    bit-exactness gates are the ``slow``-marked tests above)."""
    rows = tuple(dmc.Sampling(_spec(gn), 1e-3, 32, 16, rng_seed=3)
                 for gn in GNS)
    sweep = ParamSweep(rows, sweep_mesh)
    state = sweep.build_states(
        [_confs(s.model_spec, 16) for s in rows])
    block = next(sweep.blocks(state, 4))
    e = np.asarray(block.iter_props.energy, dtype=np.float64)
    w = np.asarray(block.iter_props.weight, dtype=np.float64)
    assert e.shape == (4, len(GNS))
    e_per_n = e[-1] / w[-1] / 8
    assert np.all(np.isfinite(e_per_n))
    # Equation of state is monotone in the coupling.
    assert np.all(np.diff(e_per_n) > 0), e_per_n
