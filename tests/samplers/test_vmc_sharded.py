"""Multi-chip VMC tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.parallel import make_walker_mesh
from phd_qmclib_tpu.samplers import vmc

NOP = 5


def make_spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=NOP,
                     supercell_size=5.0, tbf_contact_cutoff=0.3)


def test_sharded_vmc_runs_and_matches_statistics():
    assert len(jax.devices()) == 8
    mesh = make_walker_mesh()
    spec = make_spec()
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng) for _ in range(64)])

    def run(mesh_):
        s = vmc.Sampling(spec, move_spread=0.25, rng_seed=11,
                         num_walkers=64, mesh=mesh_,
                         ssf_est_spec=vmc.SSFEstSpec(num_modes=4),
                         obd_est_spec=vmc.OBDEstSpec(num_pos=3),
                         pair_corr_est_spec=vmc.PairCorrEstSpec(
                             num_bins=6))
        state = s.build_state(confs)
        it = s.blocks(256, state)
        next(it)
        b = next(it)
        return b

    b_multi = run(mesh)
    b_single = run(None)
    assert 0.0 < b_multi.accept_rate < 1.0
    # S(0) sum rule over all 64 chains regardless of sharding.
    np.testing.assert_allclose(np.asarray(b_multi.iter_ssf[:, 0, 1]),
                               64 * NOP, rtol=1e-7)
    # OBDM sums reduce over the mesh: n1(0) == num_walkers exactly.
    assert b_multi.iter_obd.shape == (256, 3)
    np.testing.assert_allclose(np.asarray(b_multi.iter_obd[:, 0]), 64.0,
                               rtol=1e-9)
    # Pair-count sum rule reduces over the mesh exactly.
    np.testing.assert_allclose(
        np.asarray(b_multi.iter_g2).sum(axis=1),
        64 * NOP * (NOP - 1) / 2, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(b_multi.iter_g2).shape,
                                  np.asarray(b_single.iter_g2).shape)
    e_m = float(np.asarray(b_multi.iter_props.energy,
                           dtype=np.float64).mean())
    e_s = float(np.asarray(b_single.iter_props.energy,
                           dtype=np.float64).mean())
    # Statistically equivalent runs.
    std = float(np.asarray(b_single.iter_props.energy).std())
    assert abs(e_m - e_s) < 5 * std / np.sqrt(256) + 0.1


def test_walkers_not_divisible_raises():
    mesh = make_walker_mesh()
    with pytest.raises(ValueError, match="divisible"):
        vmc.Sampling(make_spec(), move_spread=0.25, num_walkers=12,
                     mesh=mesh)
