"""Multi-chip DMC tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.parallel import make_walker_mesh
from phd_qmclib_tpu.samplers import dmc

V0, R, GN, NOP, SC_SIZE, RM = 10.0, 1.0, 1.0, 5, 5.0, 0.3


def make_spec():
    return mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                     interaction_strength=GN, boson_number=NOP,
                     supercell_size=SC_SIZE, tbf_contact_cutoff=RM)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect the virtual 8-CPU mesh"
    return make_walker_mesh()


def make_sampling(mesh, **kw):
    base = dict(time_step=1e-3, max_num_walkers=192,
                target_num_walkers=128, rng_seed=23, mesh=mesh,
                density_est_spec=dmc.DensityEstSpec(num_bins=10,
                                                    as_pure_est=True),
                ssf_est_spec=dmc.SSFEstSpec(num_modes=4,
                                            as_pure_est=True),
                obd_est_spec=dmc.OBDEstSpec(num_pos=3,
                                            as_pure_est=True),
                pair_corr_est_spec=dmc.PairCorrEstSpec(
                    num_bins=8, as_pure_est=True))
    base.update(kw)
    return dmc.Sampling(make_spec(), **base)


def make_confs(spec, num, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([spec.init_get_sys_conf(rng=rng) for _ in range(num)])


class TestShardedDmc:

    def test_sharded_run_physics(self, mesh):
        sampling = make_sampling(mesh)
        spec = sampling.model_spec
        state = sampling.build_state(make_confs(spec, 128))
        # Per-shard counts: 128 walkers over 8 shards.
        np.testing.assert_array_equal(np.asarray(state.num_walkers),
                                      np.full(8, 16))
        blocks = sampling.blocks(state, num_time_steps_block=32,
                                 burn_in_blocks=1)
        next(blocks)
        for _ in range(4):
            b = next(blocks)
        nw = np.asarray(b.iter_props.num_walkers, dtype=np.float64)
        assert nw.min() > 64 and nw.max() <= 192
        assert abs(nw.mean() - 128) < 24
        # Estimator sum rules hold globally.
        np.testing.assert_allclose(np.asarray(b.iter_density).sum(axis=1),
                                   NOP * nw, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(b.iter_ssf[:, 0, 1]),
                                   NOP * nw, rtol=1e-7)
        # OBDM at sz=0: ancestry-transported ones average back to the
        # global walker count under the per-block mesh psum.
        np.testing.assert_allclose(np.asarray(b.iter_obd[:, 0]), nw,
                                   rtol=1e-6)
        # Pair-count sum rule under sharding + ancestry transport.
        np.testing.assert_allclose(np.asarray(b.iter_g2).sum(axis=1),
                                   NOP * (NOP - 1) / 2 * nw, rtol=1e-7)
        # Energy per walker in the physical bracket.
        e0 = spec.obf_params.param_e0
        e_per = float(b.iter_props.accum_energy[-1]) / NOP
        assert e0 - 0.5 < e_per < e0 + 2.0

    @pytest.mark.slow
    def test_sharded_matches_single_device_statistically(self, mesh):
        # Same physics on 1 vs 8 devices: growth energies agree within
        # combined statistical error.
        spec = make_spec()
        confs = make_confs(spec, 128)

        def run(mesh_):
            sampling = dmc.Sampling(spec, time_step=1e-3,
                                    max_num_walkers=192,
                                    target_num_walkers=128, rng_seed=7,
                                    mesh=mesh_)
            state = sampling.build_state(confs)
            blocks = sampling.blocks(state, num_time_steps_block=64,
                                     burn_in_blocks=2)
            es = []
            for i, b in zip(range(8), blocks):
                if i >= 2:
                    es.append(float(b.iter_props.energy.sum())
                              / float(b.iter_props.weight.sum()))
            return np.array(es)

        e_multi = run(mesh)
        e_single = run(None)
        err = np.sqrt(e_multi.var() / len(e_multi)
                      + e_single.var() / len(e_single))
        assert abs(e_multi.mean() - e_single.mean()) < 5 * err + 0.05

    def test_sharded_state_io_roundtrip(self, mesh, tmp_path):
        from phd_qmclib_tpu.qmc_exec import io as io_mod
        from phd_qmclib_tpu.qmc_exec.data import dmc as dmc_data

        sampling = make_sampling(mesh)
        spec = sampling.model_spec
        state = sampling.build_state(make_confs(spec, 128))
        b = next(sampling.blocks(state, num_time_steps_block=8))

        handler = io_mod.DmcHDF5FileHandler(
            str(tmp_path / "sharded.h5"), group="g")
        # Save just the state (the full result path is covered in the
        # exec tests); exercise save/load of per-shard counts.
        import h5py
        with h5py.File(handler.location_path, "w") as fp:
            handler.save_state(b.last_state, fp.require_group("state"))
        with h5py.File(handler.location_path, "r") as fp:
            loaded = handler.load_state(fp.get("state"))
        np.testing.assert_array_equal(np.asarray(loaded.num_walkers),
                                      np.asarray(b.last_state.num_walkers))
        np.testing.assert_allclose(np.asarray(loaded.pos),
                                   np.asarray(b.last_state.pos))
