"""One-body density matrix estimator tests.

The reference declares the OBDM machinery but stubs it out
(``/root/reference/src/phd_qmclib/qmc_base/vmc.py:444-450`` and
``mrbp_qmc/vmc.py:238-240`` - ``init_obd_est_data`` returns ``None``),
so there is no reference behavior to mirror; these tests validate the
completed estimator against the model kernels directly (grid kernel vs
the single-offset kernel vs brute-force wavefunction ratios) and against
the exactly-solvable ideal-gas limit.
"""
import jax
import numpy as np

from tests.warn_utils import expect_opt_block_warning
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import vmc

V0, R, GN, NOP, SC_SIZE, RM = 10.0, 1.0, 1.0, 5, 5.0, 0.3


def make_spec(**kw):
    base = dict(lattice_depth=V0, lattice_ratio=R, interaction_strength=GN,
                boson_number=NOP, supercell_size=SC_SIZE,
                tbf_contact_cutoff=RM)
    base.update(kw)
    return mrbp.Spec(**base)


def batch_of_confs(spec, num, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([spec.init_get_sys_conf(rng=rng) for _ in range(num)])


def batch_of_pos(spec, num, seed=0):
    confs = batch_of_confs(spec, num, seed)
    if confs.ndim == 3:
        return confs[:, mrbp.SysConfSlot.pos, :]
    return confs


class TestGridKernel:

    @pytest.mark.slow  # re-tiered r5: grid-kernel oracle
    # duplicate (zero-offset unity + rejection-carry + proc
    # integration stay fast)
    def test_matches_single_offset_kernel(self):
        spec = make_spec()
        funcs = mrbp.core_funcs(spec)
        pos = batch_of_pos(spec, 16)
        szs = np.linspace(0.0, 0.5 * SC_SIZE, 7)
        grid = np.asarray(funcs.one_body_density_grid(
            szs, pos, spec.cfc_params))
        for j, sz in enumerate(szs):
            single = np.asarray(funcs.one_body_density(
                sz, pos, spec.cfc_params))
            np.testing.assert_allclose(grid[:, j], single, rtol=1e-10)

    @pytest.mark.slow
    def test_matches_brute_force_wf_ratios(self):
        # Full-tier: the deep oracle (N x offsets separate log_psi
        # evaluations); the fast tier keeps grid==single-offset,
        # zero-offset unity and free/ideal unity.
        # n1(sz) = (1/N) sum_i psi(..., z_i + sz, ...) / psi(z) computed
        # through log_psi directly.
        spec = make_spec()
        funcs = mrbp.core_funcs(spec)
        pos = batch_of_pos(spec, 4)
        cfc = spec.cfc_params
        szs = np.array([0.37, 1.21, 2.49])
        grid = np.asarray(funcs.one_body_density_grid(szs, pos, cfc))
        base_lp = np.asarray(funcs.log_psi(pos, cfc))
        for j, sz in enumerate(szs):
            ratios = np.zeros(pos.shape[0])
            for i in range(NOP):
                shifted = pos.copy()
                shifted[:, i] += sz
                lp = np.asarray(funcs.log_psi(shifted, cfc))
                ratios += np.exp(lp - base_lp)
            np.testing.assert_allclose(grid[:, j], ratios / NOP,
                                       rtol=1e-8)

    @pytest.mark.slow  # tier budget: unity identity duplicate
    # (the proc-integration OBDM tests stay fast)
    def test_zero_offset_is_unity(self):
        spec = make_spec()
        funcs = mrbp.core_funcs(spec)
        pos = batch_of_pos(spec, 8)
        grid = np.asarray(funcs.one_body_density_grid(
            np.array([0.0]), pos, spec.cfc_params))
        np.testing.assert_allclose(grid[:, 0], 1.0, rtol=1e-12)

    def test_free_ideal_is_unity_everywhere(self):
        spec = make_spec(lattice_depth=0.0, interaction_strength=0.0)
        funcs = mrbp.core_funcs(spec)
        pos = batch_of_pos(spec, 8)
        szs = np.linspace(0.0, 0.5 * SC_SIZE, 5)
        grid = np.asarray(funcs.one_body_density_grid(
            szs, pos, spec.cfc_params))
        np.testing.assert_allclose(grid, 1.0, rtol=1e-12)


class TestSamplerEstimator:

    def make_sampling(self, spec, num_pos=6, num_walkers=32, **kw):
        return vmc.Sampling(
            spec, move_spread=0.25, rng_seed=17,
            obd_est_spec=vmc.OBDEstSpec(num_pos=num_pos),
            num_walkers=num_walkers, **kw)

    def test_block_shapes_and_bounds(self):
        spec = make_spec()
        num_pos, nw = 6, 32
        sampling = self.make_sampling(spec, num_pos, nw)
        state = sampling.build_state(batch_of_confs(spec, nw, seed=3))
        block = next(sampling.blocks(16, state))
        obd = np.asarray(block.iter_obd)
        assert obd.shape == (16, num_pos)
        per_walker = obd / nw
        assert np.all(np.isfinite(per_walker))
        # n1(0) == 1 identically.  Instantaneous per-configuration
        # ratios may exceed 1; only the ensemble average is bounded.
        np.testing.assert_allclose(per_walker[:, 0], 1.0, rtol=1e-5)
        assert np.all(per_walker > 0.0)
        assert np.all(per_walker.mean(axis=0) <= 1.1)

    def test_carried_through_rejections(self):
        # With a huge move spread most moves reject; the carried OBDM
        # values must still match a fresh kernel evaluation of the
        # resulting chain state.
        spec = make_spec()
        sampling = self.make_sampling(spec, num_pos=4, num_walkers=16)
        big = vmc.Sampling(
            spec, move_spread=10.0, rng_seed=17,
            obd_est_spec=vmc.OBDEstSpec(num_pos=4), num_walkers=16)
        state = big.build_state(batch_of_confs(spec, 16, seed=5))
        block = next(big.blocks(8, state))
        last = block.last_state
        offsets = big.obd_pos_offsets
        fresh = np.asarray(big.core_funcs.one_body_density_grid(
            offsets, last.pos, spec.cfc_params))
        np.testing.assert_allclose(np.asarray(last.obd_parts), fresh,
                                   rtol=1e-10)

    def test_state_data_blocks_with_obd(self):
        # The configuration-recording API shares the block kernel; with
        # the OBDM spec on it must still run and carry obd state.
        spec = make_spec()
        sampling = self.make_sampling(spec, num_pos=3, num_walkers=8)
        state = sampling.build_state(batch_of_confs(spec, 8, seed=2))
        confs, block = next(sampling.state_data_blocks(8, state, thin=2))
        assert confs.shape == (4, 8, NOP)
        assert block.last_state.obd_parts.shape == (8, 3)

    @pytest.mark.slow
    def test_strong_coupling_equilibrium_bound(self):
        # Cauchy-Schwarz: n1(sz) <= 1 in equilibrium.  The ratio
        # estimator is heavy-tailed out of equilibrium (a near-contact
        # pair makes psi -> 0 and the ratio explode), so lattice-spaced
        # REGULAR starts + burn-in are required at strong coupling;
        # with them the bound must hold.
        spec = make_spec(interaction_strength=8.0, boson_number=16,
                         supercell_size=16.0, tbf_contact_cutoff=0.4)
        sampling = vmc.Sampling(
            spec, move_spread=0.25, rng_seed=41,
            obd_est_spec=vmc.OBDEstSpec(num_pos=5), num_walkers=64)
        rng = np.random.default_rng(11)
        confs = np.stack([
            spec.init_get_sys_conf(
                dist_type=mrbp.SysConfDistType.REGULAR, rng=rng)
            for _ in range(64)])
        state = sampling.build_state(confs)
        blocks = sampling.blocks(128, state)
        for _ in range(4):
            next(blocks)
        totals = np.zeros(5)
        for _ in range(4):
            totals += np.asarray(next(blocks).iter_obd,
                                 dtype=np.float64).mean(axis=0)
        n1 = totals / (4 * 64)
        assert n1[0] == pytest.approx(1.0, rel=1e-9)
        assert np.all(n1[1:] < 1.0)
        # Strong coupling depletes long-range coherence well below 1.
        assert n1[-1] < 0.9

    def test_ideal_gas_matches_analytic_integral(self):
        # Non-interacting bosons in the lattice: each particle samples
        # |f1|^2 independently, so n1(sz) = int f1(z) f1(z+sz) dz /
        # int f1(z)^2 dz (f1 has unit cell period).
        spec = make_spec(interaction_strength=0.0, boson_number=4,
                         supercell_size=4.0)
        sampling = vmc.Sampling(
            spec, move_spread=0.4, rng_seed=23,
            obd_est_spec=vmc.OBDEstSpec(num_pos=5), num_walkers=256)
        state = sampling.build_state(batch_of_confs(spec, 256, seed=7))
        blocks = sampling.blocks(128, state)
        next(blocks)  # burn-in
        totals = np.zeros(5)
        nblocks = 8
        for _ in range(nblocks):
            block = next(blocks)
            totals += np.asarray(block.iter_obd).mean(axis=0)
        measured = totals / (nblocks * 256)

        funcs = mrbp.core_funcs(spec)
        cfc = spec.cfc_params
        z = np.linspace(0.0, 1.0, 20001)[:-1]

        def f1(x):
            return np.asarray(mrbp._one_body(x, cfc))

        base = (f1(z) ** 2).mean()
        offsets = sampling.obd_pos_offsets
        exact = np.array([(f1(z) * f1(z + sz)).mean() / base
                          for sz in offsets])
        np.testing.assert_allclose(measured, exact, atol=0.02)


class TestProcIntegration:

    def test_config_roundtrip_and_exec(self, tmp_path):
        import h5py

        from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec
        from phd_qmclib_tpu.qmc_exec.data import vmc as vmc_data

        spec_config = dict(lattice_depth=V0, lattice_ratio=R,
                           interaction_strength=GN, boson_number=NOP,
                           supercell_size=SC_SIZE, tbf_contact_cutoff=RM)
        proc = vmc_exec.Proc.from_config(dict(
            model_spec=spec_config, move_spread=0.25, rng_seed=11,
            num_blocks=3, num_steps_block=16, burn_in_blocks=1,
            num_walkers=8, dtype="float64",
            ssf_spec={"num_modes": 4}, obd_spec={"num_pos": 5}))
        assert proc.obd_spec.num_pos == 5
        config = proc.as_config()
        assert config["obd_spec"] == {"num_pos": 5}
        assert vmc_exec.Proc.from_config(config) == proc

        evolved = proc.evolve({"obd_spec": {"num_pos": 9}})
        assert evolved.obd_spec.num_pos == 9

        proc_input = vmc_exec.ProcInput.from_model_sys_conf_spec(
            vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
        result = proc.exec(proc_input)
        obd_blocks = result.data.blocks.one_body_dm
        assert obd_blocks is not None
        mean = obd_blocks.mean
        assert mean.shape == (5,)
        assert mean[0] == pytest.approx(1.0, rel=1e-6)
        assert np.all(mean > 0.0)
        with expect_opt_block_warning():
            assert obd_blocks.mean_error.shape == (5,)

        # HDF5 round-trip through the blocks data model.
        path = tmp_path / "obd.h5"
        with h5py.File(path, "w") as fp:
            result.data.hdf5_export(fp.require_group("data"))
        with h5py.File(path, "r") as fp:
            loaded = vmc_data.SamplingData.from_hdf5_data(fp["data"])
        np.testing.assert_allclose(loaded.blocks.one_body_dm.totals,
                                   obd_blocks.totals)

    def test_keep_iter_data_series(self):
        from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec

        spec_config = dict(lattice_depth=V0, lattice_ratio=R,
                           interaction_strength=GN, boson_number=NOP,
                           supercell_size=SC_SIZE, tbf_contact_cutoff=RM)
        proc = vmc_exec.Proc.from_config(dict(
            model_spec=spec_config, move_spread=0.25, rng_seed=13,
            num_blocks=2, num_steps_block=8, burn_in_blocks=1,
            num_walkers=4, dtype="float64", keep_iter_data=True,
            obd_spec={"num_pos": 3}))
        result = proc.exec(vmc_exec.ProcInput.from_model_sys_conf_spec(
            vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))
        assert result.data.series.obd.shape == (2, 8, 3)
        assert result.data.blocks.one_body_dm.mean[0] == \
            pytest.approx(1.0, rel=1e-9)

    def test_merge_composes_obd(self):
        from phd_qmclib_tpu.qmc_exec.data import vmc as vmc_data

        a = vmc_data.PropsDataBlocks(
            vmc_data.EnergyBlocks(np.ones(3)),
            one_body_dm=vmc_data.OBDBlocks(np.full((3, 4), 0.5)))
        b = vmc_data.PropsDataBlocks(
            vmc_data.EnergyBlocks(np.ones(2)),
            one_body_dm=vmc_data.OBDBlocks(np.full((2, 4), 0.7)))
        merged = a.merge(b)
        assert merged.one_body_dm.totals.shape == (5, 4)
