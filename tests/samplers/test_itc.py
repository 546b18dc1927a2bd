"""Imaginary-time density-density correlation estimator F(k, tau).

Deterministic gates:

1. Lag 0 reproduces the S(k) estimator's mixed slot-0 sums
   bit-for-bit (same kernel recurrence, same masked walker sum).
2. Enabling the estimator leaves the walker dynamics bit-identical.
3. A NumPy oracle re-enacts the lag ring buffer through the exact
   branching parents (reconstructed from the sampler's own key
   stream) and matches every emitted sum.
4. The initial fill is discounted: lag ``l`` contributes no counts
   until ``l`` measured steps have passed.
5. The k = 0 column obeys the exact sum rule ``N^2 * counts`` —
   under the 8-device mesh too (ancestry transport + per-block psum).
6. The ring buffer survives an HDF5 state round trip and a
   mid-stream save/restore resumes the series bit-exactly.
"""
import h5py
import jax
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.parallel import make_walker_mesh
from phd_qmclib_tpu.samplers import dmc

NOP = 8
SC = 8.0
MODES = 6
LAGS = 5


def make_spec():
    return mrbp.Spec(lattice_depth=5.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)


def make_sampling(spec, itc=True, **kw):
    base = dict(time_step=2e-3, max_num_walkers=96,
                target_num_walkers=80, rng_seed=7,
                ssf_est_spec=dmc.SSFEstSpec(num_modes=MODES,
                                            as_pure_est=False))
    if itc:
        base["itc_est_spec"] = dmc.ITCEstSpec(num_modes=MODES,
                                              num_lags=LAGS)
    base.update(kw)
    return dmc.Sampling(spec, **base)


def make_confs(spec, num, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([spec.init_get_sys_conf(rng=rng)
                     for _ in range(num)])


def _rho_reim(pos):
    """(W, MODES, 2) oracle amplitudes for the harmonic momenta."""
    kz = np.arange(MODES) * 2 * np.pi / SC
    phase = pos[:, :, None] * kz  # (W, N, M)
    return np.stack([np.cos(phase).sum(axis=1),
                     np.sin(phase).sum(axis=1)], axis=-1)


class TestItcInvariants:

    def test_lag0_matches_ssf_slot0_bitexact(self):
        spec = make_spec()
        sampling = make_sampling(spec)
        state = sampling.build_state(make_confs(spec, 80))
        blocks = sampling.blocks(state, num_time_steps_block=12,
                                 burn_in_blocks=1)
        next(blocks)
        b = next(blocks)
        np.testing.assert_array_equal(
            np.asarray(b.iter_itc)[:, 0, :],
            np.asarray(b.iter_ssf)[:, :, 0])

    def test_dynamics_bit_identical_with_estimator_on(self):
        spec = make_spec()
        confs = make_confs(spec, 80)
        finals = []
        for itc in (True, False):
            sampling = make_sampling(spec, itc=itc)
            state = sampling.build_state(confs)
            blocks = sampling.blocks(state, num_time_steps_block=12,
                                     burn_in_blocks=1)
            next(blocks)
            b = next(blocks)
            finals.append(b)
        np.testing.assert_array_equal(
            np.asarray(finals[0].last_state.pos),
            np.asarray(finals[1].last_state.pos))
        np.testing.assert_array_equal(
            np.asarray(finals[0].iter_props.energy),
            np.asarray(finals[1].iter_props.energy))

    def test_initial_fill_is_discounted(self):
        spec = make_spec()
        sampling = make_sampling(spec)
        state = sampling.build_state(make_confs(spec, 80))
        blocks = sampling.blocks(state, num_time_steps_block=12)
        b = next(blocks)
        nw = np.asarray(b.iter_itc_nw)
        itc = np.asarray(b.iter_itc)
        # Step t (0-based) has exactly min(t, LAGS) filled lag rows.
        filled = (nw[:, 1:] > 0).sum(axis=1)
        np.testing.assert_array_equal(
            filled, np.minimum(np.arange(12), LAGS))
        # Unfilled rows carry zero sums (fresh-buffer zero fill).
        assert np.all(itc[:, 1:, :][nw[:, 1:] == 0] == 0.0)
        assert int(b.last_state.itc_filled) == LAGS

    def test_k0_sum_rule(self):
        spec = make_spec()
        sampling = make_sampling(spec)
        state = sampling.build_state(make_confs(spec, 80))
        blocks = sampling.blocks(state, num_time_steps_block=12,
                                 burn_in_blocks=1)
        next(blocks)
        b = next(blocks)
        itc = np.asarray(b.iter_itc)
        nw = np.asarray(b.iter_itc_nw)
        np.testing.assert_allclose(itc[:, :, 0], NOP ** 2 * nw,
                                   rtol=1e-12)

    def test_mult_equals_equivalent_global_cadence(self):
        """``(est_every=1, itc mult=2)`` measures the SAME trajectory
        at the same steps as ``(est_every=2, mult=1)`` — the emitted
        ITC series must be bit-identical (dynamics are cadence-
        independent by construction), while the buffer stays the same
        size and the lag unit doubles."""
        spec = make_spec()
        rows = []
        for ee, mult in ((1, 2), (2, 1)):
            sampling = make_sampling(
                spec, est_every=ee,
                itc_est_spec=dmc.ITCEstSpec(num_modes=MODES,
                                            num_lags=LAGS,
                                            est_every_mult=mult))
            state = sampling.build_state(make_confs(spec, 80))
            blocks = sampling.blocks(state, num_time_steps_block=12,
                                     burn_in_blocks=1)
            next(blocks)
            rows.append((next(blocks), sampling))
        (b1, s1), (b2, s2) = rows
        np.testing.assert_array_equal(np.asarray(b1.iter_itc),
                                      np.asarray(b2.iter_itc))
        np.testing.assert_array_equal(np.asarray(b1.iter_itc_nw),
                                      np.asarray(b2.iter_itc_nw))
        np.testing.assert_allclose(s1.itc_lag_times, s2.itc_lag_times)
        np.testing.assert_array_equal(
            np.asarray(b1.last_state.pos),
            np.asarray(b2.last_state.pos))

    def test_cadence_lag_unit_and_shapes(self):
        spec = make_spec()
        sampling = make_sampling(spec, est_every=2)
        state = sampling.build_state(make_confs(spec, 80))
        blocks = sampling.blocks(state, num_time_steps_block=12)
        b = next(blocks)
        assert np.asarray(b.iter_itc).shape == (6, LAGS + 1, MODES)
        assert np.asarray(b.iter_itc_nw).shape == (6, LAGS + 1)
        np.testing.assert_allclose(
            sampling.itc_lag_times,
            np.arange(LAGS + 1) * 2 * sampling.time_step)
        # Cadence leaves the dynamics bit-identical.
        ref = make_sampling(spec, est_every=1)
        rstate = ref.build_state(make_confs(spec, 80))
        rb = next(ref.blocks(rstate, num_time_steps_block=12))
        np.testing.assert_array_equal(np.asarray(b.last_state.pos),
                                      np.asarray(rb.last_state.pos))


class TestItcOracle:

    def test_ring_buffer_transport_matches_numpy_oracle(self):
        """Re-enact the lag transport from the sampler's own key
        stream: reconstruct each step's branching parents with
        ``branching_comb`` (deterministic given the uniforms' key),
        maintain the ring buffer in NumPy, and match every emitted
        lag sum."""
        spec = make_spec()
        sampling = make_sampling(spec)
        state = sampling.build_state(make_confs(spec, 80))
        max_w = sampling.max_num_walkers

        # Drive the sampler one step per block so every intermediate
        # ensemble is observable.
        blocks = sampling.blocks(state, num_time_steps_block=1)
        base_key = jax.random.PRNGKey(sampling.rng_seed)

        buf = np.zeros((max_w, LAGS, MODES, 2))
        filled = 0
        prev = state
        for t in range(3 * LAGS):
            b = next(blocks)
            block_key = jax.random.fold_in(base_key, t)
            step_key = jax.random.split(block_key, 1)[0]
            k_comb, _ = jax.random.split(step_key)
            parent, nw = dmc.branching_comb(
                np.asarray(prev.weights), prev.num_walkers, k_comb)
            parent = np.asarray(parent)
            nw = int(nw)
            cpos = np.asarray(prev.pos)[parent]
            valid = np.arange(max_w) < nw

            reim = _rho_reim(cpos)
            buf = buf[parent]
            lag0 = ((reim ** 2).sum(axis=-1) * valid[:, None]).sum(axis=0)
            lag_sums = np.einsum("wlkc,wkc,w->lk", buf, reim,
                                 valid.astype(float))
            counts = np.concatenate(
                [[float(nw)],
                 float(nw) * (np.arange(1, LAGS + 1) <= filled)])

            itc = np.asarray(b.iter_itc)[0]
            np.testing.assert_allclose(itc[0], lag0, rtol=1e-10)
            np.testing.assert_allclose(itc[1:], lag_sums, rtol=1e-10,
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(b.iter_itc_nw)[0],
                                       counts)

            buf = np.concatenate([reim[:, None], buf[:, :-1]], axis=1)
            filled = min(filled + 1, LAGS)
            prev = b.last_state


class TestItcSharded:

    def test_sharded_sum_rule_and_counts(self):
        assert len(jax.devices()) == 8
        mesh = make_walker_mesh()
        spec = make_spec()
        sampling = make_sampling(spec, mesh=mesh, max_num_walkers=192,
                                 target_num_walkers=128)
        state = sampling.build_state(make_confs(spec, 128))
        blocks = sampling.blocks(state, num_time_steps_block=8,
                                 burn_in_blocks=1)
        next(blocks)
        b = next(blocks)
        itc = np.asarray(b.iter_itc)
        nw_lag = np.asarray(b.iter_itc_nw)
        nw = np.asarray(b.iter_props.num_walkers, dtype=np.float64)
        # Global counts: every filled lag row counts the global
        # population (per-shard sums psum'd once per block).
        np.testing.assert_allclose(nw_lag[:, 0], nw)
        np.testing.assert_allclose(itc[:, :, 0], NOP ** 2 * nw_lag,
                                   rtol=1e-12)

    def test_sharded_dynamics_bit_identical_with_estimator_on(self):
        # The estimator must not perturb the sharded walker dynamics
        # either (same invariant as the single-device test, on the
        # shard_map + psum path).
        mesh = make_walker_mesh()
        spec = make_spec()
        finals = []
        for itc in (True, False):
            sampling = make_sampling(spec, itc=itc, mesh=mesh,
                                     max_num_walkers=192,
                                     target_num_walkers=128)
            state = sampling.build_state(make_confs(spec, 128))
            blocks = sampling.blocks(state, num_time_steps_block=8,
                                     burn_in_blocks=1)
            next(blocks)
            finals.append(next(blocks))
        np.testing.assert_array_equal(
            np.asarray(finals[0].last_state.pos),
            np.asarray(finals[1].last_state.pos))
        np.testing.assert_array_equal(
            np.asarray(finals[0].iter_props.energy),
            np.asarray(finals[1].iter_props.energy))


class TestItcPure:
    """Forward-walked (pure) ITC: the per-walker lag products
    accumulate into an ancestry-transported aux array and are sampled
    at the forward-walking window end — the same discipline as the
    other pure estimators (round-5 addition; the mixed estimator
    remains the default)."""

    def _pure_sampling(self, spec, **kw):
        base = dict(itc_est_spec=dmc.ITCEstSpec(
            num_modes=MODES, num_lags=LAGS, as_pure_est=True))
        base.update(kw)
        return make_sampling(spec, **base)

    def test_pure_dynamics_bit_identical_to_mixed(self):
        spec = make_spec()
        finals = []
        for pure in (True, False):
            sampling = make_sampling(
                spec, itc_est_spec=dmc.ITCEstSpec(
                    num_modes=MODES, num_lags=LAGS, as_pure_est=pure))
            state = sampling.build_state(make_confs(spec, 80))
            blocks = sampling.blocks(state, num_time_steps_block=12,
                                     burn_in_blocks=1)
            next(blocks)
            finals.append(next(blocks))
        np.testing.assert_array_equal(
            np.asarray(finals[0].last_state.pos),
            np.asarray(finals[1].last_state.pos))
        np.testing.assert_array_equal(
            np.asarray(finals[0].iter_props.energy),
            np.asarray(finals[1].iter_props.energy))

    def test_pure_k0_sum_rule_and_first_step_equals_mixed(self):
        """k = 0: every contribution adds exactly N^2, so the pure
        sums obey ``N^2 x counts`` at every lag; and the FIRST
        measured step of a window holds a single contribution, which
        must equal the mixed estimator's sums bit-for-bit."""
        spec = make_spec()
        rows = []
        for pure in (True, False):
            sampling = make_sampling(
                spec, itc_est_spec=dmc.ITCEstSpec(
                    num_modes=MODES, num_lags=LAGS, as_pure_est=pure))
            state = sampling.build_state(make_confs(spec, 80))
            blocks = sampling.blocks(state, num_time_steps_block=12,
                                     burn_in_blocks=1)
            next(blocks)
            rows.append(next(blocks))
        bp, bm = rows
        itc = np.asarray(bp.iter_itc)
        nw = np.asarray(bp.iter_itc_nw)
        np.testing.assert_allclose(itc[:, :, 0], NOP ** 2 * nw,
                                   rtol=1e-12)
        np.testing.assert_allclose(itc[0], np.asarray(bm.iter_itc)[0],
                                   rtol=1e-12)
        np.testing.assert_allclose(nw[0],
                                   np.asarray(bm.iter_itc_nw)[0])

    def test_pure_lag0_matches_pure_ssf_bitexact(self):
        """Lag 0 of the pure ITC is the SAME per-walker quantity as
        the pure S(k) slot-0 numerator, accumulated on the same steps
        and transported through the same composed permutations — the
        window samples must agree bit-for-bit.  This certifies the
        transported-aux machinery against the established pure-SSF
        path."""
        spec = make_spec()
        sampling = make_sampling(
            spec,
            ssf_est_spec=dmc.SSFEstSpec(num_modes=MODES,
                                        as_pure_est=True),
            itc_est_spec=dmc.ITCEstSpec(num_modes=MODES,
                                        num_lags=LAGS,
                                        as_pure_est=True))
        state = sampling.build_state(make_confs(spec, 80))
        blocks = sampling.blocks(state, num_time_steps_block=12,
                                 burn_in_blocks=1)
        next(blocks)
        b = next(blocks)
        np.testing.assert_array_equal(
            np.asarray(b.iter_itc)[:, 0, :],
            np.asarray(b.iter_ssf)[:, :, 0])

    @pytest.mark.slow  # tier budget: the mult cond path is also
    # exercised by the config fuzz corpus (pure draws)
    def test_pure_mult_cadence_sum_rule(self):
        spec = make_spec()
        sampling = make_sampling(
            spec, itc_est_spec=dmc.ITCEstSpec(
                num_modes=MODES, num_lags=LAGS, est_every_mult=2,
                as_pure_est=True))
        state = sampling.build_state(make_confs(spec, 80))
        blocks = sampling.blocks(state, num_time_steps_block=12,
                                 burn_in_blocks=1)
        next(blocks)
        b = next(blocks)
        itc = np.asarray(b.iter_itc)
        nw = np.asarray(b.iter_itc_nw)
        assert itc.shape == (6, LAGS + 1, MODES)
        np.testing.assert_allclose(itc[:, :, 0], NOP ** 2 * nw,
                                   rtol=1e-12)

    def test_pure_sharded_sum_rule(self):
        mesh = make_walker_mesh()
        spec = make_spec()
        sampling = make_sampling(
            spec, mesh=mesh, max_num_walkers=192,
            target_num_walkers=128,
            itc_est_spec=dmc.ITCEstSpec(num_modes=MODES,
                                        num_lags=LAGS,
                                        as_pure_est=True))
        state = sampling.build_state(make_confs(spec, 128))
        blocks = sampling.blocks(state, num_time_steps_block=8,
                                 burn_in_blocks=1)
        next(blocks)
        b = next(blocks)
        itc = np.asarray(b.iter_itc)
        nw = np.asarray(b.iter_itc_nw)
        np.testing.assert_allclose(itc[:, :, 0], NOP ** 2 * nw,
                                   rtol=1e-12)
        # Fully-filled lags: sum_w cnt/divisor telescopes to the
        # global population of the measured step.
        np.testing.assert_allclose(
            nw[:, 0], np.asarray(b.iter_props.num_walkers,
                                 dtype=np.float64))

    def test_pure_aux_transport_matches_numpy_oracle(self):
        """Re-enact the forward-walking transport in NumPy across a
        multi-block window (nts = 1, pfw = 4 -> 4-block windows):
        reconstruct each step's branching parents from the sampler's
        own key stream, carry buffer AND aux arrays by the parent
        gathers, and match every emitted pure sum/count."""
        spec = make_spec()
        pfw = 4
        sampling = make_sampling(
            spec, itc_est_spec=dmc.ITCEstSpec(
                num_modes=MODES, num_lags=LAGS, as_pure_est=True,
                pfw_num_time_steps=pfw))
        state = sampling.build_state(make_confs(spec, 80))
        max_w = sampling.max_num_walkers
        assert sampling.pfw_window_blocks(1) == pfw

        blocks = sampling.blocks(state, num_time_steps_block=1)
        base_key = jax.random.PRNGKey(sampling.rng_seed)

        buf = np.zeros((max_w, LAGS, MODES, 2))
        aux = np.zeros((max_w, LAGS + 1, MODES))
        aux_cnt = np.zeros((max_w, LAGS + 1))
        filled = 0
        prev = state
        for t in range(3 * pfw):
            win_pos = t % pfw
            if win_pos == 0:
                aux = np.zeros_like(aux)
                aux_cnt = np.zeros_like(aux_cnt)
            b = next(blocks)
            block_key = jax.random.fold_in(base_key, t)
            step_key = jax.random.split(block_key, 1)[0]
            k_comb, _ = jax.random.split(step_key)
            parent, nw = dmc.branching_comb(
                np.asarray(prev.weights), prev.num_walkers, k_comb)
            parent = np.asarray(parent)
            nw = int(nw)
            cpos = np.asarray(prev.pos)[parent]
            valid = np.arange(max_w) < nw

            reim = _rho_reim(cpos)
            buf = buf[parent]
            sq = (reim ** 2).sum(axis=-1)
            prod = np.einsum("wlkc,wkc->wlk", buf, reim) \
                * valid[:, None, None]
            contrib = np.concatenate(
                [np.where(valid[:, None], sq, 0.0)[:, None], prod],
                axis=1)
            lag_ok = (np.arange(1, LAGS + 1) <= filled).astype(float)
            cnt_row = np.concatenate([[1.0], lag_ok])
            aux = aux[parent] + contrib
            aux_cnt = aux_cnt[parent] \
                + valid[:, None].astype(float) * cnt_row[None]
            divisor = win_pos + 1
            est = (aux * valid[:, None, None]).sum(axis=0) / divisor
            est_cnt = (aux_cnt * valid[:, None]).sum(axis=0) / divisor

            np.testing.assert_allclose(np.asarray(b.iter_itc)[0],
                                       est, rtol=1e-10, atol=1e-8)
            np.testing.assert_allclose(np.asarray(b.iter_itc_nw)[0],
                                       est_cnt, rtol=1e-10)

            buf = np.concatenate([reim[:, None], buf[:, :-1]], axis=1)
            filled = min(filled + 1, LAGS)
            prev = b.last_state


@pytest.mark.slow
@pytest.mark.parametrize("pure", [False, True],
                         ids=["mixed", "pure"])
def test_free_gas_decay_matches_exact_propagator(pure):
    """Exact physics gate: for the free ideal gas the trial
    wavefunction is constant, the DMC dynamics is the exact
    imaginary-time propagator (no drift, no branching, no Trotter
    error for this gauge), and ``rho_k |0>`` is an exact eigenstate —
    so ``F(k, tau)/F(k, 0) = exp(-k^2 tau)`` exactly (units
    ``hbar^2/2m = 1``; the diffusion constant is 1 by construction,
    ``sigma^2 = 2 dt``).  The trial function is exact here, so the
    pure (forward-walked) estimator must reproduce the same exact
    decay — gating that the descendant weighting does not corrupt the
    physics."""
    spec = mrbp.Spec(lattice_depth=1e-6, lattice_ratio=1.0,
                     interaction_strength=0.0, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3)
    num_lags = 8
    sampling = dmc.Sampling(
        spec, time_step=5e-3, max_num_walkers=640,
        target_num_walkers=512, rng_seed=13, est_every=4,
        itc_est_spec=dmc.ITCEstSpec(num_modes=4, num_lags=num_lags,
                                    as_pure_est=pure))
    state = sampling.build_state(make_confs(spec, 512, seed=2))
    blocks = sampling.blocks(state, num_time_steps_block=64,
                             burn_in_blocks=2)
    next(blocks), next(blocks)
    sums = np.zeros((num_lags + 1, 4))
    counts = np.zeros(num_lags + 1)
    for _ in range(6):
        b = next(blocks)
        if pure:
            # One window sample per block: the end-of-window value
            # (interior steps hold partial, under-projected
            # accumulations — cf. the Proc data layer).
            sums += np.asarray(b.iter_itc, dtype=np.float64)[-1]
            counts += np.asarray(b.iter_itc_nw,
                                 dtype=np.float64)[-1]
        else:
            sums += np.asarray(b.iter_itc,
                               dtype=np.float64).sum(axis=0)
            counts += np.asarray(b.iter_itc_nw,
                                 dtype=np.float64).sum(axis=0)
    f = sums / counts[:, None]
    f_norm = f / f[0]
    tau = np.asarray(sampling.itc_lag_times)
    kz = np.asarray(sampling.itc_momenta)
    exact = np.exp(-kz[None, :] ** 2 * tau[:, None])
    # k = 0 is exactly 1; finite k within a few percent of the exact
    # single-mode decay (pure statistics - no systematic error here).
    np.testing.assert_allclose(f_norm[:, 0], 1.0, rtol=1e-10)
    np.testing.assert_allclose(f_norm[:, 1:], exact[:, 1:], atol=0.04)


@pytest.mark.slow
def test_tonks_girardeau_decay_matches_free_fermions():
    """Interacting-physics gate: at the TG point density correlations
    map to free fermions exactly, so
    ``F(k, tau) = (1/N) sum_{q in FS, q+k not in FS}
    exp(-(eps_{q+k} - eps_q) tau)`` with ``eps_q = q^2``.  For N = 3
    on L = 3 the k1 channel is a SINGLE exponential
    (``omega = 4 pi^2 / 3``) and k2 a two-channel sum — a spectrum
    test the equal-time S(k) cannot see."""
    N, L = 3, 3.0
    gn = 1e4
    spec = mrbp.Spec(lattice_depth=0.0, lattice_ratio=1.0,
                     interaction_strength=gn, boson_number=N,
                     supercell_size=L, tbf_contact_cutoff=1.2)
    num_lags = 6
    sampling = dmc.Sampling(
        spec, time_step=5e-5, max_num_walkers=320,
        target_num_walkers=256, rng_seed=6, est_every=64,
        itc_est_spec=dmc.ITCEstSpec(num_modes=3, num_lags=num_lags))
    rng = np.random.default_rng(1)
    confs = np.stack([
        spec.init_get_sys_conf(dist_type=mrbp.DIST_REGULAR,
                               offset=rng.uniform(0, L))
        for _ in range(256)])
    state = sampling.build_state(confs)
    blocks = sampling.blocks(state, num_time_steps_block=256,
                             burn_in_blocks=3)
    for _ in range(3):
        next(blocks)
    sums = np.zeros((num_lags + 1, 3))
    counts = np.zeros(num_lags + 1)
    for _ in range(14):
        b = next(blocks)
        sums += np.asarray(b.iter_itc, dtype=np.float64).sum(axis=0)
        counts += np.asarray(b.iter_itc_nw,
                             dtype=np.float64).sum(axis=0)
    f = sums / counts[:, None] / N
    tau = np.asarray(sampling.itc_lag_times)

    # Exact free-fermion particle-hole sums (FS = {-2pi/3, 0, 2pi/3}).
    q = 2 * np.pi / L * np.arange(-(N // 2), N // 2 + 1)
    kz = np.asarray(sampling.itc_momenta)
    fs = set(np.round(q, 12))
    exact = np.zeros((num_lags + 1, 3))
    for j, k in enumerate(kz):
        for qi in q:
            if j and round(qi + k, 12) not in fs:
                exact[:, j] += np.exp(-((qi + k) ** 2 - qi ** 2)
                                      * tau) / N
    exact[:, 0] = N  # rho_0 = N: F(0, tau) = N per particle... x N
    np.testing.assert_allclose(f[:, 0], float(N), rtol=1e-9)
    # S(k) values at tau = 0: 1/3 and 2/3 exactly.
    np.testing.assert_allclose(f[0, 1:], exact[0, 1:], atol=0.02)
    # The imaginary-time decay of both channels.
    np.testing.assert_allclose(f[:, 1:], exact[:, 1:], atol=0.035)


def test_continuation_with_burn_restarts_the_fill():
    """A continuation run (loaded state with a FILLED ring buffer)
    that includes burn-in blocks must restart the lag fill: burn
    blocks neither transport nor shift the buffer, so the stale
    amplitudes are slot-misaligned after the burn and correlating
    against them — with the saturated fill counter vouching for them —
    would silently bias F(k, tau > 0)."""
    spec = make_spec()
    sampling = make_sampling(spec)
    state = sampling.build_state(make_confs(spec, 80))
    blocks = sampling.blocks(state, num_time_steps_block=12)
    for _ in range(2):
        carried = next(blocks).last_state
    assert int(carried.itc_filled) == LAGS  # saturated fill

    # Continuation with one burn block from the carried state.
    cont = sampling.blocks(carried, num_time_steps_block=12,
                           burn_in_blocks=1, block_offset=2)
    burn_block = next(cont)
    assert burn_block.iter_itc is None
    first = next(cont)
    nw = np.asarray(first.iter_itc_nw)
    # The fill restarted: step t of the first measured block has
    # exactly min(t, LAGS) contributing lag rows, not LAGS.
    np.testing.assert_array_equal(
        (nw[:, 1:] > 0).sum(axis=1),
        np.minimum(np.arange(12), LAGS))
    # And the emitted sums equal a run whose buffer was explicitly
    # zeroed before the same continuation (the trusted semantics).
    zeroed = carried._replace(
        itc_buf=np.zeros_like(np.asarray(carried.itc_buf)),
        itc_filled=np.int32(0))
    ref = sampling.blocks(zeroed, num_time_steps_block=12,
                          burn_in_blocks=1, block_offset=2)
    next(ref)
    ref_first = next(ref)
    np.testing.assert_array_equal(np.asarray(first.iter_itc),
                                  np.asarray(ref_first.iter_itc))


class TestItcStateIO:

    def test_state_roundtrip_and_bitexact_resume(self, tmp_path):
        from phd_qmclib_tpu.qmc_exec.io import DmcHDF5FileHandler

        spec = make_spec()
        sampling = make_sampling(spec)
        state = sampling.build_state(make_confs(spec, 80))

        # Uninterrupted: 4 blocks.
        blocks = sampling.blocks(state, num_time_steps_block=6)
        ref_blocks = [next(blocks) for _ in range(4)]

        # Interrupted: run 2 blocks, round-trip the state through
        # HDF5, resume with the continuing block counter.
        blocks = sampling.blocks(state, num_time_steps_block=6)
        for _ in range(2):
            b = next(blocks)
        handler = DmcHDF5FileHandler(
            location=str(tmp_path / "state.h5"), group="g")
        with h5py.File(handler.location, "w") as f:
            handler.save_state(b.last_state, f.create_group("state"))
        with h5py.File(handler.location, "r") as f:
            loaded = handler.load_state(f["state"])
        np.testing.assert_array_equal(
            np.asarray(loaded.itc_buf),
            np.asarray(b.last_state.itc_buf))
        assert int(loaded.itc_filled) == int(b.last_state.itc_filled)

        resumed = sampling.blocks(loaded, num_time_steps_block=6,
                                  start_block_idx=2)
        for i in (2, 3):
            rb = next(resumed)
            np.testing.assert_array_equal(
                np.asarray(rb.iter_itc),
                np.asarray(ref_blocks[i].iter_itc))
            np.testing.assert_array_equal(
                np.asarray(rb.iter_itc_nw),
                np.asarray(ref_blocks[i].iter_itc_nw))
