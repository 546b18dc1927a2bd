"""Configurable pure-estimator forward-walking window (VERDICT r2 #4).

The reference silently pins the window to one block
(``mrbp_qmc/dmc_exec/proc.py:274, 337``); here
``pfw_num_time_steps <= num_time_steps_block`` is honored end to end.
The window only gates estimator *accumulation* (frozen values keep
being transported through the branching ancestry), so the walker
dynamics must be bit-identical across window choices, and the measured
series must agree exactly on the pre-freeze steps.
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.samplers import dmc


@pytest.fixture(scope="module")
def model_spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=6,
                     supercell_size=6.0, tbf_contact_cutoff=0.25)


def _run(model_spec, pfw, nts=32, nblocks=2):
    sampling = dmc.Sampling(
        model_spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, rng_seed=17,
        density_est_spec=dmc.DensityEstSpec(num_bins=8, as_pure_est=True,
                                            pfw_num_time_steps=pfw),
        ssf_est_spec=dmc.SSFEstSpec(num_modes=3, as_pure_est=True,
                                    pfw_num_time_steps=pfw))
    rng = np.random.default_rng(2)
    confs = np.stack([model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(32)])
    state = sampling.build_state(confs)
    out = []
    it = sampling.blocks(state, num_time_steps_block=nts)
    for _ in range(nblocks):
        out.append(next(it))
    return out


def test_window_gates_accumulation_not_dynamics(model_spec):
    nts, pfw_short = 32, 8
    full = _run(model_spec, pfw=None, nts=nts)
    short = _run(model_spec, pfw=pfw_short, nts=nts)

    for bf, bs in zip(full, short):
        # Dynamics identical to the bit: same walkers, same energies.
        np.testing.assert_array_equal(
            np.asarray(bf.iter_props.energy),
            np.asarray(bs.iter_props.energy))
        np.testing.assert_array_equal(
            np.asarray(bf.last_state.pos), np.asarray(bs.last_state.pos))

    # Pre-freeze steps agree exactly; the density series diverges after
    # the short window freezes (values frozen, ancestry keeps moving).
    df = np.asarray(full[0].iter_density)
    ds = np.asarray(short[0].iter_density)
    np.testing.assert_array_equal(df[:pfw_short], ds[:pfw_short])
    assert not np.array_equal(df[-1], ds[-1])

    sf = np.asarray(full[0].iter_ssf)
    ss = np.asarray(short[0].iter_ssf)
    np.testing.assert_array_equal(sf[:pfw_short], ss[:pfw_short])

    # Both normalize to a sensible density: integral ~= N * num_walkers.
    nw = np.asarray(short[0].iter_props.num_walkers)
    bin_w = 6.0 / 8
    for d, n in ((ds[-1], nw[-1]), (df[-1], nw[-1])):
        assert d.sum() / n == pytest.approx(6.0, rel=0.05)


def test_proc_honors_and_roundtrips_pfw(model_spec):
    proc = dmc_exec.Proc(
        model_spec=model_spec, time_step=1e-3, max_num_walkers=48,
        target_num_walkers=32, num_blocks=2, num_time_steps_block=16,
        burn_in_blocks=0, rng_seed=3, dtype="float64",
        ssf_spec=dmc_exec.SSFEstSpec(num_modes=3, as_pure_est=True,
                                     pfw_num_time_steps=8))
    # The sampler sees the configured window, not a pinned block.
    assert proc.sampling.ssf_est_spec.pfw_num_time_steps == 8
    config = proc.as_config()
    assert config["ssf_spec"]["pfw_num_time_steps"] == 8
    proc2 = dmc_exec.Proc.from_config(config)
    assert proc2 == proc

    result = proc.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc))
    ssf = result.data.blocks.ss_factor
    assert np.all(np.isfinite(ssf.mean))


def test_pfw_validation(model_spec):
    kwargs = dict(model_spec=model_spec, time_step=1e-3,
                  max_num_walkers=48, target_num_walkers=32,
                  num_blocks=2, num_time_steps_block=16)
    with pytest.raises(ValueError, match="pure"):
        dmc_exec.Proc(**kwargs, ssf_spec=dmc_exec.SSFEstSpec(
            num_modes=3, as_pure_est=False, pfw_num_time_steps=8))
    # A window larger than the block CLAMPS with a warning instead of
    # erroring: the reference silently pins the window to one block and
    # its own committed configs carry such values
    # (tests/qmc_exec/test_reference_configs.py runs one).
    with pytest.warns(UserWarning, match="clamping to one block"):
        proc = dmc_exec.Proc(**kwargs, ssf_spec=dmc_exec.SSFEstSpec(
            num_modes=3, pfw_num_time_steps=32))
    assert proc.ssf_spec.pfw_num_time_steps == 16
    with pytest.raises(ValueError, match="est_every"):
        dmc_exec.Proc(**kwargs, est_every=4,
                      ssf_spec=dmc_exec.SSFEstSpec(
                          num_modes=3, pfw_num_time_steps=6))
