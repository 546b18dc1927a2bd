"""DMC one-body density matrix estimator tests.

Beyond the reference: it stubs the OBDM machinery in VMC
(``/root/reference/src/phd_qmclib/qmc_base/vmc.py:444-450``) and has no
DMC analog at all.  Validation strategy mirrors the other DMC
estimators: exactness in the ideal-gas limit (where the trial orbital is
the exact ground state, so mixed == pure == the analytic integral) plus
transport/shape/config checks.
"""
import numpy as np

from tests.warn_utils import expect_opt_block_warning
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc


def make_spec(**kw):
    base = dict(lattice_depth=10.0, lattice_ratio=1.0,
                interaction_strength=1.0, boson_number=5,
                supercell_size=5.0, tbf_contact_cutoff=0.3)
    base.update(kw)
    return mrbp.Spec(**base)


def build_sampling(spec, num_pos=4, pure=True, target=64, max_w=96,
                   seed=19, **kw):
    return dmc.Sampling(
        spec, time_step=1e-3, max_num_walkers=max_w,
        target_num_walkers=target, rng_seed=seed,
        obd_est_spec=dmc.OBDEstSpec(num_pos=num_pos, as_pure_est=pure),
        **kw)


def initial_state(sampling, spec, seed=0):
    rng = np.random.default_rng(seed)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(sampling.target_num_walkers)])
    return sampling.build_state(confs)


@pytest.mark.parametrize("pure", [False, True])
def test_block_shapes_and_normalization(pure):
    spec = make_spec()
    sampling = build_sampling(spec, num_pos=4, pure=pure)
    state = initial_state(sampling, spec)
    block = next(sampling.blocks(state, num_time_steps_block=16))
    obd = np.asarray(block.iter_obd, dtype=np.float64)
    assert obd.shape == (16, 4)
    assert np.all(np.isfinite(obd))
    # n1(0) == 1 per walker: the walker-summed (pure: window-averaged)
    # value equals the walker count at every step.
    nw = np.asarray(block.iter_props.num_walkers, dtype=np.float64)
    if pure:
        # Ancestry sums of ones divided by min(step+1, pfw): exactly nw.
        np.testing.assert_allclose(obd[:, 0], nw, rtol=1e-6)
    else:
        np.testing.assert_allclose(obd[:, 0], nw, rtol=1e-6)
    assert np.all(obd > 0.0)


@pytest.mark.slow
def test_ideal_gas_pure_equals_mixed_equals_analytic():
    # Ideal gas: f1 is the exact ground state, so the mixed and the
    # pure (forward-walking) estimators must both equal the analytic
    # integral n1(sz) = int f1(z) f1(z+sz) dz / int f1^2 dz.
    N, L, M = 4, 4.0, 5
    spec = make_spec(interaction_strength=0.0, boson_number=N,
                     supercell_size=L, tbf_contact_cutoff=0.4)

    def run(pure):
        sampling = build_sampling(spec, num_pos=M, pure=pure,
                                  target=512, max_w=640, seed=29)
        state = initial_state(sampling, spec, seed=1)
        blocks = sampling.blocks(state, num_time_steps_block=64,
                                 burn_in_blocks=6)
        for _ in range(6):
            next(blocks)
        total = np.zeros(M)
        norm = 0.0
        for _ in range(10):
            b = next(blocks)
            obd = np.asarray(b.iter_obd, dtype=np.float64)
            nw = np.asarray(b.iter_props.num_walkers, dtype=np.float64)
            if pure:
                # Only the end-of-block value is a fully-projected
                # sample (window == block).
                total += obd[-1]
                norm += nw[-1]
            else:
                total += obd.sum(axis=0)
                norm += nw.sum()
        return total / norm

    z = np.linspace(0.0, 1.0, 20001)[:-1]
    f1 = np.asarray(mrbp._one_body(z, spec.cfc_params))
    base = (f1 ** 2).mean()
    offsets = np.linspace(0.0, 0.5 * L, M)
    exact = np.array([
        (f1 * np.asarray(mrbp._one_body(z + sz, spec.cfc_params))).mean()
        / base for sz in offsets])

    mixed = run(pure=False)
    pure_est = run(pure=True)
    np.testing.assert_allclose(mixed, exact, atol=0.02)
    np.testing.assert_allclose(pure_est, exact, atol=0.02)


def test_proc_config_roundtrip_and_exec(tmp_path):
    import h5py

    from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
    from phd_qmclib_tpu.qmc_exec.data import dmc as dmc_data

    spec_config = dict(lattice_depth=10.0, lattice_ratio=1.0,
                       interaction_strength=1.0, boson_number=5,
                       supercell_size=5.0, tbf_contact_cutoff=0.3)
    proc = dmc_exec.Proc.from_config(dict(
        model_spec=spec_config, time_step=1e-3, max_num_walkers=96,
        target_num_walkers=64, rng_seed=3, num_blocks=3,
        num_time_steps_block=16, burn_in_blocks=1, dtype="float64",
        obd_spec={"num_pos": 4, "as_pure_est": True}))
    assert proc.obd_spec.num_pos == 4
    config = proc.as_config()
    assert config["obd_spec"] == {"num_pos": 4, "as_pure_est": True}
    assert dmc_exec.Proc.from_config(config) == proc
    assert proc.evolve({"obd_spec": {"num_pos": 8}}).obd_spec.num_pos == 8

    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    result = proc.exec(proc_input)
    obd_blocks = result.data.blocks.one_body_dm
    assert obd_blocks is not None
    mean = obd_blocks.mean
    assert mean.shape == (4,)
    assert mean[0] == pytest.approx(1.0, rel=1e-6)
    with expect_opt_block_warning():
        assert np.all(np.isfinite(obd_blocks.mean_error))

    path = tmp_path / "dmc-obd.h5"
    with h5py.File(path, "w") as fp:
        result.data.hdf5_export(fp.require_group("data"))
    with h5py.File(path, "r") as fp:
        loaded = dmc_data.SamplingData.from_hdf5_data(fp["data"])
    np.testing.assert_allclose(loaded.blocks.one_body_dm.totals,
                               obd_blocks.totals)
    # keep_iter_data series path.
    proc2 = proc.evolve({"keep_iter_data": True, "num_blocks": 2})
    result2 = proc2.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc2))
    assert result2.data.series.obd.shape == (2, 16, 4)
    assert result2.data.blocks.one_body_dm.mean[0] == \
        pytest.approx(1.0, rel=1e-6)
