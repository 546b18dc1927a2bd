"""Fused sweep execution: SweepProc must reproduce each procedure's
standalone ``exec`` result exactly (same seeds, same single-device
layout — the fused rows replay identical key streams)."""
import numpy as np
import pytest

from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
from phd_qmclib_tpu.qmc_exec.sweep import SweepProc
from phd_qmclib_tpu.models import mrbp

GNS = [0.5, 2.0]


def _proc(gn, **overrides):
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=gn, boson_number=6,
                     supercell_size=6.0, tbf_contact_cutoff=0.25)
    kwargs = dict(model_spec=spec, time_step=1e-3,
                  max_num_walkers=48, target_num_walkers=32,
                  num_blocks=3, num_time_steps_block=12,
                  burn_in_blocks=1, rng_seed=23,
                  density_spec=dmc_exec.DensityEstSpec(num_bins=12),
                  ssf_spec=dmc_exec.SSFEstSpec(num_modes=4),
                  obd_spec=dmc_exec.OBDEstSpec(num_pos=5),
                  pair_corr_spec=dmc_exec.PairCorrEstSpec(num_bins=6))
    kwargs.update(overrides)
    return dmc_exec.Proc(**kwargs)


def _input(proc):
    return dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)


@pytest.mark.slow
def test_fused_exec_matches_standalone_rows():
    procs = tuple(_proc(gn) for gn in GNS)
    inputs = [_input(p) for p in procs]
    fused_results = SweepProc(procs).exec(inputs)

    for proc, inp, fused in zip(procs, inputs, fused_results):
        alone = proc.exec(dmc_exec.ProcInput(inp.state))
        fb = fused.data.blocks
        ab = alone.data.blocks
        np.testing.assert_allclose(fb.energy.totals, ab.energy.totals,
                                   rtol=1e-12)
        np.testing.assert_allclose(fb.weight.totals, ab.weight.totals,
                                   rtol=1e-12)
        np.testing.assert_allclose(fb.density.totals, ab.density.totals,
                                   rtol=1e-12)
        np.testing.assert_allclose(
            fb.ss_factor.fdk_sqr_abs_part.totals,
            ab.ss_factor.fdk_sqr_abs_part.totals, rtol=1e-12)
        np.testing.assert_allclose(fb.one_body_dm.totals, ab.one_body_dm.totals,
                                   rtol=1e-12)
        np.testing.assert_allclose(fb.pair_corr.totals,
                                   ab.pair_corr.totals, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(fused.state.pos), np.asarray(alone.state.pos),
            rtol=1e-12)


def test_sweep_proc_validation():
    with pytest.raises(ValueError, match="at least one"):
        SweepProc(())
    with pytest.raises(ValueError, match="share block structure"):
        SweepProc((_proc(0.5), _proc(2.0, num_blocks=5)))
    with pytest.raises(ValueError, match="single-device"):
        SweepProc((_proc(0.5, num_mesh_devices=0),))
    with pytest.raises(ValueError, match="one ProcInput"):
        procs = tuple(_proc(gn) for gn in GNS)
        SweepProc(procs).exec([_input(procs[0])])


def test_fused_exec_smoke():
    """Fast-tier coverage: a tiny fused SweepProc run produces one
    finite, well-formed result per row (the exact row-by-row
    equivalence gate is the ``slow`` test above)."""
    procs = tuple(_proc(gn, num_blocks=2, num_time_steps_block=6,
                        burn_in_blocks=0, density_spec=None,
                        ssf_spec=None, obd_spec=None)
                  for gn in GNS)
    results = SweepProc(procs).exec([_input(p) for p in procs])
    assert len(results) == len(GNS)
    es = [r.data.blocks.energy.mean / 6 for r in results]
    assert all(np.isfinite(e) for e in es)
    assert es[0] < es[1]  # monotone EOS in gn
