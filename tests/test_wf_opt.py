"""Wavefunction-optimization tests."""
import numpy as np
import pytest

from phd_qmclib_tpu import wf_opt
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import vmc


@pytest.fixture(scope="module")
def vmc_setup():
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=5,
                     supercell_size=5.0, tbf_contact_cutoff=0.5)
    sampling = vmc.Sampling(spec, move_spread=0.25, rng_seed=99,
                            num_walkers=64)
    rng = np.random.default_rng(1)
    confs = np.stack([spec.init_get_sys_conf(rng=rng) for _ in range(64)])
    state = sampling.build_state(confs)
    blocks = sampling.blocks(256, state)
    next(blocks)  # equilibrate
    block = next(blocks)
    last = block.last_state
    return spec, np.asarray(last.pos), np.asarray(last.wf_abs_log)


def test_weighed_variance_basics():
    energies = np.array([1.0, 2.0, 3.0])
    wlog = np.zeros(3)
    assert wf_opt.weighed_variance(wlog, energies) == pytest.approx(
        np.var(energies))
    # A weight singling out one config kills the variance.
    wlog = np.array([0.0, 100.0, 0.0])
    assert wf_opt.weighed_variance(wlog, energies) == pytest.approx(
        0.0, abs=1e-30)


def test_principal_function_and_exec(vmc_setup):
    spec, pos_set, lp_set = vmc_setup
    optimizer = wf_opt.CSWFOptimizer(spec, pos_set, lp_set)

    # At the original rm, all weights are unity by construction when the
    # parameter is unchanged.
    var_here = optimizer.principal_function(spec.tbf_contact_cutoff)
    assert np.isfinite(var_here) and var_here > 0

    # The variance surface differs across the variational parameter.
    var_small = optimizer.principal_function(0.1)
    var_large = optimizer.principal_function(2.0)
    assert len({round(v, 10) for v in (var_here, var_small, var_large)}) > 1

    opt_spec = optimizer.exec()
    assert isinstance(opt_spec, mrbp.Spec)
    lo, hi = optimizer.principal_function_bounds[0]
    assert lo <= opt_spec.tbf_contact_cutoff <= hi
    # The optimum can't be worse than the scanned candidates.
    var_opt = optimizer.principal_function(opt_spec.tbf_contact_cutoff)
    assert var_opt <= min(var_here, var_small, var_large) + 1e-9


def test_wf_opt_proc(vmc_setup):
    spec, pos_set, lp_set = vmc_setup
    proc = wf_opt.WFOptProc(num_sys_confs=32)
    opt_spec = proc.exec(spec, pos_set, lp_set)
    assert isinstance(opt_spec, mrbp.Spec)
    assert opt_spec.boson_number == spec.boson_number
