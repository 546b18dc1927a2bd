"""End-to-end wavefunction-optimization workflow (reference call stack
3.3 in SURVEY.md): VMC sampling -> harvest configurations + log-psi ->
correlated-sampling optimization -> improved trial wavefunction."""
import numpy as np
import pytest

from phd_qmclib_tpu import wf_opt
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import vmc
from phd_qmclib_tpu.utils.record import (namedtuple_as_record,
                                         record_as_namedtuple)


def test_record_roundtrip():
    tbf = mrbp.TBFParams(5.0, 0.3, 1.1, 2.2, 3.3, 0.9)
    rec = namedtuple_as_record(tbf)
    assert rec.dtype.names == tbf._fields
    back = record_as_namedtuple(rec, mrbp.TBFParams)
    assert back == tbf


@pytest.mark.slow  # tier budget: the WFOptProc path + the CLI
# pipeline tests (fast) cover the same workflow end to end
def test_state_data_blocks_and_optimize():
    # Deliberately suboptimal variational parameter.
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=5,
                     supercell_size=5.0, tbf_contact_cutoff=0.1)
    sampling = vmc.Sampling(spec, move_spread=0.25, rng_seed=37,
                            num_walkers=32)
    rng = np.random.default_rng(2)
    confs0 = np.stack([spec.init_get_sys_conf(rng=rng)
                       for _ in range(32)])
    state = sampling.build_state(confs0)

    blocks = sampling.state_data_blocks(num_steps_block=128,
                                        ini_state=state, thin=8)
    next(blocks)  # equilibrate
    confs, block = next(blocks)
    assert confs.shape == (16, 32, 5)
    assert block.iter_props.energy.shape == (128, 32)
    assert 0 < block.accept_rate < 1

    # Harvest the thinned configurations with their log-psi values.
    pos_set = np.asarray(confs).reshape(-1, 5)
    funcs = sampling.core_funcs
    lp_set = np.asarray(funcs.log_psi(confs, spec.cfc_params)).reshape(-1)

    proc = wf_opt.WFOptProc(num_sys_confs=256)
    opt_spec = proc.exec(spec, pos_set, lp_set)

    optimizer = wf_opt.CSWFOptimizer(spec, pos_set[-256:], lp_set[-256:])
    var_initial = optimizer.principal_function(spec.tbf_contact_cutoff)
    var_optimal = optimizer.principal_function(
        opt_spec.tbf_contact_cutoff)
    # The optimized parameter must not be worse than the starting one.
    assert var_optimal <= var_initial + 1e-12
    assert opt_spec.tbf_contact_cutoff != spec.tbf_contact_cutoff
