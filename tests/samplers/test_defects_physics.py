"""Defect physics end to end.

The multi-rod model supports periodic defects — every
``defects_sep``-th cell's barrier takes ``defect_magnitude`` instead of
``lattice_depth`` (reference ``mrbp_qmc/model.py:532-551``; validation
requires ``defect_magnitude <= lattice_depth``, i.e. defects are
vacancy-like weak barriers).  The trial wavefunction's one-body orbital
is the CLEAN lattice orbital, so only the projection can respond: DMC
density must flow INTO the weak defect barriers relative to the
regular ones, and the energy must drop below the clean lattice's.
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc

NOP = 8
SC = 8.0
V0 = 12.0
DEFECT_V = 1.0
BINS = 64


@pytest.mark.slow
def test_dmc_density_flows_into_weak_defect_barriers():
    spec = mrbp.Spec(lattice_depth=V0, lattice_ratio=1.0,
                     interaction_strength=0.5, boson_number=NOP,
                     supercell_size=SC, tbf_contact_cutoff=0.3,
                     num_defects=2, defect_magnitude=DEFECT_V)
    assert spec.defects_sep == 4  # defective cells: 0 and 4

    sampling = dmc.Sampling(
        spec, time_step=2e-3, max_num_walkers=320,
        target_num_walkers=256, rng_seed=5,
        density_est_spec=dmc.DensityEstSpec(num_bins=BINS))
    rng = np.random.default_rng(3)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(256)])
    state = sampling.build_state(confs)
    nts = 256
    it = sampling.blocks(state, nts, burn_in_blocks=4)
    for _ in range(4):
        next(it)
    hist = np.zeros(BINS)
    weight = 0.0
    for _ in range(4):
        block = next(it)
        hist += np.asarray(block.iter_density,
                           dtype=np.float64).sum(axis=0)
        weight += np.asarray(block.iter_props.num_walkers,
                             dtype=np.float64).sum()
    density = hist / weight  # mean per-walker occupation per bin

    # Cell c spans [c, c+1); its barrier is the upper half (r = 1).
    # 8 bins per cell -> barrier bins are the last 4 of each cell.
    bins_per_cell = BINS // int(SC)
    barrier = np.arange(bins_per_cell // 2, bins_per_cell)
    cells = np.arange(int(SC))
    defect_cells = cells[cells % spec.defects_sep == 0]
    clean_cells = cells[cells % spec.defects_sep != 0]
    mass = density.reshape(int(SC), bins_per_cell)[:, barrier].sum(axis=1)
    defect_mass = mass[defect_cells].mean()
    clean_mass = mass[clean_cells].mean()

    # The 12x-weaker defect barrier must hold several times more
    # density than a regular barrier, and the total must stay N.
    assert defect_mass > 2.0 * clean_mass, (defect_mass, clean_mass)
    np.testing.assert_allclose(density.sum(), NOP, rtol=1e-6)

    # The energy must also drop below the clean lattice's (defects
    # only remove repulsive potential).
    clean = mrbp.Spec(lattice_depth=V0, lattice_ratio=1.0,
                      interaction_strength=0.5, boson_number=NOP,
                      supercell_size=SC, tbf_contact_cutoff=0.3)
    clean_sampling = dmc.Sampling(
        clean, time_step=2e-3, max_num_walkers=320,
        target_num_walkers=256, rng_seed=5)
    cit = clean_sampling.blocks(clean_sampling.build_state(confs), nts,
                                burn_in_blocks=4)
    for _ in range(6):
        cb = next(cit)
    db = block
    e_clean = (np.asarray(cb.iter_props.energy, np.float64).sum()
               / np.asarray(cb.iter_props.weight, np.float64).sum())
    e_defect = (np.asarray(db.iter_props.energy, np.float64).sum()
                / np.asarray(db.iter_props.weight, np.float64).sum())
    assert e_defect < e_clean
