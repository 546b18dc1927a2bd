"""Density-estimator exactness: for the ideal gas the DMC walkers sample
``|f1(z)|^2`` exactly (the trial orbital is the exact ground state), so
the histogram density must match the analytic per-bin integrals."""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc


@pytest.mark.slow
def test_ideal_gas_density_profile_matches_orbital():
    """Slow tier: statistical physics gate (20 DMC blocks at 512
    walkers); the density estimator's mechanics stay fast via the
    exec-layer density tests and the fuzz sum rules."""
    N, L, BINS = 8, 8.0, 16
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=0.0, boson_number=N,
                     supercell_size=L, tbf_contact_cutoff=0.4)
    sampling = dmc.Sampling(
        spec, time_step=5e-4, max_num_walkers=640,
        target_num_walkers=512, rng_seed=8,
        density_est_spec=dmc.DensityEstSpec(BINS, as_pure_est=False))
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(512)])
    state = sampling.build_state(confs)
    blocks = sampling.blocks(state, num_time_steps_block=64,
                             burn_in_blocks=8)
    for _ in range(8):
        next(blocks)
    dens = None
    weight = 0.0
    for _ in range(12):
        b = next(blocks)
        d = np.asarray(b.iter_density, dtype=np.float64).sum(axis=0)
        dens = d if dens is None else dens + d
        weight += float(np.asarray(b.iter_props.weight,
                                   dtype=np.float64).sum())
    measured = dens / dens.sum()  # bin occupation fractions

    # Analytic: per-bin integral of f1^2 (periodic over unit cells;
    # 2 bins per cell here, so integrate f1^2 over each half-cell).
    z = np.linspace(0, L, 16001)
    f1sq = np.asarray(mrbp._one_body(z, spec.cfc_params)) ** 2
    edges = np.linspace(0, L, BINS + 1)
    exact = np.array([
        np.trapezoid(f1sq[(z >= lo) & (z <= hi)], z[(z >= lo) & (z <= hi)])
        for lo, hi in zip(edges[:-1], edges[1:])])
    exact = exact / exact.sum()

    # The discretized drift-diffusion samples f1^2 with an O(dt)
    # bias (DMC applies no Metropolis correction), so the tolerance
    # reflects dt=5e-4 plus statistics.
    np.testing.assert_allclose(measured, exact, rtol=0.03, atol=1.2e-3)
