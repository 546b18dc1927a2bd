"""Sampled-distribution exactness: for one ideal boson the VMC chain
must sample ``|f1(z)|^2`` - a direct test of the Metropolis machine plus
the KP orbital, independent of energy estimators."""
import numpy as np
import pytest
from scipy import stats as sps

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import vmc


def test_vmc_samples_orbital_density():
    spec = mrbp.Spec(lattice_depth=12.0, lattice_ratio=1.0,
                     interaction_strength=0.0, boson_number=1,
                     supercell_size=1.0, tbf_contact_cutoff=0.25)
    sampling = vmc.Sampling(spec, move_spread=0.3, rng_seed=101,
                            num_walkers=64)
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(64)])
    state = sampling.build_state(confs)
    blocks = sampling.blocks(512, state)
    next(blocks)  # equilibrate

    # Collect end-of-block positions over many blocks (decorrelated).
    samples = []
    for _ in range(40):
        b = next(blocks)
        samples.append(np.asarray(b.last_state.pos).ravel())
    samples = np.concatenate(samples)  # ~2.5k decorrelated samples

    # Analytic target: |f1(z)|^2 on the unit cell, normalized.
    funcs = mrbp.core_funcs(spec)
    z_grid = np.linspace(0, 1.0, 2001)
    psi2 = np.asarray(mrbp._one_body(z_grid, spec.cfc_params)) ** 2
    cdf = np.cumsum(psi2)
    cdf = (cdf - cdf[0]) / (cdf[-1] - cdf[0])

    def target_cdf(z):
        return np.interp(z, z_grid, cdf)

    ks = sps.kstest(samples, target_cdf)
    assert ks.pvalue > 1e-3, (ks, len(samples))

    # The density contrast must match: probability in the well half of
    # the cell vs the barrier half.
    well_prob = target_cdf(0.5)
    sampled_well = float((np.mod(samples, 1.0) < 0.5).mean())
    assert sampled_well == pytest.approx(well_prob, abs=0.03)
