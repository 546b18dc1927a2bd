"""Parameter-space fuzzing: model invariants must hold across random
specs (the kind of coverage the reference lacks entirely)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp


def _run_invariants(num_specs):
    rng = np.random.default_rng(20260816)
    for trial in range(num_specs):
        v0 = float(rng.uniform(0.5, 80.0))
        r = float(rng.uniform(0.2, 3.0))
        gn = float(rng.uniform(0.05, 20.0))
        nop = int(rng.integers(3, 9))
        sc_size = float(nop)
        rm = float(rng.uniform(0.05, 0.45))
        spec = mrbp.Spec(lattice_depth=v0, lattice_ratio=r,
                         interaction_strength=gn, boson_number=nop,
                         supercell_size=sc_size, tbf_contact_cutoff=rm)
        funcs = mrbp.core_funcs(spec)
        cfc = spec.cfc_params

        # Derived parameters stay finite and physical.
        assert 0 < spec.obf_params.param_e0 < v0
        tbf = spec.tbf_params
        assert np.isfinite([tbf.param_k2, tbf.param_beta,
                            tbf.param_r_off, tbf.param_am]).all()

        pos = jnp.asarray(rng.uniform(0, sc_size, size=(4, nop)))
        lp, e = funcs.log_psi_and_energy(pos, cfc)
        assert np.isfinite(np.asarray(lp)).all(), (trial, spec)
        assert np.isfinite(np.asarray(e)).all(), (trial, spec)

        # drift == grad(log_psi) for a sampled configuration.
        g = jax.grad(lambda p: funcs.log_psi(p, cfc))(pos[0])
        d = funcs.drift(pos[0], cfc)
        np.testing.assert_allclose(np.asarray(d), np.asarray(g),
                                   rtol=1e-7, atol=1e-9,
                                   err_msg=f"trial {trial}: {spec}")

        # Translation invariance of the energy (PBC): shifting every
        # particle by a lattice period leaves E unchanged.
        e_shift = funcs.energy(mrbp.recast(pos + 1.0, cfc), cfc)
        np.testing.assert_allclose(np.asarray(e_shift),
                                   np.asarray(e), rtol=1e-9)

        # Pair histogram invariants: counts are nonnegative integers
        # summing to N(N-1)/2, translation-invariant under PBC.
        num_bins = int(rng.integers(3, 17))
        hist = np.asarray(funcs.pair_dist_histogram(num_bins, pos, cfc))
        assert (hist >= 0).all() and (hist == np.round(hist)).all()
        np.testing.assert_array_equal(hist.sum(axis=-1),
                                      nop * (nop - 1) / 2)
        hist_shift = np.asarray(funcs.pair_dist_histogram(
            num_bins, mrbp.recast(pos + 1.0, cfc), cfc))
        np.testing.assert_array_equal(hist, hist_shift)


@pytest.mark.slow
def test_invariants_over_random_specs():
    _run_invariants(num_specs=12)


def test_invariants_quick_fuzz():
    """Fast-tier fuzz: a 1-spec subsample keeps the invariant
    machinery exercised on every run; the slow sweep draws 12."""
    _run_invariants(num_specs=1)
