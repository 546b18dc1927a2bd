"""Differentiable two-body parameter solve.

``mrbp.tbf_params_device`` must (a) reproduce the host ``brentq`` path
(``mrbp_qmc/model.py:317-393``) to solver tolerance, and (b) deliver
the exact implicit-function-theorem gradient through the transcendental
matching condition — the piece the reference cannot do (its optimizer
is derivative-free, ``mrbp_qmc/model.py:927-942``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp


def _spec(gn=2.0, rm=0.4, nop=16):
    return mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=gn, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=rm)


@pytest.mark.parametrize("gn", [0.1, 1.0, 5.0, 50.0])
@pytest.mark.parametrize("rm", [0.05, 0.2, 0.45, 2.0, 7.0])
def test_matches_host_brentq(gn, rm):
    spec = _spec(gn, rm)
    host = spec.tbf_params
    dev = mrbp.tbf_params_device(jnp.float64(rm), gn,
                                 spec.boson_number, spec.supercell_size)
    for name, h, d in zip(mrbp.TBFParams._fields, host, dev):
        assert abs(h - float(d)) < 1e-7 * max(1.0, abs(h)), \
            (name, gn, rm, h, float(d))


@pytest.mark.slow  # re-tiered r5: FD oracle duplicate — the
# fast tier gates the same custom_root gradient through
# tests/test_wf_opt_joint.py (FD check through BOTH solves)
def test_gradient_matches_finite_differences():
    spec = _spec()

    def fields_of_rm(rm):
        tbf = mrbp.tbf_params_device(rm, spec.interaction_strength,
                                     spec.boson_number,
                                     spec.supercell_size)
        return jnp.stack([tbf.param_k2, tbf.param_beta,
                          tbf.param_r_off, tbf.param_am])

    rm0 = jnp.float64(0.4)
    jac = jax.jacfwd(fields_of_rm)(rm0)
    h = 1e-6
    fd = (fields_of_rm(rm0 + h) - fields_of_rm(rm0 - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(fd),
                               rtol=1e-4)


def test_vmaps_over_rm():
    spec = _spec()
    rms = jnp.linspace(0.1, 0.6, 8)
    k2 = jax.vmap(lambda r: mrbp.tbf_params_device(
        r, spec.interaction_strength, spec.boson_number,
        spec.supercell_size).param_k2)(rms)
    expected = [spec.evolve(tbf_contact_cutoff=float(r))
                .tbf_params.param_k2 for r in rms]
    np.testing.assert_allclose(np.asarray(k2), expected, rtol=1e-7)


def test_cfc_params_device_consistent():
    spec = _spec()
    cfc_dev = mrbp.cfc_params_device(jnp.float64(0.4), spec)
    cfc_host = spec.cfc_params
    host_flat, _ = jax.tree_util.tree_flatten(cfc_host)
    dev_flat, _ = jax.tree_util.tree_flatten(cfc_dev)
    np.testing.assert_allclose([float(x) for x in dev_flat],
                               [float(x) for x in host_flat], rtol=1e-7)
