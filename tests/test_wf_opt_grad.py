"""Gradient-based correlated-sampling optimizer.

The analytic d(variance)/d(rm) flows through ``lax.custom_root`` around
the two-body matching condition; the optimizer must agree with the
reference-behavior differential-evolution path
(``mrbp_qmc/model.py:927-942``) on the same configuration set while
using orders of magnitude fewer functional evaluations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu import wf_opt
from phd_qmclib_tpu.models import mrbp


def _setup():
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=5,
                     supercell_size=5.0, tbf_contact_cutoff=0.1)
    rng = np.random.default_rng(7)
    pos_set = np.stack([spec.init_get_sys_conf(rng=rng)
                        for _ in range(256)])[:, mrbp.SysConfSlot.pos, :]
    funcs = mrbp.core_funcs(spec)
    cfc = jax.tree.map(jnp.float64, spec.cfc_params)
    lp_set = np.asarray(funcs.log_psi(jnp.asarray(pos_set), cfc))
    return spec, pos_set, lp_set


@pytest.mark.slow
def test_variance_gradient_matches_finite_differences():
    """Slow tier: finite-difference oracle duplicate; the grad
    backend stays fast via its agreement-with-DE optimum test."""
    spec, pos_set, lp_set = _setup()
    opt = wf_opt.GradCSWFOptimizer(spec, pos_set, lp_set)
    rm0 = jnp.float64(0.31)
    v, g = opt._value_and_grad_fn(rm0)
    h = 1e-6
    fd = (opt._variance_fn(rm0 + h) - opt._variance_fn(rm0 - h)) / (2 * h)
    # The jitted variance also must agree with the host-path principal
    # function (same functional, different parameter plumbing).
    host_v = opt.principal_function(float(rm0))
    np.testing.assert_allclose(float(v), host_v, rtol=1e-10)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


@pytest.mark.slow
def test_grad_optimizer_agrees_with_de():
    spec, pos_set, lp_set = _setup()
    de_spec = wf_opt.CSWFOptimizer(spec, pos_set, lp_set).exec()
    gr_opt = wf_opt.GradCSWFOptimizer(spec, pos_set, lp_set)
    gr_spec = gr_opt.exec()
    # Same variance minimum (the optima may differ slightly along a
    # flat valley; compare functional values, the physical criterion).
    v_de = gr_opt.principal_function(de_spec.tbf_contact_cutoff)
    v_gr = gr_opt.principal_function(gr_spec.tbf_contact_cutoff)
    assert v_gr <= v_de * (1 + 1e-6) + 1e-12
    np.testing.assert_allclose(gr_spec.tbf_contact_cutoff,
                               de_spec.tbf_contact_cutoff, rtol=0.05)


def test_wf_opt_proc_method_dispatch():
    spec, pos_set, lp_set = _setup()
    proc = wf_opt.WFOptProc(num_sys_confs=256, method="grad")
    opt_spec = proc.exec(spec, pos_set, lp_set)
    assert opt_spec.tbf_contact_cutoff != spec.tbf_contact_cutoff
    try:
        wf_opt.WFOptProc(method="nope").exec(spec, pos_set, lp_set)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("bad method must raise")
