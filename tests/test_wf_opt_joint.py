"""Two-parameter variational optimization: joint (rm, trial-orbital
lattice depth).

The reference optimizer caps at the single ``rm`` knob
(``mrbp_qmc/model.py:902-942``); here the one-body Bloch orbital's
depth becomes a second variational parameter (``Spec
.obf_lattice_depth`` — the kernels read every orbital quantity from
``OBFParams`` and the potential from ``ModelParams``, so the split is
exact) with an implicit-differentiation band solve
(``mrbp.obf_params_device``) for the gradient backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu import wf_opt
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu import ideal


def _setup(tbf=0.1):
    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=5,
                     supercell_size=5.0, tbf_contact_cutoff=tbf)
    rng = np.random.default_rng(7)
    pos_set = np.stack([spec.init_get_sys_conf(rng=rng)
                        for _ in range(256)])[:, mrbp.SysConfSlot.pos, :]
    funcs = mrbp.core_funcs(spec)
    cfc = jax.tree.map(jnp.float64, spec.cfc_params)
    lp_set = np.asarray(funcs.log_psi(jnp.asarray(pos_set), cfc))
    return spec, pos_set, lp_set


class TestObfDepthSpec:

    def test_device_band_solve_matches_host(self):
        spec, _, _ = _setup()
        for v0 in (1.0, 5.0, 20.0, 60.0):
            host = ideal.eigen_energy(v0, spec.lattice_ratio)
            dev = mrbp.obf_params_device(jnp.float64(v0), spec)
            np.testing.assert_allclose(float(dev.param_e0), host,
                                       rtol=1e-12)
            np.testing.assert_allclose(float(dev.param_k1),
                                       np.sqrt(host), rtol=1e-12)

    def test_band_solve_gradient_matches_finite_differences(self):
        spec, _, _ = _setup()
        g = jax.grad(lambda v: mrbp.obf_params_device(
            v, spec).param_e0)(jnp.float64(20.0))
        h = 1e-6
        fd = (ideal.eigen_energy(20.0 + h, 1.0)
              - ideal.eigen_energy(20.0 - h, 1.0)) / (2 * h)
        np.testing.assert_allclose(float(g), fd, rtol=1e-6)

    def test_pinned_depth_is_the_identity(self):
        """``obf_lattice_depth == lattice_depth`` reproduces the base
        trial function exactly (pinning the second knob recovers the
        1-D model)."""
        spec, pos_set, _ = _setup()
        pinned = spec.evolve(obf_lattice_depth=spec.lattice_depth)
        assert pinned.obf_params == spec.obf_params._replace(
            lattice_depth=spec.lattice_depth)
        funcs = mrbp.core_funcs(spec)
        lp0 = funcs.log_psi(jnp.asarray(pos_set),
                            jax.tree.map(jnp.float64, spec.cfc_params))
        lp1 = funcs.log_psi(jnp.asarray(pos_set),
                            jax.tree.map(jnp.float64,
                                         pinned.cfc_params))
        np.testing.assert_array_equal(np.asarray(lp0), np.asarray(lp1))

    def test_orbital_depth_changes_trial_not_potential(self):
        spec, _, _ = _setup()
        varied = spec.evolve(obf_lattice_depth=4.0)
        assert varied.obf_params.lattice_depth == 4.0
        assert varied.params.lattice_depth == spec.lattice_depth
        assert varied.static_spec == spec.static_spec

    def test_validation(self):
        spec, _, _ = _setup()
        with pytest.raises(ValueError, match="positive"):
            spec.evolve(obf_lattice_depth=-1.0)
        free = mrbp.Spec(lattice_depth=0.0, lattice_ratio=1.0,
                         interaction_strength=2.0, boson_number=5,
                         supercell_size=5.0, tbf_contact_cutoff=0.1)
        with pytest.raises(ValueError, match="finite lattice"):
            free.evolve(obf_lattice_depth=5.0)


class TestJointOptimization:

    def test_pinned_second_knob_reproduces_1d_functional(self):
        """The joint variance at [rm, v0_physical] equals the 1-D
        variance at rm exactly — the 2-D surface restricts to the 1-D
        one on the pinned slice."""
        spec, pos_set, lp_set = _setup()
        opt1 = wf_opt.CSWFOptimizer(spec, pos_set, lp_set)
        opt2 = wf_opt.CSWFOptimizer(spec, pos_set, lp_set,
                                    opt_obf_lattice_depth=True)
        for rm in (0.1, 0.3, 0.9):
            np.testing.assert_allclose(
                opt2.principal_function([rm, spec.lattice_depth]),
                opt1.principal_function(rm), rtol=1e-12)

    def test_grad_joint_variance_and_gradient(self):
        spec, pos_set, lp_set = _setup()
        opt = wf_opt.GradCSWFOptimizer(spec, pos_set, lp_set,
                                       opt_obf_lattice_depth=True)
        x0 = jnp.asarray([0.31, 8.0], dtype=jnp.float64)
        v, g = opt._value_and_grad_fn(x0)
        assert np.isfinite(float(v)) and np.all(np.isfinite(g))
        h = 1e-6
        for i in range(2):
            e = jnp.zeros(2, jnp.float64).at[i].set(h)
            fd = (opt._variance_fn(x0 + e)
                  - opt._variance_fn(x0 - e)) / (2 * h)
            np.testing.assert_allclose(float(g[i]), float(fd),
                                       rtol=2e-4, atol=1e-10)
        # The jitted joint variance agrees with the host-path
        # principal function.
        host_v = opt.principal_function(np.asarray(x0))
        np.testing.assert_allclose(float(v), host_v, rtol=1e-10)

    @pytest.mark.slow
    def test_joint_optimum_not_worse_than_1d(self):
        """Adding a variational parameter can only lower (or tie) the
        variance minimum; the joint grad optimizer must reach at least
        the 1-D optimum."""
        spec, pos_set, lp_set = _setup()
        spec1 = wf_opt.GradCSWFOptimizer(spec, pos_set, lp_set).exec()
        opt2 = wf_opt.GradCSWFOptimizer(spec, pos_set, lp_set,
                                        opt_obf_lattice_depth=True)
        spec2 = opt2.exec()
        assert spec2.obf_lattice_depth is not None
        v1 = opt2.principal_function(
            [spec1.tbf_contact_cutoff, spec.lattice_depth])
        v2 = opt2.principal_function(
            [spec2.tbf_contact_cutoff, spec2.obf_lattice_depth])
        assert v2 <= v1 * (1 + 1e-6) + 1e-12

    def test_wf_opt_proc_passes_the_flag(self):
        spec, pos_set, lp_set = _setup()
        proc = wf_opt.WFOptProc(num_sys_confs=128, method="grad",
                                opt_obf_lattice_depth=True)
        opt_spec = proc.exec(spec, pos_set, lp_set)
        assert opt_spec.obf_lattice_depth is not None
        lo, hi = wf_opt.CSWFOptimizer(
            spec, pos_set, lp_set,
            opt_obf_lattice_depth=True).principal_function_bounds[1]
        assert lo <= opt_spec.obf_lattice_depth <= hi


def test_proc_config_roundtrip_with_obf_depth():
    from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec

    spec = mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=5,
                     supercell_size=5.0, tbf_contact_cutoff=0.3,
                     obf_lattice_depth=6.5)
    proc = dmc_exec.Proc(model_spec=spec, time_step=1e-3,
                         max_num_walkers=48, target_num_walkers=32,
                         num_blocks=2, num_time_steps_block=8,
                         rng_seed=1, dtype="float64")
    proc2 = dmc_exec.Proc.from_config(proc.as_config())
    assert proc2 == proc
    assert proc2.model_spec.obf_lattice_depth == 6.5
