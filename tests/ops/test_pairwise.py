"""Pallas pairwise kernel tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.ops import pairwise


@pytest.fixture(scope="module")
def setup():
    # N=32, 32 walkers: interpret-mode cost scales ~ W*N^2, and 32
    # keeps the batch aligned with the production tile width so the
    # dispatch test exercises the real Pallas path (not the fallback).
    spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=32,
                     supercell_size=32.0, tbf_contact_cutoff=0.4)
    funcs = mrbp.core_funcs(spec)
    cfc = jax.tree.map(lambda x: jnp.float32(x), spec.cfc_params)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 32.0, (32, 32)), dtype=jnp.float32)
    return spec, funcs, cfc, pos


@pytest.mark.slow  # re-tiered r5: the randomized-config
# consistency sweep below is the fast-tier representative of the
# Pallas double-maintenance contract
def test_kernel_matches_xla(setup):
    spec, funcs, cfc, pos = setup
    pv = jnp.asarray(pairwise.pack_params(spec.cfc_params))
    lp_p, e_p, d_p = pairwise.energy_and_drift_pallas(
        pos, pv, nop=32, is_free=False, is_ideal=False, defects_sep=1,
        tw=8, with_log_psi=True, interpret=True)
    lp_x, e_x = funcs.log_psi_and_energy(pos, cfc)
    _, d_x = funcs.energy_and_drift(pos, cfc)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-4, atol=2e-5)
    # log|psi| accumulates ~N^2/2 pair terms in f32: the inherent
    # summation noise is ~eps*sqrt(pairs) ~ 3e-6 relative.
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_x),
                               rtol=1e-5)


def test_traced_param_packing(setup):
    spec, _, cfc, _ = setup
    vec_static = pairwise.pack_params(spec.cfc_params)
    vec_traced = np.asarray(jax.jit(pairwise.pack_params_traced)(cfc))
    np.testing.assert_allclose(vec_traced, vec_static, rtol=1e-7)


@pytest.mark.slow
def test_core_funcs_pallas_dispatch(setup, monkeypatch):
    """Slow tier: env-var dispatch wiring (pays a Pallas interpret
    compile); kernel consistency stays fast via test_kernel_matches_xla
    and the randomized shadow guard."""
    spec, funcs, cfc, pos = setup
    monkeypatch.setattr(mrbp, "_PALLAS_INTERPRET", True)
    pfuncs = mrbp.core_funcs(spec, pairwise_impl="pallas")
    e_p, d_p = pfuncs.energy_and_drift(pos, cfc)
    e_x, d_x = funcs.energy_and_drift(pos, cfc)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=2e-6)
    # Non-tile-aligned batches fall back to the XLA path.
    e_f, _ = pfuncs.energy_and_drift(pos[:5], cfc)
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_x[:5]),
                               rtol=1e-6)
    # f64 input falls back too (tests run with x64 enabled).
    pos64 = jnp.asarray(np.asarray(pos), dtype=jnp.float64)
    cfc64 = jax.tree.map(lambda x: jnp.float64(x), cfc)
    e64, _ = pfuncs.energy_and_drift(pos64, cfc64)
    assert e64.dtype == jnp.float64


@pytest.mark.parametrize("seed", range(6))
def test_shadow_kernel_consistency_randomized_configs(seed,
                                                      monkeypatch):
    """Double-maintenance guard (docs/DESIGN.md §6): the retired-but-
    kept Pallas pairwise kernel must track every production-formula
    change across the model-config space — free gas, ideal gas,
    lattices with and without defects, varying couplings and sizes —
    not just the single config the targeted tests use."""
    rng = np.random.default_rng(1000 + seed)
    nop = int(rng.choice([16, 64]))
    sc = float(nop)
    variant = seed % 3
    kwargs = dict(lattice_ratio=1.0, boson_number=nop,
                  supercell_size=sc,
                  tbf_contact_cutoff=float(rng.uniform(0.2, 0.45)))
    if variant == 0:      # free gas (no lattice)
        kwargs.update(lattice_depth=0.0,
                      interaction_strength=float(rng.uniform(0.5, 20)))
    elif variant == 1:    # ideal lattice gas
        kwargs.update(lattice_depth=float(rng.uniform(1.0, 30.0)),
                      interaction_strength=0.0)
    else:                 # interacting defected lattice
        kwargs.update(lattice_depth=float(rng.uniform(5.0, 30.0)),
                      interaction_strength=float(rng.uniform(0.5, 10)),
                      num_defects=max(1, nop // 8),
                      defect_magnitude=float(rng.uniform(0.1, 1.0)))
    spec = mrbp.Spec(**kwargs)
    funcs = mrbp.core_funcs(spec)
    cfc = jax.tree.map(lambda x: jnp.float32(x), spec.cfc_params)
    pos = jnp.asarray(rng.uniform(0, sc, (16, nop)), dtype=jnp.float32)

    monkeypatch.setattr(mrbp, "_PALLAS_INTERPRET", True)
    pfuncs = mrbp.core_funcs(spec, pairwise_impl="pallas")
    e_p, d_p = pfuncs.energy_and_drift(pos, cfc)
    e_x, d_x = funcs.energy_and_drift(pos, cfc)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-3, atol=1e-4)
    lp_p, ep2 = pfuncs.log_psi_and_energy(pos, cfc)
    lp_x, ex2 = funcs.log_psi_and_energy(pos, cfc)
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_x),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ep2), np.asarray(ex2),
                               rtol=5e-5, atol=5e-5)
