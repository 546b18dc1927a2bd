"""PhysicalFuncs batch API, delta_drift_move, wf_abs, legacy alias."""
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp


@pytest.fixture(scope="module")
def spec():
    return mrbp.Spec(lattice_depth=10.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=5,
                     supercell_size=5.0, tbf_contact_cutoff=0.3)


@pytest.fixture(scope="module")
def pos(spec):
    rng = np.random.default_rng(5)
    return jnp.asarray(rng.uniform(0, 5.0, size=(5,)))


def test_physical_funcs_batch(spec):
    pf = mrbp.PhysicalFuncs.from_model_spec(spec)
    rng = np.random.default_rng(2)
    batch = rng.uniform(0, 5.0, size=(7, 5))
    lp = pf.wf_abs_log(batch)
    e = pf.energy(batch)
    dr = pf.drift(batch)
    assert lp.shape == (7,) and e.shape == (7,) and dr.shape == (7, 5)
    # Packed (2, N) buffers accepted; drift slot ignored.
    packed = np.stack([batch, np.zeros_like(batch)], axis=1)
    np.testing.assert_allclose(np.asarray(pf.wf_abs_log(packed)),
                               np.asarray(lp))
    funcs = mrbp.core_funcs(spec)
    np.testing.assert_allclose(
        np.asarray(e),
        np.asarray(funcs.energy(jnp.asarray(batch), spec.cfc_params)))
    obd = pf.one_body_density(0.0, batch)
    np.testing.assert_allclose(np.asarray(obd), 1.0, rtol=1e-12)
    rho = pf.fourier_density(np.array([0.0]), batch)
    np.testing.assert_allclose(np.asarray(rho.real), 5.0, rtol=1e-12)


def test_wf_abs(spec, pos):
    funcs = mrbp.core_funcs(spec)
    cfc = spec.cfc_params
    assert float(funcs.wf_abs(pos, cfc)) == pytest.approx(
        float(jnp.exp(funcs.log_psi(pos, cfc))))


def test_delta_drift_move(spec, pos):
    funcs = mrbp.core_funcs(spec)
    cfc = spec.cfc_params
    k, dz = 1, 0.23
    moved = pos.at[k].add(dz)
    drift0 = funcs.drift(pos, cfc)
    drift1 = funcs.drift(moved, cfc)
    for i in range(5):
        delta = funcs.delta_drift_move(i, k, dz, pos, cfc)
        expected = float(drift1[i] - drift0[i])
        assert float(delta) == pytest.approx(expected, rel=1e-9), i


def test_legacy_alias_package():
    from phd_qmclib_tpu.multirods_qmc import bloch_phonon
    assert bloch_phonon.Spec is mrbp.Spec
    assert bloch_phonon.core_funcs is mrbp.core_funcs


@pytest.mark.slow  # re-tiered r5: chunk-vs-vmap bit-exact
# oracle; the chunked path itself runs fast-tier via the OBDM
# proc/estimator tests
def test_obdm_grid_offset_chunking_matches_vmap(monkeypatch):
    """The offset-chunked OBDM grid (bounded temporaries at production
    shapes) is exactly the all-offsets vmap."""
    import phd_qmclib_tpu.models.jastrow as jmod
    from phd_qmclib_tpu.models import mrbp

    spec = mrbp.Spec(lattice_depth=8.0, lattice_ratio=1.0,
                     interaction_strength=2.0, boson_number=6,
                     supercell_size=6.0, tbf_contact_cutoff=0.3)
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0, 6.0, size=(5, 6)))
    szs = jnp.asarray(np.linspace(0.0, 3.0, 7))
    cfc = spec.cfc_params

    funcs = mrbp.core_funcs(spec)
    full = funcs.one_body_density_grid(szs, pos, cfc)
    # Force chunk = 1 offset per map step (the budget is read at trace
    # time, so the same kernel namespace re-traces onto the map path).
    monkeypatch.setattr(jmod, "PAIR_TILE_ELEMS", 1)
    chunked = funcs.one_body_density_grid(szs, pos, cfc)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-13)
