"""Toy-Jastrow model: exercises the generic kernel factory with simple
analytic one/two-body functions, decoupled from the mrbp physics.

Mirrors the reference's fake-model strategy
(``/root/reference/tests/qmc_base/test_jastrow.py``): a Gaussian
one-body factor and a sine two-body factor with hand-computed
log-derivatives validate every kernel slot of ``build_core_funcs``
against autodiff.
"""
import typing as t

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu.models import jastrow

NOP, SC_SIZE = 4, 8.0


class ToyModelParams(t.NamedTuple):
    supercell_size: float
    gaussian_width: float


class ToyCFC(t.NamedTuple):
    model_params: ToyModelParams
    obf_params: ToyModelParams
    tbf_params: ToyModelParams


def one_body(z, cfc):
    w = cfc.obf_params.gaussian_width
    zc = jnp.mod(z, 1.0) - 0.5
    return jnp.exp(-0.5 * (zc / w) ** 2)


def one_body_log_dz(z, cfc):
    w = cfc.obf_params.gaussian_width
    zc = jnp.mod(z, 1.0) - 0.5
    return -zc / w ** 2


def one_body_log_dz2(z, cfc):
    # f''/f for the Gaussian factor.
    w = cfc.obf_params.gaussian_width
    zc = jnp.mod(z, 1.0) - 0.5
    return (zc / w ** 2) ** 2 - 1.0 / w ** 2


def two_body(r, cfc):
    L = cfc.tbf_params.supercell_size
    return jnp.sin(jnp.pi * r / L) ** 2 + 0.1


def two_body_log_dz(r, cfc):
    L = cfc.tbf_params.supercell_size
    th = jnp.pi * r / L
    f = jnp.sin(th) ** 2 + 0.1
    return (jnp.pi / L) * 2 * jnp.sin(th) * jnp.cos(th) / f


def two_body_log_dz2(r, cfc):
    L = cfc.tbf_params.supercell_size
    th = jnp.pi * r / L
    f = jnp.sin(th) ** 2 + 0.1
    d2f = 2 * (jnp.pi / L) ** 2 * (jnp.cos(th) ** 2 - jnp.sin(th) ** 2)
    return d2f / f


def potential(z, cfc):
    return 0.5 * jnp.mod(z, 1.0) ** 2


@pytest.fixture(scope="module")
def funcs():
    return jastrow.build_core_funcs(
        one_body=one_body, one_body_log_dz=one_body_log_dz,
        one_body_log_dz2=one_body_log_dz2, two_body=two_body,
        two_body_log_dz=two_body_log_dz,
        two_body_log_dz2=two_body_log_dz2, potential=potential,
        is_free=False, is_ideal=False, boson_number=NOP)


@pytest.fixture(scope="module")
def cfc():
    params = ToyModelParams(SC_SIZE, 0.3)
    return ToyCFC(params, params, params)


@pytest.fixture(scope="module")
def pos():
    rng = np.random.default_rng(4)
    return jnp.asarray(rng.uniform(0.1, SC_SIZE - 0.1, size=(NOP,)))


@pytest.mark.slow  # re-tiered r5: the mrbp autodiff identity
# (test_mrbp.TestAutodiffIdentities) is the fast-tier gate
def test_drift_is_grad(funcs, cfc, pos):
    grad = jax.grad(lambda p: funcs.log_psi(p, cfc))(pos)
    np.testing.assert_allclose(np.asarray(funcs.drift(pos, cfc)),
                               np.asarray(grad), rtol=1e-8)


@pytest.mark.slow
def test_energy_matches_laplacian(funcs, cfc, pos):
    # Full-tier (hessian compile); the fast tier keeps drift==grad,
    # fused-consistency and delta-move identities on this toy model.
    f = lambda p: funcs.log_psi(p, cfc)  # noqa: E731
    g = jax.grad(f)(pos)
    h = jax.hessian(f)(pos)
    pot = potential(pos, cfc).sum()
    expected = -(jnp.trace(h) + (g ** 2).sum()) + pot
    assert float(funcs.energy(pos, cfc)) == pytest.approx(
        float(expected), rel=1e-8)


def test_fused_consistency(funcs, cfc, pos):
    e, d = funcs.energy_and_drift(pos, cfc)
    lp, e2 = funcs.log_psi_and_energy(pos, cfc)
    assert float(e) == pytest.approx(float(e2), rel=1e-12)
    assert float(lp) == pytest.approx(float(funcs.log_psi(pos, cfc)),
                                      rel=1e-12)
    np.testing.assert_allclose(np.asarray(d),
                               np.asarray(funcs.drift(pos, cfc)),
                               rtol=1e-12)


def test_delta_moves(funcs, cfc, pos):
    k, dz = 2, 0.4
    moved = pos.at[k].add(dz)
    delta_lp = funcs.delta_log_psi_move(k, dz, pos, cfc)
    assert float(delta_lp) == pytest.approx(
        float(funcs.log_psi(moved, cfc) - funcs.log_psi(pos, cfc)),
        rel=1e-9)
    d0, d1 = funcs.drift(pos, cfc), funcs.drift(moved, cfc)
    for i in range(NOP):
        dd = funcs.delta_drift_move(i, k, dz, pos, cfc)
        assert float(dd) == pytest.approx(float(d1[i] - d0[i]),
                                          rel=1e-8), i
