"""Ideal Kronig-Penney band-bottom energy tests."""
import math

import pytest

from phd_qmclib_tpu import ideal


def test_energy_relation_root_bracketing():
    v0, r = 20.0, 1.0
    f0 = ideal.energy_relation(v0, r, 0.0, 0.0)
    upper = min(v0, (1 + r) ** 2 * math.pi ** 2)
    f1 = ideal.energy_relation(v0, r, upper, 0.0)
    assert f0 * f1 < 0  # root is bracketed


@pytest.mark.parametrize("v0,r", [(5.0, 0.5), (20.0, 1.0), (100.0, 2.0)])
def test_eigen_energy_is_root(v0, r):
    e0 = ideal.eigen_energy(v0, r)
    assert 0 < e0 < v0
    # It must satisfy the dispersion relation to high precision.
    assert abs(ideal.energy_relation(v0, r, e0, 0.0)) < 1e-9


def test_eigen_energy_deep_lattice_limit():
    # For a very deep lattice, the band bottom approaches the harmonic
    # ground state of an isolated well and is far below the barrier top.
    v0, r = 1e4, 1.0
    e0 = ideal.eigen_energy(v0, r)
    assert e0 < 0.1 * v0


def test_eigen_energy_shallow_limit():
    # A vanishing lattice produces a vanishing band bottom.
    e0 = ideal.eigen_energy(1e-6, 1.0)
    assert e0 < 1e-6
