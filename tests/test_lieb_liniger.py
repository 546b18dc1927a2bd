"""Exact Lieb-Liniger oracle: solver correctness against every known
closed-form limit, internal thermodynamic consistency, and the pinned
value at the chip validation point (gamma = 2)."""
import numpy as np
import pytest

from phd_qmclib_tpu import lieb_liniger as ll


def test_tonks_girardeau_limit():
    # e -> pi^2/3 and c -> v_F = 2 pi n as gamma -> inf.
    e = ll.ground_state_energy(1e5, num_points=256)
    assert e == pytest.approx(np.pi ** 2 / 3, rel=2e-4)
    gs = ll.ground_state(1e5, num_points=256)
    assert gs["sound_speed"] == pytest.approx(2 * np.pi, rel=2e-4)
    assert gs["luttinger_k"] == pytest.approx(1.0, rel=2e-4)


def test_bogoliubov_limit():
    # e -> gamma (1 - 4 sqrt(gamma) / (3 pi)) and
    # c -> 2 n sqrt(gamma) (1 - sqrt(gamma)/(2 pi))^(1/2) at small
    # gamma (next-order weak-coupling expansions).
    g = 0.01
    e = ll.ground_state_energy(g, num_points=256)
    assert e == pytest.approx(g * (1 - 4 * np.sqrt(g) / (3 * np.pi)),
                              rel=1e-3)
    c = ll.sound_speed(g, num_points=256)
    c_weak = 2 * np.sqrt(g) * np.sqrt(1 - np.sqrt(g) / (2 * np.pi))
    assert c == pytest.approx(c_weak, rel=1e-4)


def test_chip_point_gamma_two_pinned():
    """The v0 = 0, gn = 4, n = 1 chip point (gamma = 2): values pinned
    from a 1024-point run cross-checked by an independent
    fixed-coupling density-derivative route (agreement 4e-8)."""
    gs = ll.ground_state(2.0, num_points=256)
    assert gs["e"] == pytest.approx(1.050321, abs=2e-5)
    assert gs["sound_speed"] == pytest.approx(2.490588, abs=2e-5)
    assert gs["mu"] == pytest.approx(2.456471, abs=2e-5)
    assert gs["luttinger_k"] == pytest.approx(2.522772, abs=5e-5)
    # Single-phonon-pole sum rules in these units (f-sum m1 = k^2):
    # S(k -> 0) = k/c (checked at TG: k/(2 k_F) with c = 2 pi n) and
    # chi(k -> 0) = -2 m_{-1} = -2/c^2.
    assert gs["ssf_slope"] == pytest.approx(1 / gs["sound_speed"])
    assert gs["chi_k0"] == pytest.approx(
        -2 / gs["sound_speed"] ** 2)


def test_density_scaling():
    # Galilean scale invariance: c(gamma, n) = n c(gamma, 1),
    # e(gamma, n) = n^2 e(gamma, 1), mu likewise.
    a = ll.ground_state(2.0, density=1.0, num_points=256)
    b = ll.ground_state(2.0, density=2.0, num_points=256)
    assert b["sound_speed"] == pytest.approx(2 * a["sound_speed"])
    assert b["e"] == pytest.approx(4 * a["e"])
    assert b["mu"] == pytest.approx(4 * a["mu"])
    assert b["luttinger_k"] == pytest.approx(a["luttinger_k"])


def test_thermodynamic_consistency_mu():
    # mu = d(n^3 e(gamma(n)))/dn at fixed coupling: compare the
    # gamma-derivative closed form against a direct FD in n.
    c_ll, n0, dn = 1.0, 1.0, 1e-4

    def eps_density(n):
        gamma = c_ll / n
        return n ** 3 * ll.ground_state_energy(gamma, num_points=256)

    mu_fd = (eps_density(n0 + dn) - eps_density(n0 - dn)) / (2 * dn)
    mu = ll.ground_state(c_ll / n0, density=n0,
                         num_points=256)["mu"]
    assert mu == pytest.approx(mu_fd, rel=1e-5)


def test_invalid_coupling_rejected():
    with pytest.raises(ValueError, match="repulsive"):
        ll.ground_state_energy(0.0)
