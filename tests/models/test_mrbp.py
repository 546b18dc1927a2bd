"""mrbp model kernel tests.

Three independent lines of evidence validate the kernels:

1. A scalar, pure-Python oracle built directly from the physics (KP
   orbital, phonon pair function, minimum-image PBC) evaluated in f64.
2. Automatic differentiation identities: the drift must equal
   ``grad(log|psi|)`` and the local energy must equal
   ``-(tr H + |g|^2) + V`` with ``H, g`` the Hessian/gradient of
   ``log|psi|`` - this checks every analytic derivative at once.
3. Exact physical limits: the ideal gas local energy is ``N * e0`` at
   any configuration; ``n1(0) = 1``; ``rho_0 = N``.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp

V0, R, GN, NOP, SC_SIZE, RM = 20.0, 1.0, 1.5, 6, 6.0, 0.4


@pytest.fixture(scope="module")
def spec():
    return mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                     interaction_strength=GN, boson_number=NOP,
                     supercell_size=SC_SIZE, tbf_contact_cutoff=RM)


@pytest.fixture(scope="module")
def funcs(spec):
    return mrbp.core_funcs(spec)


@pytest.fixture(scope="module")
def pos(spec):
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.uniform(0, SC_SIZE, size=(NOP,)))


# ---------------------------------------------------------------------------
# Scalar oracle (pure Python, independent of the jnp implementation).
# ---------------------------------------------------------------------------

class Oracle:
    def __init__(self, spec: mrbp.Spec):
        self.spec = spec
        self.obf = spec.obf_params
        self.tbf = spec.tbf_params

    def min_image(self, dz):
        L = self.spec.supercell_size
        half = 0.5 * L
        if abs(dz) > half:
            return -half + (dz + half) % L
        return dz

    def f1(self, z):
        o = self.obf
        zc = z % 1.0
        za, zb = o.well_width, o.barrier_width
        if za < zc:
            return math.cosh(o.param_kp1 * (zc - 1.0 + 0.5 * zb))
        cf = math.sqrt(1 + o.lattice_depth / o.param_e0
                       * math.sinh(0.5 * math.sqrt(
                           o.lattice_depth - o.param_e0) * zb) ** 2)
        return cf * math.cos(o.param_k1 * (zc - 0.5 * za))

    def f1_ldz(self, z):
        o = self.obf
        zc = z % 1.0
        za, zb = o.well_width, o.barrier_width
        if za < zc:
            return o.param_kp1 * math.tanh(o.param_kp1 * (zc - 1.0 + 0.5 * zb))
        return -o.param_k1 * math.tan(o.param_k1 * (zc - 0.5 * za))

    def f1_d2(self, z):
        o = self.obf
        zc = z % 1.0
        return (o.lattice_depth - o.param_e0 if o.well_width < zc
                else -o.param_e0)

    def f2(self, r):
        tb = self.tbf
        if r < abs(tb.tbf_contact_cutoff):
            return tb.param_am * math.cos(tb.param_k2 * (r - tb.param_r_off))
        return math.sin(math.pi * r / tb.supercell_size) ** tb.param_beta

    def f2_ldz(self, r):
        tb = self.tbf
        if r < abs(tb.tbf_contact_cutoff):
            return -tb.param_k2 * math.tan(tb.param_k2 * (r - tb.param_r_off))
        return (math.pi / tb.supercell_size) * tb.param_beta \
            / math.tan(math.pi * r / tb.supercell_size)

    def f2_d2(self, r):
        tb = self.tbf
        if r < abs(tb.tbf_contact_cutoff):
            return -tb.param_k2 ** 2
        u = math.pi / tb.supercell_size
        return u ** 2 * tb.param_beta * (
            (tb.param_beta - 1) / math.tan(u * r) ** 2 - 1)

    def potential(self, z):
        sp = self.spec
        n_cell, zc = divmod(z, 1.0)
        v = sp.defect_magnitude if (n_cell % sp.defects_sep) == 0 \
            else sp.lattice_depth
        return v if sp.well_width < zc else 0.0

    def log_psi(self, pos):
        total = sum(math.log(abs(self.f1(z))) for z in pos)
        n = len(pos)
        for i in range(n):
            for j in range(i + 1, n):
                r = abs(self.min_image(pos[i] - pos[j]))
                total += math.log(abs(self.f2(r)))
        return total

    def drift(self, pos):
        n = len(pos)
        out = []
        for i in range(n):
            d = self.f1_ldz(pos[i])
            for j in range(n):
                if j == i:
                    continue
                dz = self.min_image(pos[i] - pos[j])
                d += math.copysign(1.0, dz) * self.f2_ldz(abs(dz))
            out.append(d)
        return np.array(out)

    def energy(self, pos):
        n = len(pos)
        drift = self.drift(pos)
        kin = 0.0
        pot = 0.0
        for i in range(n):
            kin += -self.f1_d2(pos[i]) + self.f1_ldz(pos[i]) ** 2
            pot += self.potential(pos[i])
            for j in range(n):
                if j == i:
                    continue
                r = abs(self.min_image(pos[i] - pos[j]))
                kin += -self.f2_d2(r) + self.f2_ldz(r) ** 2
        return kin - float(drift @ drift) + pot


# ---------------------------------------------------------------------------


class TestAgainstOracle:

    def test_log_psi(self, spec, funcs, pos):
        oracle = Oracle(spec)
        ours = float(funcs.log_psi(pos, spec.cfc_params))
        ref = oracle.log_psi(np.asarray(pos))
        assert ours == pytest.approx(ref, rel=1e-12)

    def test_drift(self, spec, funcs, pos):
        oracle = Oracle(spec)
        ours = np.asarray(funcs.drift(pos, spec.cfc_params))
        ref = oracle.drift(np.asarray(pos))
        np.testing.assert_allclose(ours, ref, rtol=1e-12)

    def test_energy_and_fusion(self, spec, funcs, pos):
        oracle = Oracle(spec)
        e, d = funcs.energy_and_drift(pos, spec.cfc_params)
        assert float(e) == pytest.approx(oracle.energy(np.asarray(pos)),
                                         rel=1e-12)
        np.testing.assert_allclose(np.asarray(d),
                                   oracle.drift(np.asarray(pos)), rtol=1e-12)
        assert float(funcs.energy(pos, spec.cfc_params)) == pytest.approx(
            float(e))

    def test_batched_evaluation(self, spec, funcs):
        rng = np.random.default_rng(11)
        batch = jnp.asarray(rng.uniform(0, SC_SIZE, size=(4, 3, NOP)))
        lp = funcs.log_psi(batch, spec.cfc_params)
        assert lp.shape == (4, 3)
        e, d = funcs.energy_and_drift(batch, spec.cfc_params)
        assert e.shape == (4, 3) and d.shape == (4, 3, NOP)
        oracle = Oracle(spec)
        assert float(lp[2, 1]) == pytest.approx(
            oracle.log_psi(np.asarray(batch[2, 1])), rel=1e-12)


class TestAutodiffIdentities:

    def test_drift_is_grad_log_psi(self, spec, funcs, pos):
        cfc = spec.cfc_params
        grad = jax.grad(lambda p: funcs.log_psi(p, cfc))(pos)
        np.testing.assert_allclose(np.asarray(funcs.drift(pos, cfc)),
                                   np.asarray(grad), rtol=1e-9)

    @pytest.mark.slow
    def test_energy_is_minus_laplacian_plus_potential(self, spec, funcs,
                                                      pos):
        # Full-tier: the hessian trace is the slowest single compile in
        # the model suite; the fast tier keeps drift==grad here plus
        # the replay kernel-agreement and golden-energy gates.
        cfc = spec.cfc_params
        f = lambda p: funcs.log_psi(p, cfc)  # noqa: E731
        g = jax.grad(f)(pos)
        h = jax.hessian(f)(pos)
        pot = mrbp._make_potential(spec.defects_sep)(pos, cfc).sum()
        expected = -(jnp.trace(h) + (g ** 2).sum()) + pot
        ours = funcs.energy(pos, cfc)
        assert float(ours) == pytest.approx(float(expected), rel=1e-9)


class TestPhysicalLimits:

    def test_ideal_gas_energy_is_exact(self):
        spec = mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                         interaction_strength=0.0, boson_number=NOP,
                         supercell_size=SC_SIZE, tbf_contact_cutoff=RM)
        assert spec.is_ideal and not spec.is_free
        funcs = mrbp.core_funcs(spec)
        rng = np.random.default_rng(3)
        pos = jnp.asarray(rng.uniform(0, SC_SIZE, size=(10, NOP)))
        e = funcs.energy(pos, spec.cfc_params)
        e0 = spec.obf_params.param_e0
        np.testing.assert_allclose(np.asarray(e), NOP * e0, rtol=1e-10)

    def test_free_gas(self, pos):
        spec = mrbp.Spec(lattice_depth=0.0, lattice_ratio=R,
                         interaction_strength=GN, boson_number=NOP,
                         supercell_size=SC_SIZE, tbf_contact_cutoff=RM)
        assert spec.is_free and not spec.is_ideal
        funcs = mrbp.core_funcs(spec)
        oracle = Oracle(spec)
        # Free system: only the two-body part contributes.
        ref = sum(math.log(abs(oracle.f2(abs(oracle.min_image(
            float(pos[i]) - float(pos[j]))))))
            for i in range(NOP) for j in range(i + 1, NOP))
        assert float(funcs.log_psi(pos, spec.cfc_params)) == pytest.approx(
            ref, rel=1e-12)

    def test_delta_log_psi_move(self, spec, funcs, pos):
        cfc = spec.cfc_params
        k, dz = 2, 0.37
        delta = funcs.delta_log_psi_move(k, dz, pos, cfc)
        moved = pos.at[k].add(dz)
        expected = funcs.log_psi(moved, cfc) - funcs.log_psi(pos, cfc)
        assert float(delta) == pytest.approx(float(expected), rel=1e-10)

    def test_obd_at_zero_shift_is_one(self, spec, funcs, pos):
        obd = funcs.one_body_density(0.0, pos, spec.cfc_params)
        assert float(obd) == pytest.approx(1.0, rel=1e-12)

    def test_fourier_density_at_zero_momentum(self, spec, funcs, pos):
        kz = jnp.array([0.0, 2 * np.pi / SC_SIZE])
        rho = funcs.fourier_density(kz, pos, spec.cfc_params)
        assert complex(rho[0]) == pytest.approx(NOP + 0j)
        parts = funcs.fourier_density_parts(kz, pos, spec.cfc_params)
        assert parts.shape == (2, 3)
        assert float(parts[0, 0]) == pytest.approx(NOP ** 2)

    @pytest.mark.parametrize("num_modes", [1, 2, 3, 9])
    def test_fourier_harmonics_match_general(self, spec, funcs, pos,
                                             num_modes):
        # The Chebyshev-recurrence path must reproduce the direct
        # evaluation at the harmonic momenta k_j = 2 pi j / L.
        kz = jnp.asarray(np.arange(num_modes) * 2 * np.pi / SC_SIZE)
        general = funcs.fourier_density_parts(kz, pos, spec.cfc_params)
        harmonics = funcs.fourier_density_parts_harmonics(
            num_modes, pos, spec.cfc_params)
        np.testing.assert_allclose(np.asarray(harmonics),
                                   np.asarray(general),
                                   rtol=1e-9, atol=1e-9)
        # Batched shapes too.
        batch = jnp.stack([pos, pos + 0.37])
        hb = funcs.fourier_density_parts_harmonics(num_modes, batch,
                                                   spec.cfc_params)
        gb = funcs.fourier_density_parts(kz, batch, spec.cfc_params)
        np.testing.assert_allclose(np.asarray(hb), np.asarray(gb),
                                   rtol=1e-9, atol=1e-9)


class TestSpecValidation:

    def test_rm_out_of_domain(self):
        with pytest.raises(ValueError, match="rm"):
            mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                      interaction_strength=GN, boson_number=NOP,
                      supercell_size=SC_SIZE,
                      tbf_contact_cutoff=0.6 * SC_SIZE)

    def test_defect_validation(self):
        with pytest.raises(ValueError, match="equal defect spacings"):
            mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                      interaction_strength=GN, boson_number=NOP,
                      supercell_size=SC_SIZE, tbf_contact_cutoff=RM,
                      num_defects=5, defect_magnitude=1.0)
        with pytest.raises(ValueError, match="magnitude"):
            mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                      interaction_strength=GN, boson_number=NOP,
                      supercell_size=SC_SIZE, tbf_contact_cutoff=RM,
                      num_defects=2, defect_magnitude=2 * V0)

    def test_defects_potential(self):
        spec = mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                         interaction_strength=GN, boson_number=NOP,
                         supercell_size=SC_SIZE, tbf_contact_cutoff=RM,
                         num_defects=2, defect_magnitude=5.0)
        assert spec.defects_sep == 3
        pot = mrbp._make_potential(spec.defects_sep)
        cfc = spec.cfc_params
        z_barrier = 0.9  # inside the barrier of cell 0 (a defect site)
        assert float(pot(jnp.array(z_barrier), cfc)) == pytest.approx(5.0)
        assert float(pot(jnp.array(1.9), cfc)) == pytest.approx(V0)
        assert float(pot(jnp.array(3.9), cfc)) == pytest.approx(5.0)
        assert float(pot(jnp.array(0.2), cfc)) == pytest.approx(0.0)

    def test_evolve_changes_tbf(self, spec):
        spec2 = spec.evolve(tbf_contact_cutoff=0.8)
        assert spec2.tbf_contact_cutoff == 0.8
        assert spec2.tbf_params.param_k2 != spec.tbf_params.param_k2


class TestFastPathPolynomials:
    """Pin the f32 fast-path approximations against exact f64 trig.

    The forward hot path evaluates tan/cot via the rational
    ``_tancot_poly32`` and the log path sin/cos via ``_sincos_poly32``;
    these bounds are the measured accuracy the kernels rely on (see
    docs/DESIGN.md section 7).  A coefficient regression shows up here
    before it can bias physics."""

    def test_tancot_rational_accuracy(self):
        x64 = np.linspace(1e-9, np.pi / 2, 200_001)[:-1]
        x = jnp.asarray(x64, dtype=jnp.float32)
        num, den = mrbp._tancot_poly32(x)
        tan = np.tan(x64)
        v = np.asarray(num, dtype=np.float64) / np.asarray(
            den, dtype=np.float64)
        cot_v = 1.0 / v
        small = np.abs(tan) < 10
        rel = np.abs(v[small] / tan[small] - 1)
        assert rel.max() < 2e-6  # measured 1.44e-6
        cot_abs = np.abs(cot_v[~small] - 1 / tan[~small])
        assert cot_abs.max() < 3e-7  # measured 1.6e-7

    def test_sincos_poly_accuracy(self):
        x64 = np.linspace(-np.pi / 2, np.pi / 2, 200_001)
        x = jnp.asarray(x64, dtype=jnp.float32)
        s, c = mrbp._sincos_poly32(x)
        assert np.abs(np.asarray(s, dtype=np.float64)
                      - np.sin(x64)).max() < 3e-7
        assert np.abs(np.asarray(c, dtype=np.float64)
                      - np.cos(x64)).max() < 3e-7

    def test_f32_fast_path_matches_f64_kernel(self):
        # End-to-end: the f32 forward fast path (rational tan) against
        # the exact-library f64 evaluation of the same pair terms.
        spec = mrbp.Spec(lattice_depth=V0, lattice_ratio=R,
                         interaction_strength=GN, boson_number=NOP,
                         supercell_size=SC_SIZE,
                         tbf_contact_cutoff=RM)
        funcs = mrbp.core_funcs(spec)
        rng = np.random.default_rng(11)
        pos64 = jnp.asarray(rng.uniform(0, SC_SIZE, size=(16, NOP)))
        cfc64 = spec.cfc_params
        e64, d64 = funcs.energy_and_drift(pos64, cfc64)
        pos32 = jnp.asarray(np.asarray(pos64), dtype=jnp.float32)
        cfc32 = jax.tree.map(jnp.float32, cfc64)
        e32, d32 = funcs.energy_and_drift(pos32, cfc32)
        np.testing.assert_allclose(np.asarray(e32), np.asarray(e64),
                                   rtol=5e-5)
        np.testing.assert_allclose(np.asarray(d32), np.asarray(d64),
                                   rtol=1e-3, atol=5e-4)
