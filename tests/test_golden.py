"""Golden seeded-run regression guards.

Fixed-seed short runs pinned to the values produced by the validated
round-1 implementation (CPU, float64).  Loose tolerances absorb
jax-version RNG/compiler drift while still catching semantic changes to
the samplers (an algorithmic change shifts these by far more than 1e-6).
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.samplers import dmc, vmc

SPEC = dict(lattice_depth=10.0, lattice_ratio=1.0,
            interaction_strength=1.0, boson_number=5,
            supercell_size=5.0, tbf_contact_cutoff=0.3)

DMC_GOLDEN = [24.370807947678276, 24.4156397210833, 24.402008920698698]
VMC_GOLDEN_ENERGY = 24.830371739386564
VMC_GOLDEN_ACCEPT = 0.91796875


def test_dmc_seeded_block_energies():
    spec = mrbp.Spec(**SPEC)
    s = dmc.Sampling(spec, time_step=1e-3, max_num_walkers=64,
                     target_num_walkers=48, rng_seed=1234)
    rng = np.random.default_rng(99)
    confs = np.stack([spec.init_get_sys_conf(rng=rng) for _ in range(48)])
    state = s.build_state(confs)
    it = s.blocks(state, 32)
    for expected in DMC_GOLDEN:
        b = next(it)
        got = (float(np.asarray(b.iter_props.energy).sum())
               / float(np.asarray(b.iter_props.weight).sum()))
        assert got == pytest.approx(expected, rel=1e-6)


def test_vmc_seeded_block():
    spec = mrbp.Spec(**SPEC)
    rng = np.random.default_rng(99)
    # Consume the same 48 configs the DMC golden test draws so the VMC
    # inputs match the recording session.
    for _ in range(48):
        spec.init_get_sys_conf(rng=rng)
    sv = vmc.Sampling(spec, move_spread=0.25, rng_seed=1234,
                      num_walkers=8)
    stv = sv.build_state(
        np.stack([spec.init_get_sys_conf(rng=rng) for _ in range(8)]))
    bv = next(sv.blocks(64, stv))
    assert float(np.asarray(bv.iter_props.energy).mean()) == \
        pytest.approx(VMC_GOLDEN_ENERGY, rel=1e-6)
    assert bv.accept_rate == pytest.approx(VMC_GOLDEN_ACCEPT, abs=1e-9)
