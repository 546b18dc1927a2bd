"""CPU reference-throughput proxy.

The reference implementation (oarodriguez/PhD-QMCLib) is numba-jitted
CPU code; numba is not available in this image, so the reference cannot
be executed directly.  This module implements the *same algorithm* -
the reference's per-step DMC pipeline (stochastic comb branching, parent
cloning, drift-diffusion, fused O(N^2) local energy + drift of the mrbp
Bijl-Jastrow model, reference-energy update) - in vectorized NumPy, and
times it on the host CPU.

Vectorized NumPy over (walkers x pairs) is a competitive stand-in for
numba's per-walker compiled loops on one core; the reference
additionally parallelizes over cores with ``numba.prange``
(``qmc_base/jastrow/dmc.py:892``), so the per-core proxy number is
multiplied by an assumed core count to produce a *generous* estimate of
full-machine reference throughput (see BASELINE.md).

Run: ``python benchmarks/cpu_reference_proxy.py [--walkers W] [--nop N]``
"""
import argparse
import json
import time

import numpy as np

# Make the mrbp derived parameters available without importing jax.
from phd_qmclib_tpu.models import mrbp  # noqa: E402


def make_params(nop: int):
    spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=0.4)
    return spec


def energy_and_drift_numpy(pos: np.ndarray, spec: mrbp.Spec):
    """Fused local energy + drift, vectorized NumPy (f64 like the
    reference)."""
    obf = spec.obf_params
    tbf = spec.tbf_params
    L = spec.supercell_size
    v0, e0 = obf.lattice_depth, obf.param_e0
    k1, kp1 = obf.param_k1, obf.param_kp1
    z_a, z_b = obf.well_width, obf.barrier_width

    # One-body terms.
    z_cell = np.mod(pos, 1.0)
    in_barrier = z_a < z_cell
    ob_ldz = np.where(in_barrier,
                      kp1 * np.tanh(kp1 * (z_cell - 1.0 + 0.5 * z_b)),
                      -k1 * np.tan(k1 * (z_cell - 0.5 * z_a)))
    ob_d2 = np.where(in_barrier, v0 - e0, -e0)
    pot = np.where(in_barrier, v0, 0.0)

    # Pairwise terms.
    d = pos[..., :, None] - pos[..., None, :]
    half = 0.5 * L
    d = np.where(np.abs(d) > half, -half + np.mod(d + half, L), d)
    r = np.abs(d)
    nop = pos.shape[-1]
    off = ~np.eye(nop, dtype=bool)
    rm, k2 = tbf.tbf_contact_cutoff, tbf.param_k2
    beta, r_off = tbf.param_beta, tbf.param_r_off
    r_safe = np.where(off, r, 0.25 * L)
    inside = r_safe < abs(rm)
    r_out = np.where(inside, abs(rm), r_safe)
    tb_ldz = np.where(inside, -k2 * np.tan(k2 * (r_safe - r_off)),
                      (np.pi / L) * beta / np.tan(np.pi * r_out / L))
    tan_o = np.tan(np.pi * r_out / L)
    tb_d2 = np.where(inside, -k2 * k2,
                     (np.pi / L) ** 2 * beta
                     * ((beta - 1) / tan_o ** 2 - 1))

    sgn = np.where(d >= 0, 1.0, -1.0)
    drift = ob_ldz + np.where(off, tb_ldz * sgn, 0.0).sum(axis=-1)
    kin = (-ob_d2 + ob_ldz ** 2).sum(axis=-1) \
        + np.where(off, -tb_d2 + tb_ldz ** 2, 0.0).sum(axis=(-1, -2))
    energy = kin - (drift ** 2).sum(axis=-1) + pot.sum(axis=-1)
    return energy, drift


def dmc_step_numpy(rng, pos, drift, energy, weight, num, e_ref, dt, spec,
                   max_w):
    """One reference-algorithm DMC step (comb -> clone -> diffuse)."""
    # Stochastic comb (qmc_base/dmc.py:621-653).
    u = rng.random(num)
    clones = np.floor(weight[:num] + u).astype(np.int64)
    parents = np.repeat(np.arange(num), clones)[:max_w]
    new_num = len(parents)
    cpos, cdrift, cenergy = pos[parents], drift[parents], energy[parents]
    # Drift-diffusion (jastrow/dmc.py:633-827).
    sigma = np.sqrt(2 * dt)
    xi = rng.normal(0.0, sigma, size=cpos.shape)
    npos = np.mod(cpos + 2 * cdrift * dt + xi, spec.supercell_size)
    nenergy, ndrift = energy_and_drift_numpy(npos, spec)
    nweight = np.exp(-dt * (0.5 * (nenergy + cenergy) - e_ref))
    return npos, ndrift, nenergy, nweight, new_num, cenergy.sum()


def measure(nop: int, num_walkers: int, num_steps: int = 20,
            dt: float = 1e-3, seed: int = 0):
    spec = make_params(nop)
    rng = np.random.default_rng(seed)
    max_w = int(1.25 * num_walkers)
    pos = rng.uniform(0, spec.supercell_size, size=(num_walkers, nop))
    energy, drift = energy_and_drift_numpy(pos, spec)
    weight = np.ones(num_walkers)
    e_ref = energy.mean()
    num = num_walkers
    target = num_walkers

    # Warm up one step.
    pos, drift, energy, weight, num, esum = dmc_step_numpy(
        rng, pos, drift, energy, weight, num, e_ref, dt, spec, max_w)

    total_wsteps = 0
    t0 = time.perf_counter()
    total_e = total_w = 0.0
    for _ in range(num_steps):
        pos, drift, energy, weight, num, esum = dmc_step_numpy(
            rng, pos, drift, energy, weight, num, e_ref, dt, spec, max_w)
        total_wsteps += num
        total_e += esum
        total_w += num
        e_ref = total_e / total_w - 0.5 * np.log(num / target) / dt
    elapsed = time.perf_counter() - t0
    return total_wsteps / elapsed




def log_psi_numpy(pos: np.ndarray, spec: mrbp.Spec):
    """Bijl-Jastrow log |psi| (constants dropped - Metropolis ratios
    only), vectorized NumPy; same branch structure as the reference
    (``qmc_base/jastrow/model.py`` one/two-body functions)."""
    obf = spec.obf_params
    tbf = spec.tbf_params
    L = spec.supercell_size
    k1, kp1 = obf.param_k1, obf.param_kp1
    z_a, z_b = obf.well_width, obf.barrier_width

    z_cell = np.mod(pos, 1.0)
    in_barrier = z_a < z_cell
    ob = np.where(in_barrier,
                  np.log(np.cosh(kp1 * (z_cell - 1.0 + 0.5 * z_b))),
                  np.log(np.abs(np.cos(k1 * (z_cell - 0.5 * z_a)))))

    d = pos[..., :, None] - pos[..., None, :]
    half = 0.5 * L
    d = np.where(np.abs(d) > half, -half + np.mod(d + half, L), d)
    r = np.abs(d)
    nop = pos.shape[-1]
    off = ~np.eye(nop, dtype=bool)
    rm, k2 = tbf.tbf_contact_cutoff, tbf.param_k2
    beta, r_off = tbf.param_beta, tbf.param_r_off
    r_safe = np.where(off, r, 0.25 * L)
    inside = r_safe < abs(rm)
    tb = np.where(inside,
                  np.log(np.abs(np.cos(k2 * (r_safe - r_off)))),
                  beta * np.log(np.abs(np.sin(np.pi * r_safe / L))))
    return ob.sum(axis=-1) + 0.5 * np.where(off, tb, 0.0).sum(
        axis=(-1, -2))


def measure_vmc(nop: int, num_chains: int, num_steps: int = 20,
                move_spread: float = 0.4, seed: int = 0):
    """Reference-algorithm VMC rate: full-configuration uniform
    displacement + Metropolis accept per chain, one O(N^2) pair pass
    per step (``qmc_base/vmc.py:400-415, 636``)."""
    spec = make_params(nop)
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, spec.supercell_size, size=(num_chains, nop))
    lp = log_psi_numpy(pos, spec)

    # Warm-up.
    for _ in range(2):
        prop = np.mod(pos + rng.uniform(-move_spread, move_spread,
                                        size=pos.shape),
                      spec.supercell_size)
        lp_prop = log_psi_numpy(prop, spec)
        accept = lp_prop > 0.5 * np.log(rng.random(num_chains)) + lp
        pos = np.where(accept[:, None], prop, pos)
        lp = np.where(accept, lp_prop, lp)

    t0 = time.perf_counter()
    for _ in range(num_steps):
        prop = np.mod(pos + rng.uniform(-move_spread, move_spread,
                                        size=pos.shape),
                      spec.supercell_size)
        lp_prop = log_psi_numpy(prop, spec)
        accept = lp_prop > 0.5 * np.log(rng.random(num_chains)) + lp
        pos = np.where(accept[:, None], prop, pos)
        lp = np.where(accept, lp_prop, lp)
    elapsed = time.perf_counter() - t0
    return num_chains * num_steps / elapsed


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--nop", type=int, default=128)
    parser.add_argument("--walkers", type=int, default=512)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--vmc", action="store_true",
                        help="measure the VMC (Metropolis) proxy")
    args = parser.parse_args()
    if args.vmc:
        rate = measure_vmc(args.nop, args.walkers, args.steps)
        metric = "cpu_reference_proxy_vmc_chain_steps_per_sec_per_core"
        unit = "chain-steps/s/core"
    else:
        rate = measure(args.nop, args.walkers, args.steps)
        metric = "cpu_reference_proxy_walker_steps_per_sec_per_core"
        unit = "walker-steps/s/core"
    print(json.dumps({
        "metric": metric,
        "nop": args.nop,
        "walkers": args.walkers,
        "value": rate,
        "unit": unit,
    }))
