"""Pure (forward-walking) vs mixed estimators + population-control bias
check (BASELINE config #4).

1. Runs DMC twice with S(k) and density estimators - once mixed, once
   pure - and reports both.  The pure estimator removes the O(psi_T)
   mixed-estimator bias; for S(k) of this gas the two must be close but
   not identical, and both must satisfy the exact sum rules.
2. Population-control bias: runs the same physics at two target
   population sizes; the growth energies must agree within errors
   (the E_ref log-penalty bias scales as 1/N_w).

Run: ``python benchmarks/pure_vs_mixed.py``
"""
import argparse
import json
import time

import numpy as np


def run(spec, target, pure: bool, blocks, nts, num_modes=8, seed=5):
    from phd_qmclib_tpu.samplers import dmc

    sampling = dmc.Sampling(
        spec, time_step=1e-3, max_num_walkers=int(1.25 * target),
        target_num_walkers=target, rng_seed=seed,
        density_est_spec=dmc.DensityEstSpec(num_bins=32, as_pure_est=pure,
                                            pfw_num_time_steps=nts),
        ssf_est_spec=dmc.SSFEstSpec(num_modes=num_modes, as_pure_est=pure,
                                    pfw_num_time_steps=nts))
    rng = np.random.default_rng(1)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(target)]).astype(np.float32)
    state = sampling.build_state(confs, dtype=np.float32)
    burn = max(3, int(round(4.0 / (1e-3 * nts))))
    it = sampling.blocks(state, num_time_steps_block=nts,
                         burn_in_blocks=burn)
    for _ in range(burn):
        next(it)
    e_blocks, w_blocks = [], []
    ssf_tot = None
    dens_tot = None
    w_est = 0.0
    for _ in range(blocks):
        b = next(it)
        e_blocks.append(float(np.asarray(b.iter_props.energy,
                                         dtype=np.float64).sum()))
        w_blocks.append(float(np.asarray(b.iter_props.weight,
                                         dtype=np.float64).sum()))
        ssf = np.asarray(b.iter_ssf, dtype=np.float64)
        dens = np.asarray(b.iter_density, dtype=np.float64)
        nw = np.asarray(b.iter_props.num_walkers, dtype=np.float64)
        if pure:
            # The fully-forward-walked value is the block's last step.
            ssf_c, dens_c, w_c = ssf[-1], dens[-1], nw[-1]
        else:
            ssf_c, dens_c, w_c = ssf.sum(0), dens.sum(0), nw.sum()
        ssf_tot = ssf_c if ssf_tot is None else ssf_tot + ssf_c
        dens_tot = dens_c if dens_tot is None else dens_tot + dens_c
        w_est += w_c
    e_arr, w_arr = np.array(e_blocks), np.array(w_blocks)
    e_per_n = e_arr.sum() / w_arr.sum() / spec.boson_number
    e_err = (e_arr / w_arr / spec.boson_number).std() / np.sqrt(blocks)
    # S(k) = (<|rho|^2> - <Re>^2 - <Im>^2) / N
    parts = ssf_tot / w_est
    s_k = (parts[:, 0] - parts[:, 1] ** 2 - parts[:, 2] ** 2) \
        / spec.boson_number
    density = dens_tot / w_est
    return e_per_n, e_err, s_k, density


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nop", type=int, default=64)
    parser.add_argument("--walkers", type=int, default=4096)
    parser.add_argument("--blocks", type=int, default=8)
    parser.add_argument("--nts", type=int, default=128)
    args = parser.parse_args()

    from phd_qmclib_tpu.models import mrbp

    nop = args.nop
    spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=0.4)
    t0 = time.time()

    e_mixed, err_m, sk_mixed, dens_mixed = run(
        spec, args.walkers, False, args.blocks, args.nts)
    e_pure, err_p, sk_pure, dens_pure = run(
        spec, args.walkers, True, args.blocks, args.nts)
    print(json.dumps({
        "e_mixed": e_mixed, "e_mixed_err": err_m,
        "e_pure_run": e_pure, "e_pure_err": err_p,
        "sk_mixed": list(np.round(sk_mixed, 5)),
        "sk_pure": list(np.round(sk_pure, 5)),
        "density_sum_mixed": float(dens_mixed.sum()),
        "density_sum_pure": float(dens_pure.sum()),
    }), flush=True)

    # Population-control bias: half vs full population.
    e_half, err_h, _, _ = run(spec, args.walkers // 4, False,
                              args.blocks, args.nts)
    print(json.dumps({
        "metric": "population_control_bias",
        "e_full_pop": e_mixed, "e_quarter_pop": e_half,
        "combined_err": float(np.hypot(err_m, err_h)),
        "bias_sigmas": float(abs(e_mixed - e_half)
                             / max(np.hypot(err_m, err_h), 1e-12)),
        "elapsed_s": time.time() - t0,
    }))


if __name__ == "__main__":
    main()
