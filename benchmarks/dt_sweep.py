"""DMC time-step extrapolation sweep (BASELINE config #3).

Runs the DMC ground-state energy at several imaginary time steps and
extrapolates ``E(dt) -> E(0)`` linearly.  For a correct drift-diffusion
implementation the time-step bias is smooth and the extrapolated energy
must be bracketed by the ideal band bottom and the VMC variational
energy.

Run: ``python benchmarks/dt_sweep.py [--nop N] [--walkers W]``
"""
import argparse
import json
import time

import numpy as np


def run_dmc(spec, dt, target, max_w, blocks, nts, burn, seed=3):
    from phd_qmclib_tpu.samplers import dmc

    sampling = dmc.Sampling(spec, time_step=dt, max_num_walkers=max_w,
                            target_num_walkers=target, rng_seed=seed)
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(target)]).astype(np.float32)
    state = sampling.build_state(confs, dtype=np.float32)
    it = sampling.blocks(state, num_time_steps_block=nts,
                         burn_in_blocks=burn)
    for _ in range(burn):
        next(it)
    es = []
    for _ in range(blocks):
        b = next(it)
        es.append(float(np.asarray(b.iter_props.energy,
                                   dtype=np.float64).sum())
                  / float(np.asarray(b.iter_props.weight,
                                     dtype=np.float64).sum()))
    es = np.array(es)
    return es.mean(), es.std() / np.sqrt(len(es))


def run_fused(spec, dts, target, max_w, blocks, nts, burn):
    """All time steps as one vmap-fused sweep dispatch: ``time_step``
    is a runtime scalar leaf, so rows differing only in dt share the
    compiled block.  Burn-in is uniform at the SMALLEST dt's
    requirement — over-burning the large-dt rows is statistically
    harmless and costs no wall time (rows advance together anyway)."""
    from phd_qmclib_tpu.parallel.sweep import ParamSweep
    from phd_qmclib_tpu.samplers import dmc

    rows = tuple(
        dmc.Sampling(spec, time_step=dt, max_num_walkers=max_w,
                     target_num_walkers=target, rng_seed=3 + i)
        for i, dt in enumerate(dts))
    sweep = ParamSweep(rows)
    rng = np.random.default_rng(0)
    conf_sets = [np.stack([spec.init_get_sys_conf(rng=rng)
                           for _ in range(target)]).astype(np.float32)
                 for _ in rows]
    state = sweep.build_states(conf_sets, dtype=np.float32)
    it = sweep.blocks(state, nts, burn_in_blocks=burn)
    for _ in range(burn):
        next(it)
    es = []
    for _ in range(blocks):
        b = next(it)
        e = np.asarray(b.iter_props.energy, dtype=np.float64)
        w = np.asarray(b.iter_props.weight, dtype=np.float64)
        es.append(e.sum(axis=0) / w.sum(axis=0))
    es = np.array(es)  # (blocks, rows)
    return es.mean(axis=0), es.std(axis=0) / np.sqrt(len(es))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nop", type=int, default=32)
    parser.add_argument("--walkers", type=int, default=2048)
    parser.add_argument("--blocks", type=int, default=10)
    parser.add_argument("--nts", type=int, default=128)
    # Imaginary-time burn-in: equilibration of this gas takes tau ~ 3-4
    # (measured; a tau=0.4 burn biases energies high by ~0.03/boson).
    parser.add_argument("--burn-tau", type=float, default=4.0)
    parser.add_argument("--fused", action="store_true",
                        help="advance every dt as one fused sweep "
                             "dispatch (uniform burn at the smallest "
                             "dt's imaginary-time requirement)")
    args = parser.parse_args()

    from phd_qmclib_tpu.models import mrbp

    nop = args.nop
    spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=0.4)
    e0 = spec.obf_params.param_e0

    dts = [4e-3, 2e-3, 1e-3, 5e-4]
    results = []
    t0 = time.time()
    if args.fused:
        burn = max(2, int(round(args.burn_tau
                                / (min(dts) * args.nts))))
        means, errs = run_fused(spec, dts, args.walkers,
                                int(1.25 * args.walkers), args.blocks,
                                args.nts, burn)
        for dt, e, err in zip(dts, means, errs):
            results.append({"dt": dt, "energy_per_boson": e / nop,
                            "error": err / nop})
            print(json.dumps(results[-1]), flush=True)
    else:
        for dt in dts:
            # Burn time ~ fixed imaginary time: more blocks at
            # smaller dt.
            burn = max(2, int(round(args.burn_tau / (dt * args.nts))))
            e, err = run_dmc(spec, dt, args.walkers,
                             int(1.25 * args.walkers), args.blocks,
                             args.nts, burn)
            results.append({"dt": dt, "energy_per_boson": e / nop,
                            "error": err / nop})
            print(json.dumps(results[-1]), flush=True)

    # Weighted linear fit E(dt) = E0 + a dt with parameter covariance.
    from phd_qmclib_tpu.analysis import zero_limit_extrapolation

    x = np.array([r["dt"] for r in results])
    y = np.array([r["energy_per_boson"] for r in results])
    y_err = np.array([max(r["error"], 1e-12) for r in results])
    e_extrap, e_extrap_err, coeffs = zero_limit_extrapolation(x, y, y_err)
    print(json.dumps({
        "metric": "dmc_energy_dt_extrapolated",
        "value": e_extrap,
        "error": e_extrap_err,
        "unit": "energy/boson (UE)",
        "slope": float(coeffs[0]),
        "ideal_band_bottom": e0,
        "elapsed_s": time.time() - t0,
    }))


if __name__ == "__main__":
    main()
