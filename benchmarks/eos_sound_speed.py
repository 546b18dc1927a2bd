"""Thermodynamic consistency: sound speed from the equation of state
vs the Feynman phonon slope from S(k).

Two fully independent routes to the same observable, both measured by
this framework on hardware:

* **EOS route**: sweep the density ``n = N / L`` at fixed coupling via
  ``supercell_size`` rows of ONE fused ``SweepProc`` dispatch — and
  fold the time-step extrapolation into the SAME sweep (each density
  runs at two ``dt`` values as two more rows; the raw ``e(n)`` slope
  carries a dt bias that varies with the local coupling
  ``gamma(n) = gn / 2n`` and flattens the curvature, so the
  extrapolation is essential, not cosmetic).  Hydrodynamics gives
  ``c^2 = (n/m) d mu / d n`` with ``mu = d(n e)/dn``; in this
  codebase's units (``hbar = 1``, energies in ``hbar^2/(2m)``, i.e.
  ``m = 1/2``): ``c^2 = 2 n (2 e' + n e'')``.  Closed-form check in
  the Tonks-Girardeau limit: ``e = pi^2 n^2 / 3`` gives ``c = 2 pi n``,
  the exact TG value.
* **S(k) route**: each density row also measures the pure static
  structure factor; the ``k -> 0`` Feynman phonon slope
  (``SSFBlocks.sound_speed``) bounds the sound speed from above and is
  exact in the phonon limit.

No reference analog (the reference has neither observable); the
agreement of the two routes on the interacting gas is an end-to-end
validation of the energy pipeline AND the estimator pipeline at once.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/eos_sound_speed.py
"""
import argparse
import json

import numpy as np


def run_sweep(args, dts):
    """One fused sweep: len(lengths) x len(dts) rows."""
    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
    from phd_qmclib_tpu.qmc_exec.sweep import SweepProc

    nop = args.nop
    # Burn long enough for the SLOWEST-equilibrating row.
    burn = max(3, int(round(2.0 / (min(dts) * args.nts))))
    procs = tuple(
        dmc_exec.Proc(
            model_spec=mrbp.Spec(
                lattice_depth=0.0, lattice_ratio=1.0,
                interaction_strength=args.gn, boson_number=nop,
                supercell_size=float(sc),
                tbf_contact_cutoff=0.25 * float(sc)),
            time_step=float(dt),
            max_num_walkers=int(1.0625 * args.walkers),
            target_num_walkers=args.walkers, num_blocks=args.blocks,
            num_time_steps_block=args.nts, burn_in_blocks=burn,
            rng_seed=13 + 7 * i + j, verbose=False,
            ssf_spec=dmc_exec.SSFEstSpec(num_modes=args.modes,
                                         as_pure_est=True))
        for i, sc in enumerate(args.lengths)
        for j, dt in enumerate(dts))
    inputs = [dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), p)
        for p in procs]
    return SweepProc(procs).exec(inputs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nop", type=int, default=32)
    parser.add_argument("--walkers", type=int, default=8192)
    parser.add_argument("--nts", type=int, default=1024)
    parser.add_argument("--blocks", type=int, default=16)
    parser.add_argument("--dt", type=float, default=5e-4,
                        help="largest time step; a dt/4 row per "
                             "density feeds the dt->0 extrapolation")
    parser.add_argument("--gn", type=float, default=4.0)
    parser.add_argument("--modes", type=int, default=12)
    parser.add_argument("--lengths", type=float, nargs="+",
                        default=[48.0, 40.0, 34.5, 32.0, 29.0, 26.5,
                                 24.0])
    args = parser.parse_args()

    from phd_qmclib_tpu.analysis import zero_limit_extrapolation

    dts = [args.dt, args.dt / 4.0]
    results = run_sweep(args, dts)
    nop = args.nop
    ns, es, errs, c_feyn = [], [], [], []
    for i, sc in enumerate(args.lengths):
        row = {}
        for j, dt in enumerate(dts):
            res = results[len(dts) * i + j]
            e = res.data.blocks.energy
            row[dt] = (float(e.mean) / nop, float(e.mean_error) / nop)
        # dt -> 0, linear (two points: exact interpolation with
        # propagated errors).
        e0, e0_err, _ = zero_limit_extrapolation(
            np.asarray(dts), np.asarray([row[dt][0] for dt in dts]),
            np.asarray([row[dt][1] for dt in dts]), order=1)
        n = nop / sc
        ns.append(n), es.append(e0), errs.append(e0_err)
        # Feynman c from the small-dt row's pure S(k).
        ssf = results[len(dts) * i + 1].data.blocks.ss_factor
        c, c_err = ssf.sound_speed(nop, sc,
                                   num_modes=min(4, args.modes - 1))
        c_feyn.append((c, c_err))
        print(json.dumps({"L": sc, "n": n,
                          "e_raw_dt": row[dts[0]][0],
                          "e_raw_dt4": row[dts[1]][0],
                          "e_dt0": e0, "e_err": e0_err,
                          "c_feynman": c, "c_feynman_err": c_err}),
              flush=True)

    # EOS fit: weighted quadratic e(n); c^2 = 2 n (2 e' + n e'').
    ns, es, errs = map(np.asarray, (ns, es, errs))
    w = 1.0 / np.maximum(errs, 1e-12)
    coeffs, cov = np.polyfit(ns, es, 2, w=w, cov="unscaled")
    a2, a1, _ = coeffs
    n0 = float(np.median(ns))
    de = 2 * a2 * n0 + a1
    d2e = 2 * a2
    c2 = 2 * n0 * (2 * de + n0 * d2e)
    c_eos = float(np.sqrt(max(c2, 0.0)))
    g = np.array([12 * n0 ** 2, 4 * n0, 0.0])
    c2_err = float(np.sqrt(g @ cov @ g))
    c_eos_err = 0.5 * c2_err / max(c_eos, 1e-12)

    ic = int(np.argmin(np.abs(ns - n0)))
    c_f0, c_f0_err = c_feyn[ic]
    print(json.dumps({
        "n0": n0, "gn": args.gn, "gamma_at_n0": args.gn / (2 * n0),
        "c_eos": c_eos, "c_eos_err": c_eos_err,
        "c_feynman_at_n0": c_f0, "c_feynman_err": c_f0_err,
        "ratio": c_eos / c_f0,
        "consistent_2sigma": bool(
            abs(c_eos - c_f0) <= 2 * (c_eos_err + c_f0_err)),
        "c_tg_limit": 2 * np.pi * n0,
    }), flush=True)


if __name__ == "__main__":
    main()
