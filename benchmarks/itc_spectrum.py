"""Excitation spectrum from the imaginary-time correlation F(k, tau).

Measures the intermediate-scattering-function estimator (``itc_spec``)
and extracts the effective excitation energies
``omega_eff(k, tau) = -d ln F / d tau`` — tau-dependent UPPER bounds on
the lowest excitation at each k that start at the Feynman bound
``k^2 N / S(k)`` (enforced by the f-sum rule) and tighten as tau grows.
Validation targets:

* **Tonks-Girardeau point** (``--tg``): density correlations map to
  free fermions exactly, so every F(k, tau) is a known particle-hole
  sum — the measured omega_eff must land on the exact multi-channel
  decay (the same gate ``tests/samplers/test_itc.py`` runs on tiny
  shapes; here at production scale on the chip).
* **Phonon regime** (default): omega_eff(k, tau_max) must undercut
  (or match within noise) the same run's Feynman bound k^2/S(k) at
  every k — the single-mode approximation is exact only where one
  excitation exhausts the f-sum.  A small-k sound-speed read-off is
  also printed but needs ``omega_1 * tau_max >~ 1`` to converge
  (long-lag runs); at short tau_max it overshoots toward the f-sum
  average, by design.

No reference analog (the reference has no two-time observables).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/itc_spectrum.py
"""
import argparse
import json

import numpy as np


def measure(v0, gn, nop, walkers, nts, blocks, dt, est_every,
            num_modes, num_lags, seed=7, rm=0.3, burn=4,
            regular_init=False):
    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.samplers import dmc

    spec = mrbp.Spec(lattice_depth=v0, lattice_ratio=1.0,
                     interaction_strength=gn, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=rm)
    sampling = dmc.Sampling(
        spec, time_step=dt, max_num_walkers=walkers + walkers // 8,
        target_num_walkers=walkers, rng_seed=seed, est_every=est_every,
        ssf_est_spec=dmc.SSFEstSpec(num_modes=num_modes,
                                    as_pure_est=False),
        itc_est_spec=dmc.ITCEstSpec(num_modes=num_modes,
                                    num_lags=num_lags))
    rng = np.random.default_rng(1)
    if regular_init:
        # Crystal-like start: the long-wavelength density modes relax
        # slowly (1/omega_1 can exceed the burn window for a random
        # start), so begin near the ordered configuration.
        confs = np.stack([
            spec.init_get_sys_conf(dist_type=mrbp.DIST_REGULAR,
                                   offset=rng.uniform(0, nop))
            for _ in range(walkers)]).astype(np.float32)
    else:
        confs = np.stack([spec.init_get_sys_conf(rng=rng)
                          for _ in range(walkers)]).astype(np.float32)
    state = sampling.build_state(confs, dtype=np.float32)
    it = sampling.blocks(state, nts, burn_in_blocks=burn)
    for _ in range(burn):
        next(it)
    sums = np.zeros((num_lags + 1, num_modes))
    counts = np.zeros(num_lags + 1)
    ssf = np.zeros(num_modes)
    ssf_w = 0.0
    for _ in range(blocks):
        b = next(it)
        sums += np.asarray(b.iter_itc, dtype=np.float64).sum(axis=0)
        counts += np.asarray(b.iter_itc_nw,
                             dtype=np.float64).sum(axis=0)
        parts = np.asarray(b.iter_ssf, dtype=np.float64)
        ssf += parts[..., 0].sum(axis=0)
        ssf_w += np.asarray(b.iter_props.num_walkers,
                            dtype=np.float64)[est_every - 1::est_every].sum()
    f = sums / counts[:, None] / nop            # F(k, tau) per particle
    s_k = ssf / ssf_w / nop                     # mixed S(k) per particle
    tau = np.arange(num_lags + 1) * est_every * dt
    kz = np.arange(num_modes) * 2 * np.pi / spec.supercell_size
    with np.errstate(divide="ignore", invalid="ignore"):
        omega_eff = -np.diff(np.log(np.maximum(f, 1e-300)),
                             axis=0) / (est_every * dt)
    feynman = np.full(num_modes, np.nan)
    feynman[1:] = kz[1:] ** 2 / s_k[1:]
    return {"k": kz, "tau": tau, "f": f, "s_k": s_k,
            "omega_eff": omega_eff, "feynman": feynman}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tg", action="store_true",
                   help="Tonks-Girardeau free-fermion validation point")
    p.add_argument("--walkers", type=int, default=4096)
    p.add_argument("--nop", type=int, default=16)
    p.add_argument("--blocks", type=int, default=24)
    args = p.parse_args()

    if args.tg:
        # gamma = 5000: free-fermion particle-hole decays, exact.
        nop = 5
        out = measure(v0=0.0, gn=1e4, nop=nop, walkers=args.walkers,
                      nts=512, blocks=args.blocks, dt=5e-5,
                      est_every=64, num_modes=4, num_lags=8, rm=1.2,
                      burn=8, regular_init=True)
        kz, tau = out["k"], out["tau"]
        # Exact particle-hole sums.
        q = 2 * np.pi / nop * np.arange(-(nop // 2), nop // 2 + 1)
        fs = set(np.round(q, 12))
        exact = np.zeros((len(tau), len(kz)))
        for j, k in enumerate(kz):
            for qi in q:
                if j and round(qi + k, 12) not in fs:
                    exact[:, j] += np.exp(
                        -((qi + k) ** 2 - qi ** 2) * tau) / nop
        err = np.abs(out["f"][:, 1:] - exact[:, 1:]).max()
        print(json.dumps({
            "mode": "tg", "max_abs_dev_vs_free_fermions": float(err),
            "s_k_measured": out["s_k"].tolist(),
            "s_k_exact": exact[0].tolist()}))
        return

    # Phonon regime: quasi-flat gas, moderate coupling.
    out = measure(v0=1.0, gn=2.0, nop=args.nop, walkers=args.walkers,
                  nts=512, blocks=args.blocks, dt=1e-3, est_every=8,
                  num_modes=8, num_lags=12)
    kz = out["k"]
    omega_last = out["omega_eff"][-1]
    # Phonon slope from the first two finite modes (tightest bound).
    c_itc = float(np.polyfit(kz[1:3], omega_last[1:3], 1)[0])
    from phd_qmclib_tpu.analysis import sound_speed_from_ssf
    c_ssf, c_ssf_err = sound_speed_from_ssf(
        kz, out["s_k"], np.full_like(out["s_k"], 1e-3), num_modes=3)
    print(json.dumps({
        "mode": "phonon", "k": kz.tolist(),
        "omega_eff_tau_max": omega_last.tolist(),
        "feynman_bound": out["feynman"].tolist(),
        "sound_speed_itc": c_itc,
        "sound_speed_feynman": float(c_ssf)}))


if __name__ == "__main__":
    main()
