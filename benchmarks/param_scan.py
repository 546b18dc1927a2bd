"""DMC parameter scan: ground-state energy vs interaction coupling
(BASELINE config #5, single-chip form).

Scans the interaction strength at fixed lattice, running one DMC
sampling per point.  On multi-chip hardware the same scan shards each
point's walkers over the mesh (``num_mesh_devices``); the scan axis
itself is embarrassingly parallel across hosts.

Run: ``python benchmarks/param_scan.py [--nop N] [--walkers W]``
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nop", type=int, default=64)
    parser.add_argument("--walkers", type=int, default=4096)
    parser.add_argument("--blocks", type=int, default=8)
    parser.add_argument("--nts", type=int, default=128)
    parser.add_argument("--mesh-devices", type=int, default=None)
    args = parser.parse_args()

    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.parallel import make_walker_mesh
    from phd_qmclib_tpu.samplers import dmc

    mesh = None
    if args.mesh_devices is not None:
        mesh = make_walker_mesh(args.mesh_devices or None)

    nop = args.nop
    gn_values = [0.0, 0.25, 0.5, 1.0, 2.0, 4.0]
    results = []
    t0 = time.time()
    for gn in gn_values:
        spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                         interaction_strength=gn, boson_number=nop,
                         supercell_size=float(nop),
                         tbf_contact_cutoff=0.4)
        sampling = dmc.Sampling(
            spec, time_step=1e-3,
            max_num_walkers=int(1.0625 * args.walkers),
            target_num_walkers=args.walkers, rng_seed=11, mesh=mesh)
        rng = np.random.default_rng(0)
        confs = np.stack([spec.init_get_sys_conf(rng=rng)
                          for _ in range(args.walkers)]).astype(np.float32)
        state = sampling.build_state(confs, dtype=np.float32)
        burn = max(3, int(round(4.0 / (1e-3 * args.nts))))
        it = sampling.blocks(state, args.nts, burn_in_blocks=burn)
        for _ in range(burn):
            next(it)
        es = []
        for _ in range(args.blocks):
            b = next(it)
            es.append(float(np.asarray(b.iter_props.energy,
                                       dtype=np.float64).sum())
                      / float(np.asarray(b.iter_props.weight,
                                         dtype=np.float64).sum()))
        es = np.array(es)
        point = {"gn": gn, "energy_per_boson": es.mean() / nop,
                 "error": es.std() / np.sqrt(len(es)) / nop}
        results.append(point)
        print(json.dumps(point), flush=True)

    e0 = mrbp.Spec(20.0, 1.0, 1.0, nop, float(nop), 0.4) \
        .obf_params.param_e0
    # The curve must be monotone in gn and pinned to e0 at gn=0.
    energies = [r["energy_per_boson"] for r in results]
    print(json.dumps({
        "metric": "dmc_equation_of_state",
        "monotone_in_gn": bool(np.all(np.diff(energies) > 0)),
        "ideal_limit_error": abs(energies[0] - e0),
        "elapsed_s": time.time() - t0,
    }))


if __name__ == "__main__":
    main()
