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


def fused_scan(args, gn_values):
    """All couplings as ONE fused dispatch: one gn per sweep row.

    With >= ``rows`` devices: a 2-D sweep x walkers mesh (SURVEY
    §5.8's >1-pod axis).  On a single chip: the rows are vmap-fused,
    batching R x W walkers into each step — the chip sees one large
    batch instead of R underfilled sequential scans."""
    import jax

    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.parallel.sweep import ParamSweep
    from phd_qmclib_tpu.samplers import dmc

    nop = args.nop
    rows = len(gn_values)
    devices = jax.devices()
    if len(devices) >= rows:
        walker_shards = max(1, len(devices) // rows)
        mesh = jax.make_mesh((rows, walker_shards),
                             ("sweep", "walkers"),
                             devices=devices[:rows * walker_shards])
    else:
        # Single chip: the exec-layer fused sweep (vmap rows, full
        # Proc data pipeline with reblocked errors).
        return fused_scan_exec(args, gn_values)
    target = args.walkers - args.walkers % walker_shards
    max_w = int(1.0625 * target)
    max_w -= max_w % walker_shards
    samplings = tuple(
        dmc.Sampling(
            mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                      interaction_strength=gn, boson_number=nop,
                      supercell_size=float(nop),
                      tbf_contact_cutoff=0.4),
            time_step=1e-3, max_num_walkers=max_w,
            target_num_walkers=target, rng_seed=11 + i)
        for i, gn in enumerate(gn_values))
    sweep = ParamSweep(samplings, mesh)
    rng = np.random.default_rng(0)
    conf_sets = [
        np.stack([s.model_spec.init_get_sys_conf(rng=rng)
                  for _ in range(target)]).astype(np.float32)
        for s in samplings]
    state = sweep.build_states(conf_sets, dtype=np.float32)
    burn = max(3, int(round(4.0 / (1e-3 * args.nts))))
    it = sweep.blocks(state, args.nts, burn_in_blocks=burn)
    for _ in range(burn):
        next(it)
    es = []
    for _ in range(args.blocks):
        b = next(it)
        e = np.asarray(b.iter_props.energy, dtype=np.float64)
        w = np.asarray(b.iter_props.weight, dtype=np.float64)
        es.append(e.sum(axis=0) / w.sum(axis=0))
    es = np.array(es)  # (blocks, rows)
    results = []
    for i, gn in enumerate(gn_values):
        point = {"gn": gn, "energy_per_boson": es[:, i].mean() / nop,
                 "error": es[:, i].std() / np.sqrt(len(es)) / nop}
        results.append(point)
        print(json.dumps(point), flush=True)
    return results


def fused_scan_exec(args, gn_values):
    """Single-chip fused scan through the execution layer: one
    ``SweepProc`` dispatch stream, R ``ProcResult``s with reblocked
    error bars (``qmc_exec/sweep.py``)."""
    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec
    from phd_qmclib_tpu.qmc_exec.sweep import SweepProc

    nop = args.nop
    burn = max(3, int(round(4.0 / (1e-3 * args.nts))))
    procs = tuple(
        dmc_exec.Proc(
            model_spec=mrbp.Spec(
                lattice_depth=20.0, lattice_ratio=1.0,
                interaction_strength=gn, boson_number=nop,
                supercell_size=float(nop), tbf_contact_cutoff=0.4),
            time_step=1e-3, max_num_walkers=int(1.0625 * args.walkers),
            target_num_walkers=args.walkers, num_blocks=args.blocks,
            num_time_steps_block=args.nts, burn_in_blocks=burn,
            rng_seed=11 + i, verbose=False)
        for i, gn in enumerate(gn_values))
    inputs = [dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), p)
        for p in procs]
    sweep_results = SweepProc(procs).exec(inputs)
    results = []
    for gn, res in zip(gn_values, sweep_results):
        e = res.data.blocks.energy
        point = {"gn": gn,
                 "energy_per_boson": float(e.mean) / nop,
                 "error": float(e.mean_error) / nop}
        results.append(point)
        print(json.dumps(point), flush=True)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nop", type=int, default=64)
    parser.add_argument("--walkers", type=int, default=4096)
    parser.add_argument("--blocks", type=int, default=8)
    parser.add_argument("--nts", type=int, default=128)
    parser.add_argument("--mesh-devices", type=int, default=None)
    parser.add_argument("--fused", action="store_true",
                        help="run all couplings as one fused sweep "
                             "dispatch (gn=0 excluded: its static "
                             "structure differs)")
    parser.add_argument("--gns", type=float, nargs="+", default=None,
                        help="couplings to scan (overrides defaults)")
    args = parser.parse_args()

    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.parallel import make_walker_mesh
    from phd_qmclib_tpu.samplers import dmc

    t0 = time.time()
    if args.fused:
        gn_values = args.gns or [0.25, 0.5, 1.0, 2.0]
        results = fused_scan(args, gn_values)
        energies = [r["energy_per_boson"] for r in results]
        print(json.dumps({
            "metric": "dmc_equation_of_state_fused_sweep",
            "monotone_in_gn": bool(np.all(np.diff(energies) > 0)),
            "elapsed_s": time.time() - t0,
        }))
        return

    mesh = None
    if args.mesh_devices is not None:
        mesh = make_walker_mesh(args.mesh_devices or None)

    nop = args.nop
    gn_values = args.gns or [0.0, 0.25, 0.5, 1.0, 2.0, 4.0]
    results = []
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
    summary = {
        "metric": "dmc_equation_of_state",
        "monotone_in_gn": bool(np.all(np.diff(energies) > 0)),
        "elapsed_s": time.time() - t0,
    }
    if gn_values[0] == 0.0:
        summary["ideal_limit_error"] = abs(energies[0] - e0)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
