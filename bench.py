"""Headline benchmark: DMC walker-steps/sec/chip, mrbp model, N=128.

Prints ONE JSON line:
``{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}``.

Baseline: the reference (oarodriguez/PhD-QMCLib) publishes no numbers
and its numba stack is unavailable in this image, so the baseline is the
measured CPU reference proxy (``benchmarks/cpu_reference_proxy.py``,
same algorithm in vectorized NumPy: 79.7 walker-steps/s/core at N=128 on
the host Xeon) scaled by a generous 32-core workstation:
``32 * 79.66 = 2549 walker-steps/s``.  See BASELINE.md.

Reliability design (the round-2 driver record was an rc=124 timeout with
nothing printed — the remote-compile backend can stall for minutes or
hang entirely on a bad day):

* The measurement runs in a *child* process; the parent enforces an
  internal wall-clock budget and can kill and retry a hung attempt.
* The child streams ``PARTIAL <json>`` lines as soon as the first timed
  block completes, so a kill still leaves a valid measurement for the
  parent to report.
* A persistent XLA compilation cache (``.jax_cache/`` next to this
  file) makes warm runs independent of the remote compile service.
* If the full configuration cannot produce a number in time, a shorter
  attempt at the *same physical configuration* (N=128, 16k walkers —
  same steady-state rate, fewer timed steps) is tried before giving up.
"""
import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

#: Reference CPU estimate (walker-steps/s, N=128): measured proxy
#: 79.66 ws/s/core (this host) x 32 assumed cores.  See BASELINE.md.
REFERENCE_CPU_WALKER_STEPS_PER_SEC = 32 * 79.66

#: Reference CPU estimate for the VMC stage (chain-steps/s, N=64):
#: measured proxy ``benchmarks/cpu_reference_proxy.py --vmc --nop 64``
#: = 3180 chain-steps/s/core at its most cache-favorable chain count
#: (512), x 32 assumed cores.  See BASELINE.md.
REFERENCE_CPU_VMC_CHAIN_STEPS_PER_SEC = 32 * 3180.0

#: Internal wall-clock budget (s).  The driver's own timeout is not
#: published; stay well under the conventional ``timeout 600``.
TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 480.0))

#: Stored equilibrated E/N for the bench configuration (v0=20, gn=1,
#: N=128, 16k walkers, dt=1e-3) — the dt-band table in BASELINE.md
#: ("N=128, 16,384 walkers", dt=1e-3 row).  The bench's own E/N must
#: land within ``BENCH_ENERGY_TOL`` of it (covers the residual
#: equilibration transient of a short cold-start run) AND inside the
#: physical bracket (ideal band bottom, VMC variational energy) — a
#: physics check carried in the parsed artifact itself.
BENCH_ENERGY_REF = 8.41614
BENCH_ENERGY_TOL = 0.02
BENCH_ENERGY_BRACKET = (8.0107, 8.5089)


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(HERE, ".jax_cache")
    try:
        # Atomic-write hardening matters here: the parent watchdog
        # kills hung children, and a mid-write kill would otherwise
        # leave a truncated cache entry that aborts every later
        # attempt (see utils/compile_cache.py).
        from phd_qmclib_tpu.utils.compile_cache import \
            enable_persistent_cache

        enable_persistent_cache(cache_dir, min_compile_time_secs=0.5)
    except Exception:  # pragma: no cover - older jax fallback
        pass


def run_bench(nop: int, target: int, max_w: int, nts: int,
              timed_blocks: int, burn_blocks: int = 1,
              check_energy: bool = False, estimators: bool = False,
              est_every: int = 1, partial_stream=None):
    """Measure the DMC steady-state rate.

    With ``partial_stream`` set, emits a ``PARTIAL <json>`` line after
    every timed block so an external watchdog can salvage a result from
    a killed run.
    """
    import jax

    import numpy as np

    _enable_compile_cache()

    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.samplers import dmc

    spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=0.4)
    est_kw = {}
    if estimators:
        # Production estimator load: pure density + pure S(k)
        # (config #5 scale).
        est_kw = dict(
            density_est_spec=dmc.DensityEstSpec(num_bins=128,
                                                as_pure_est=True),
            ssf_est_spec=dmc.SSFEstSpec(num_modes=64, as_pure_est=True))
    sampling = dmc.Sampling(spec, time_step=1e-3, max_num_walkers=max_w,
                            target_num_walkers=target, rng_seed=1,
                            est_every=est_every, **est_kw)
    rng = np.random.default_rng(0)
    confs = np.stack([spec.init_get_sys_conf(rng=rng)
                      for _ in range(target)]).astype(np.float32)
    state = sampling.build_state(confs, dtype=np.float32)

    blocks = sampling.blocks(state, num_time_steps_block=nts,
                             burn_in_blocks=0)
    # Warm-up/burn-in blocks (includes compilation).  The duration is
    # reported: a warm persistent-cache run loads in seconds, a cold
    # remote compile takes minutes — the artifact carries the
    # difference so a degraded reading is distinguishable from a
    # regression.
    t_warm = time.perf_counter()
    for _ in range(burn_blocks):
        block = next(blocks)
    jax.block_until_ready(block.last_state.pos)
    float(np.asarray(block.iter_props.num_walkers[-1]))  # sync fetch
    warmup_s = time.perf_counter() - t_warm

    def emit_partial(rate, extras):
        if partial_stream is None:
            return
        payload = {"value": rate}
        payload.update(extras)
        print(f"PARTIAL {json.dumps(payload)}", file=partial_stream,
              flush=True)

    t0 = time.perf_counter()
    t_prev = t0
    block_rates = []
    total_wsteps = 0.0
    e_over_w = []
    rate = 0.0
    extras = {}
    for _ in range(timed_blocks):
        block = next(blocks)
        nw = np.asarray(block.iter_props.num_walkers, dtype=np.float64)
        total_wsteps += float(nw.sum())
        if check_energy:
            e_over_w.append(
                float(np.asarray(block.iter_props.energy,
                                 dtype=np.float64).sum())
                / float(np.asarray(block.iter_props.weight,
                                   dtype=np.float64).sum()))
        # ``block_until_ready`` is a no-op on the axon backend; the
        # ``np.asarray`` fetches above already synchronized, so the
        # running rate is an honest per-block measurement.
        t_now = time.perf_counter()
        block_rates.append(float(nw.sum()) / (t_now - t_prev))
        t_prev = t_now
        rate = total_wsteps / (t_now - t0)
        extras = {"block_rates": [round(r) for r in block_rates],
                  "warmup_s": round(warmup_s, 1),
                  "warm": bool(warmup_s < 60.0)}
        if check_energy:
            e = float(np.mean(e_over_w)) / nop
            extras["energy_per_boson"] = e
            if nop == 128:
                # The stored dt-band value applies to the headline
                # N=128 configuration only.
                lo, hi = BENCH_ENERGY_BRACKET
                extras.update(
                    energy_ref_dt_band=BENCH_ENERGY_REF,
                    energy_dev=e - BENCH_ENERGY_REF,
                    energy_check_ok=bool(
                        lo < e < hi
                        and abs(e - BENCH_ENERGY_REF)
                        < BENCH_ENERGY_TOL))
        emit_partial(rate, extras)
    jax.block_until_ready(block.last_state.pos)
    elapsed = time.perf_counter() - t0
    rate = total_wsteps / elapsed
    return rate, extras


def run_vmc_bench(nop: int, num_chains: int, nts: int,
                  timed_blocks: int, burn_blocks: int = 1,
                  partial_stream=None):
    """Measure the VMC steady-state rate (BASELINE configs #1-#2:
    Metropolis chains with the S(k) estimator on)."""
    import jax

    import numpy as np

    _enable_compile_cache()

    from phd_qmclib_tpu.models import mrbp
    from phd_qmclib_tpu.samplers import vmc

    spec = mrbp.Spec(lattice_depth=20.0, lattice_ratio=1.0,
                     interaction_strength=1.0, boson_number=nop,
                     supercell_size=float(nop), tbf_contact_cutoff=0.4)
    sampling = vmc.Sampling(
        spec, move_spread=0.4, rng_seed=1, num_walkers=num_chains,
        ssf_est_spec=vmc.SSFEstSpec(num_modes=32))
    rng = np.random.default_rng(0)
    confs = rng.uniform(0.0, float(nop), size=(num_chains, nop)) \
        .astype(np.float32)
    state = sampling.build_state(confs)

    blocks = sampling.blocks(nts, state)
    for _ in range(burn_blocks):
        block = next(blocks)
    # block_until_ready is a no-op on axon; fetch a scalar to sync.
    # Run the SAME scalar fetches the timed loop uses so their one-time
    # compiles/dispatch warmup happen before the timer (a cold first
    # timed block read 2.7M while steady state is ~9.0M).
    float(np.asarray(block.accept_rate))
    float(np.asarray(block.iter_props.energy[-1].mean()))
    float(np.asarray(block.last_state.wf_abs_log[:1])[0])

    def emit_partial(rate, extras):
        if partial_stream is None:
            return
        payload = {"value": rate}
        payload.update(extras)
        print(f"PARTIAL {json.dumps(payload)}", file=partial_stream,
              flush=True)

    t0 = time.perf_counter()
    t_prev = t0
    block_rates = []
    total_steps = 0.0
    extras = {}
    rate = 0.0
    for _ in range(timed_blocks):
        block = next(blocks)
        # Reduce ON DEVICE, fetch scalars: materializing the raw
        # (nts, W) energy array on the host moved ~32 MB/block through
        # the relay and its transfer-speed swings dominated the
        # measurement (2.8-4.6M readings for identical code).  The
        # scalar fetches below synchronize the device.
        acc = float(np.asarray(block.accept_rate))
        e = float(np.asarray(block.iter_props.energy[-1].mean()))
        t_now = time.perf_counter()
        block_rates.append(num_chains * nts / (t_now - t_prev))
        t_prev = t_now
        total_steps += float(num_chains * nts)
        rate = total_steps / (t_now - t0)
        extras = {"energy_per_boson": e / nop, "accept_rate": acc,
                  "block_rates": [round(r) for r in block_rates]}
        emit_partial(rate, extras)
    return rate, extras


def vmc_result_line(rate: float, extras: dict) -> str:
    result = {
        "metric": "vmc_chain_steps_per_sec_per_chip",
        "value": rate,
        "unit": "chain-steps/s/chip",
        "vs_baseline": rate / REFERENCE_CPU_VMC_CHAIN_STEPS_PER_SEC,
    }
    result.update(extras)
    return json.dumps(result)


def build_metric_name(args) -> str:
    metric = "dmc_walker_steps_per_sec_per_chip"
    if args.estimators:
        metric += "_estimators_on"
    if args.est_every > 1:
        metric += f"_cadence{args.est_every}"
    return metric


def result_line(metric: str, rate: float, extras: dict) -> str:
    result = {
        "metric": metric,
        "value": rate,
        "unit": "walker-steps/s/chip",
        "vs_baseline": rate / REFERENCE_CPU_WALKER_STEPS_PER_SEC,
    }
    result.update(extras)
    return json.dumps(result)


def all_stages_child(args) -> int:
    """One child process measuring EVERY perf stage sequentially on a
    single backend initialization (each separate child paid ~60-70 s
    of axon startup, which starved the later stages' windows — the
    round-5 bench run lost its VMC stage to exactly that).  Emits a
    ``STAGE <json>`` line as each stage completes, so a killed child
    still leaves every finished stage for the parent to fold into the
    final record; stage failures are contained and skip to the next
    stage."""
    def emit(stage: str, record: dict):
        print(f"STAGE {json.dumps(dict(record, stage=stage))}",
              flush=True)

    # 1) DMC headline (streams PARTIALs as today).
    if args.quick:
        rate, extras = run_bench(nop=32, target=2048, max_w=2560,
                                 nts=32, timed_blocks=2,
                                 check_energy=True,
                                 partial_stream=sys.stdout)
    else:
        rate, extras = run_bench(nop=args.nop, target=args.target,
                                 max_w=args.max_walkers, nts=args.nts,
                                 timed_blocks=args.blocks,
                                 burn_blocks=args.burn,
                                 check_energy=True,
                                 partial_stream=sys.stdout)
    emit("dmc", json.loads(result_line(build_metric_name(args), rate,
                                       extras)))

    # 2) VMC stage (BASELINE configs #1-#2).
    try:
        if args.quick:
            rate, extras = run_vmc_bench(nop=32, num_chains=2048,
                                         nts=64, timed_blocks=2)
        else:
            rate, extras = run_vmc_bench(nop=64, num_chains=16384,
                                         nts=512, timed_blocks=4)
        emit("vmc", json.loads(vmc_result_line(rate, extras)))
    except Exception as exc:  # pragma: no cover - stage isolation
        print(f"bench: vmc stage failed: {exc!r}", file=sys.stderr)

    if args.quick:
        return 0

    # 3) Estimators-on at the production cadence (config #5 scale).
    try:
        rate, extras = run_bench(nop=args.nop, target=args.target,
                                 max_w=args.max_walkers, nts=args.nts,
                                 timed_blocks=1, burn_blocks=1,
                                 estimators=True, est_every=8)
        emit("est_k8", {"metric":
                        "dmc_walker_steps_per_sec_per_chip_"
                        "estimators_on_cadence8",
                        "value": rate, **extras})
    except Exception as exc:  # pragma: no cover
        print(f"bench: estimators-on stage failed: {exc!r}",
              file=sys.stderr)

    # 4) Full production estimator surface (the shipped
    # examples/dmc_production.yml through the real Proc.exec driver
    # path, incl. the pure deep-lag ITC).
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "production_surface",
            os.path.join(HERE, "benchmarks", "production_surface.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        emit("production", mod.measure(blocks=8, enable_cache=False))
    except Exception as exc:  # pragma: no cover
        print(f"bench: production-surface stage failed: {exc!r}",
              file=sys.stderr)
    return 0


def child_main(args) -> int:
    """The actual measurement process (``--child``)."""
    if args.all_stages:
        return all_stages_child(args)
    if args.vmc_stage:
        if args.quick:
            rate, extras = run_vmc_bench(nop=32, num_chains=2048,
                                         nts=64, timed_blocks=2,
                                         partial_stream=sys.stdout)
        else:
            # 4 timed blocks (~6 s of steady-state work): 2 blocks was
            # a ~3 s measurement and a single dispatch hiccup moved
            # the reading by up to 20% between runs.
            rate, extras = run_vmc_bench(nop=64, num_chains=16384,
                                         nts=512, timed_blocks=4,
                                         partial_stream=sys.stdout)
        print(vmc_result_line(rate, extras))
        return 0
    if args.quick:
        rate, extras = run_bench(nop=32, target=2048, max_w=2560,
                                 nts=32, timed_blocks=2,
                                 check_energy=True,
                                 estimators=args.estimators,
                                 est_every=args.est_every,
                                 partial_stream=sys.stdout)
    else:
        rate, extras = run_bench(nop=args.nop, target=args.target,
                                 max_w=args.max_walkers, nts=args.nts,
                                 timed_blocks=args.blocks,
                                 burn_blocks=args.burn,
                                 check_energy=True,
                                 estimators=args.estimators,
                                 est_every=args.est_every,
                                 partial_stream=sys.stdout)
    print(result_line(build_metric_name(args), rate, extras))
    return 0


def _run_attempt(child_args, timeout_s: float, cmd=None):
    """Run one child attempt; returns (final_json_or_None,
    last_partial_or_None).  ``cmd`` overrides the default bench-child
    command (used to run a standalone benchmark script that prints its
    own one-line JSON)."""
    if cmd is None:
        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
    cmd = cmd + child_args
    env = dict(os.environ)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True,
                            env=env, cwd=HERE)
    deadline = time.monotonic() + timeout_s
    final = None
    partial = None
    stages = []

    def absorb(line: str):
        nonlocal final, partial
        line = line.strip()
        try:
            if line.startswith("PARTIAL "):
                partial = json.loads(line[len("PARTIAL "):])
            elif line.startswith("STAGE "):
                stages.append(json.loads(line[len("STAGE "):]))
            elif line.startswith("{"):
                final = json.loads(line)
        except json.JSONDecodeError:
            pass

    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    try:
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            events = sel.select(timeout=min(remaining, 5.0))
            if not events:
                if proc.poll() is not None:
                    break
                continue
            chunk = os.read(proc.stdout.fileno(), 65536).decode(
                "utf-8", "replace")
            if not chunk:
                break
            buf += chunk
            while "\n" in buf:
                line, buf = buf.split("\n", 1)
                absorb(line)
        # Drain if the child already exited.
        if proc.poll() is not None:
            for line in (buf + proc.stdout.read()).splitlines():
                absorb(line)
    finally:
        sel.close()
        if proc.poll() is None:
            proc.kill()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass
    return final, partial, stages


def parent_main(args) -> int:
    """Orchestrate measurement attempts under the wall-clock budget."""
    t0 = time.monotonic()
    metric = build_metric_name(args)

    def remaining():
        return TOTAL_BUDGET_S - (time.monotonic() - t0)

    passthrough = []
    if args.quick:
        passthrough.append("--quick")
    if args.estimators:
        passthrough.append("--estimators")
    passthrough += ["--est-every", str(args.est_every),
                    "--nop", str(args.nop),
                    "--target", str(args.target),
                    "--max-walkers", str(args.max_walkers)]

    # Attempt 1: ONE all-stages child measuring DMC + VMC + est-on +
    # production-surface sequentially on a single backend
    # initialization (separate children paid ~60-70 s of axon startup
    # EACH, which starved the later stages' windows).  It gets the
    # whole budget minus a 30 s epsilon: under a degraded relay the
    # warmup cost is dominated by remote compiles / cached-executable
    # LOADS, and the per-block PARTIAL + per-stage STAGE salvage means
    # a kill still leaves every finished measurement.  Everything
    # folds into ONE final JSON object printed last (the driver
    # records only the tail line — round-4 verdict item).
    stage_args = passthrough + ["--all-stages",
                                "--nts", str(args.nts),
                                "--blocks", str(args.blocks),
                                "--burn", str(args.burn)]
    _, partial, stages = _run_attempt(
        stage_args, timeout_s=max(60.0, remaining() - 30.0))
    by_name = {}
    for s in stages:
        by_name[s.pop("stage")] = s
    dmc = by_name.get("dmc")
    if dmc is None and partial is not None:
        # The child died mid-DMC but produced at least one
        # honestly-timed block at the full configuration.
        dmc = json.loads(result_line(metric, partial.pop("value"),
                                     partial))

    if dmc is None:
        # Attempt 2: same physical configuration (same N, same
        # ensemble - same steady-state rate), minimal timed work.
        # Only reached when attempt 1 died without even one timed
        # block.
        if remaining() > 45.0 and not args.quick:
            short_args = passthrough + ["--nts", "16", "--blocks", "1"]
            final, partial, _ = _run_attempt(
                short_args, timeout_s=max(30.0, remaining() - 15.0))
            if final is not None:
                print(json.dumps(final))
                return 0
            if partial is not None:
                print(result_line(metric, partial.pop("value"),
                                  partial))
                return 0
        print("bench: no measurement could be completed within "
              f"{TOTAL_BUDGET_S:.0f}s (backend unavailable?)",
              file=sys.stderr)
        return 1

    combined = dict(dmc)
    vmc = by_name.get("vmc")
    if vmc is not None:
        print(json.dumps(vmc))
        combined["vmc_chain_steps_per_sec"] = vmc["value"]
        combined["vmc_vs_baseline"] = vmc.get("vs_baseline")
        if "accept_rate" in vmc:
            combined["vmc_accept_rate"] = vmc["accept_rate"]
    est = by_name.get("est_k8")
    if est is not None:
        print(json.dumps(est))
        combined["estimators_on_k8_value"] = est["value"]
    prod = by_name.get("production")
    if prod is not None and prod.get("value") is not None:
        print(json.dumps(prod))
        combined["production_surface_value"] = prod["value"]
    print(json.dumps(combined))
    return 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small/fast configuration")
    parser.add_argument("--nop", type=int, default=128)
    parser.add_argument("--target", type=int, default=16384)
    # 6.25% buffer headroom above target: population control holds the
    # ensemble within ~2% of target, and every padded buffer row costs
    # O(N^2) pair work (validated: E/N identical to the 25%-headroom
    # run, cap never reached).
    parser.add_argument("--max-walkers", type=int, default=17408)
    # Production block length (the Proc default, matching the
    # reference's 512): per-block host fetches are ~5% of wall time at
    # 128 steps/block and ~1% at 512.
    parser.add_argument("--nts", type=int, default=512)
    parser.add_argument("--blocks", type=int, default=2)
    # Burn to tau ~ 3 before timing: the gas equilibrates in tau 3-4
    # (BASELINE.md), and the timed blocks' E/N feeds the dt-band
    # physics check in the artifact — an under-burned run would trip
    # it spuriously.  Costs ~14 s of steady-state work.
    parser.add_argument("--burn", type=int, default=6)
    parser.add_argument("--estimators", action="store_true",
                        help="measure with the production estimator load "
                             "(pure 128-bin density + 64-mode S(k))")
    parser.add_argument("--est-every", type=int, default=1,
                        help="estimator measurement cadence (see "
                             "Sampling.est_every)")
    parser.add_argument("--vmc-stage", action="store_true",
                        help="measure the VMC (Metropolis) stage "
                             "instead of DMC (N=64, 16k chains, S(k) "
                             "on; BASELINE configs #1-#2)")
    parser.add_argument("--all-stages", dest="all_stages",
                        action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--child", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--no-subprocess", action="store_true",
                        help="measure in-process (no watchdog)")
    args = parser.parse_args()

    if args.child or args.no_subprocess:
        return child_main(args)
    return parent_main(args)


if __name__ == "__main__":
    sys.exit(main())
