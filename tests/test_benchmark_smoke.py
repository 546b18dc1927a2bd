"""Tiny-scale smoke of the physics-validation benchmark drivers.

The benchmarks under ``benchmarks/`` are the chip-facing validation
surface; they import the production package but are not imported by
it, so a package refactor can silently break them.  These tests run
the two most wiring-heavy drivers end to end at joke scale (CPU,
seconds) and assert structural health of their JSON output — NOT the
physics (that is what the chip runs are for)."""
import io
import json
import pathlib
import sys

import numpy as np
import pytest

BENCH_DIR = str(pathlib.Path(__file__).parent.parent / "benchmarks")


def _run_main(module_name: str, argv):
    import warnings

    if BENCH_DIR not in sys.path:
        sys.path.insert(0, BENCH_DIR)
    mod = __import__(module_name)
    old_argv, old_stdout = sys.argv, sys.stdout
    sys.argv = [module_name + ".py"] + argv
    sys.stdout = io.StringIO()
    try:
        with warnings.catch_warnings():
            # Joke-scale series legitimately trip the short-series
            # reblocking warning; the tier stays warning-clean.
            warnings.simplefilter("ignore", RuntimeWarning)
            mod.main()
        out = sys.stdout.getvalue()
    finally:
        sys.argv, sys.stdout = old_argv, old_stdout
    return [json.loads(line) for line in out.splitlines()
            if line.lstrip().startswith("{")]


@pytest.mark.slow
def test_itc_spectrum_tg_smoke():
    rows = _run_main("itc_spectrum",
                     ["--tg", "--walkers", "128", "--blocks", "6"])
    (payload,) = rows
    assert payload["mode"] == "tg"
    assert payload["max_abs_dev_vs_free_fermions"] < 0.2
    m = np.asarray(payload["static_m_minus1_measured"], dtype=float)
    ex = np.asarray(payload["static_m_minus1_exact"], dtype=float)
    assert np.isnan(m[0]) and np.isfinite(m[1:]).all()
    # Order-of-magnitude only at this scale.
    assert np.all(np.abs(m[1:] / ex[1:] - 1.0) < 0.5)


@pytest.mark.slow
def test_itc_spectrum_lattice_smoke():
    rows = _run_main(
        "itc_spectrum",
        ["--lattice", "--nop", "8", "--walkers", "64", "--lat-blocks",
         "8", "--lat-nts", "32", "--lat-lags", "6", "--lat-mult", "1",
         "--lat-pfw-blocks", "2", "--lat-cm-blocks", "4",
         "--lat-burn", "2"])
    (payload,) = rows
    assert payload["mode"] == "lattice"
    assert np.isfinite(payload["stiffness_m_over_mstar"])
    s_pure = np.asarray(payload["s_k_pure"], dtype=float)
    assert s_pure.shape == (6,) and (s_pure[1:] > 0).all()
    split = np.asarray(payload["c_luttinger_split"], dtype=float)
    assert np.isnan(split[0]) and np.isfinite(split[1:]).all()
    assert len(payload["bound_ordering_ok"]) >= 1
    ratio = np.asarray(payload["sma_closure_peak_over_split"],
                       dtype=float)
    assert ratio.shape == split.shape
    assert "c_split_k0_extrapolated" in payload
    # The v0 = 0 oracle reference rides along.
    assert payload["c_exact_v0_0"] == pytest.approx(1.33231, abs=1e-4)


@pytest.mark.slow
def test_eos_sound_speed_four_way_smoke():
    rows = _run_main(
        "eos_sound_speed",
        ["--nop", "8", "--walkers", "96", "--nts", "32", "--blocks",
         "4", "--lengths", "10", "8", "6.4", "--modes", "4",
         "--burn-tau", "0.5", "--itc", "--itc-walkers", "96",
         "--itc-blocks", "4", "--itc-lags", "6", "--itc-mult", "1",
         "--itc-pfw-blocks", "1"])
    per_row = [r for r in rows if "L" in r]
    assert len(per_row) == 3
    for r in per_row:
        assert np.isfinite(r["e_dt0"]) and np.isfinite(r["e_exact_ll"])
    (summary,) = [r for r in rows if "c_exact_ll" in r
                  and "four_way_closure_at_n" not in r]
    assert summary["c_exact_ll"] == pytest.approx(2.490588, abs=1e-4)
    (closure,) = [r for r in rows if "four_way_closure_at_n" in r]
    for key in ("c_compressibility_hybrid_k1", "c_dispersion_tail_k1",
                "c_feynman_pure_companion_k1"):
        assert np.isfinite(closure[key]), key
    # Amplitude bookkeeping: the hybrid used the pure companion.
    s_pure = np.asarray(closure["s_pure"], dtype=float)
    assert s_pure.shape == (6,) and (s_pure[1:] > 0).all()


@pytest.mark.slow
def test_itc_spectrum_tg_pure_deep_smoke():
    """The round-5 TG closure knobs: --tg-mult stretches the lag unit
    and --pure swaps in the forward-walked estimator — both must run
    the whole analysis pipeline end to end."""
    rows = _run_main("itc_spectrum",
                     ["--tg", "--walkers", "128", "--blocks", "8",
                      "--tg-mult", "2", "--pure"])
    (payload,) = rows
    assert payload["mode"] == "tg"
    m = np.asarray(payload["static_m_minus1_measured"], dtype=float)
    assert np.isnan(m[0]) and np.isfinite(m[1:]).any()


@pytest.mark.slow
def test_production_surface_dry_smoke():
    rows = _run_main("production_surface", ["--dry", "--blocks", "2"])
    (payload,) = rows
    assert payload["metric"] == "dmc_production_surface"
    assert payload["variant"] == "full"
    assert payload["value"] and payload["value"] > 0


@pytest.mark.slow
def test_estimator_budget_quick_smoke():
    rows = _run_main("estimator_budget", ["--quick"])
    (payload,) = rows
    assert payload["metric"] == "estimator_budget_k1"
    assert set(payload["rows"]) >= {"bare", "density+ssf_pure"}
    assert "cross_term_ms" in payload["budget"]


@pytest.mark.slow
def test_fs_sweep_dry_smoke(tmp_path):
    rows = _run_main("fs_sweep",
                     ["--dry", "--out", str(tmp_path / "fs.h5")])
    (payload,) = rows
    assert payload["metric"] == "fs_fit"
    assert payload["num_points"] == 3
    assert np.isfinite(payload["e0"])


@pytest.mark.slow
def test_wf_opt_compare_joint_smoke():
    rows = _run_main("wf_opt_compare",
                     ["--nop", "8", "--chains", "64",
                      "--equil-steps", "32", "--joint"])
    names = {r.get("method") or r.get("vmc_at") or r.get("metric")
             for r in rows}
    assert "grad_joint" in names
    assert "joint_vs_rm_only_energy_gain" in names
    joint = next(r for r in rows if r.get("method") == "grad_joint")
    assert joint["obf_lattice_depth_opt"] > 0
