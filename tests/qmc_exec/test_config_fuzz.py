"""Config-space property fuzz (VERDICT r3 next #1).

Round 3's last commits were review fixes to interactions between
windows x cadence x rebalance x checkpoint x sweeps — the bug surface
is the CROSS-PRODUCT of knobs, which targeted tests under-sample.
This harness draws random VALID procedure configs across that space
and asserts the framework's own invariants on every draw:

- walker dynamics are bit-identical across estimator/cadence/
  keep_iter_data settings (measurement must never perturb the chain);
- physics sum rules: binned density sums to N, pair counts to
  N(N-1)/2, OBDM n1(0) = 1, finite S(k), population within bounds;
- HDF5 round-trip equality of every blocks series;
- kill at a random checkpoint + restore reproduces the uninterrupted
  run bit-exactly (full-state resume).

The fast tier runs a fixed seed corpus; the slow tier widens it.
Pattern generalized from the reference's fake-model machinery tests
(``/root/reference/tests/qmc_base/test_vmc.py:15-99``).
"""
import numpy as np
import pytest

from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec, io as io_mod
from phd_qmclib_tpu.qmc_exec import vmc as vmc_exec

from tests.qmc_exec.test_checkpoint import kill_after_checkpoint

NOP, SC = 5, 5.0
NTS = 8


def draw_dmc_config(rng: np.random.Generator) -> dict:
    """A random valid DMC Proc config on tiny shapes."""
    num_blocks = int(rng.choice([4, 6]))
    est_every = int(rng.choice([1, 2, 4]))
    mesh = bool(rng.random() < 0.4)
    window_steps = int(rng.choice([NTS // 2, NTS, 2 * NTS]))

    def est_spec(extra_mult=False):
        if rng.random() < 0.3:
            return None
        spec = {"as_pure_est": bool(rng.random() < 0.6)}
        if spec["as_pure_est"]:
            spec["pfw_num_time_steps"] = window_steps
        if extra_mult:
            spec["est_every_mult"] = int(rng.choice([1, 2]))
        return spec

    cfg = {
        "model_spec": {
            "lattice_depth": float(rng.choice([0.0, 10.0])),
            "lattice_ratio": 1,
            "interaction_strength": float(rng.uniform(0.5, 4.0)),
            "boson_number": NOP, "supercell_size": SC,
            "tbf_contact_cutoff": 0.3,
        },
        "time_step": 1e-3,
        "max_num_walkers": 96, "target_num_walkers": 64,
        "num_blocks": num_blocks, "num_time_steps_block": NTS,
        "burn_in_blocks": int(rng.choice([0, 1])),
        "rng_seed": int(rng.integers(1, 10_000)),
        "dtype": "float64",
        "est_every": est_every,
        "keep_iter_data": bool(rng.random() < 0.25),
    }
    d = est_spec()
    if d is not None:
        cfg["density_spec"] = {"num_bins": 8, **d}
    s = est_spec()
    if s is not None:
        cfg["ssf_spec"] = {"num_modes": 4, **s}
    o = est_spec(extra_mult=True)
    if o is not None:
        cfg["obd_spec"] = {"num_pos": 3, **o}
    g = est_spec(extra_mult=True)
    if g is not None:
        cfg["pair_corr_spec"] = {"num_bins": 6, **g}
    if rng.random() < 0.4:
        wb = int(rng.choice([1, 2]))
        if num_blocks % wb == 0:
            cfg["cm_diffusion_spec"] = {"window_blocks": wb}
    if mesh:
        cfg["num_mesh_devices"] = 0
        if rng.random() < 0.5:
            cfg["rebalance_every"] = int(rng.choice([2, 3]))
    # Imaginary-time correlation (drawn LAST so the earlier knob
    # sequence — and the fixed corpus's coverage — is unchanged; the
    # pure/forward-walked variant draws after it for the same reason).
    if rng.random() < 0.5:
        cfg["itc_spec"] = {"num_modes": 4,
                           "num_lags": int(rng.choice([2, 3, 5])),
                           "est_every_mult": int(rng.choice([1, 2]))}
        if rng.random() < 0.5:
            cfg["itc_spec"]["as_pure_est"] = True
            cfg["itc_spec"]["pfw_num_time_steps"] = window_steps
    # Validity constraints: est_every (x mult) must divide the block
    # AND any forward-walking window length.
    if NTS % est_every:
        cfg["est_every"] = est_every = 1
    for key in ("density_spec", "ssf_spec", "obd_spec",
                "pair_corr_spec", "itc_spec"):
        spec = cfg.get(key)
        if not spec:
            continue
        mult = spec.get("est_every_mult", 1)
        if NTS % (est_every * mult):
            spec["est_every_mult"] = mult = 1
        pfw = spec.get("pfw_num_time_steps")
        if pfw is not None and pfw % (est_every * mult):
            spec["pfw_num_time_steps"] = None  # one-block window
    return cfg


def run_config(cfg: dict, ckpt: str = None,
               state=None) -> "dmc_exec.ProcResult":
    cfg = dict(cfg)
    if ckpt is not None:
        cfg["checkpoint_file"] = ckpt
        cfg["checkpoint_every"] = int(
            np.random.default_rng(cfg["rng_seed"]).integers(
                1, cfg["num_blocks"]))
    proc = dmc_exec.Proc.from_config(cfg)
    if state is None:
        pin = dmc_exec.ProcInput.from_model_sys_conf_spec(
            dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    else:
        pin = dmc_exec.ProcInput(state)
    return proc.exec(pin)


def _series(blocks):
    """Every totals array of a blocks container, keyed by name."""
    out = {}
    for name in ("energy", "weight", "num_walkers", "density",
                 "one_body_dm", "pair_corr"):
        b = getattr(blocks, name, None)
        if b is not None:
            out[name] = np.asarray(b.totals)
            if getattr(b, "weight_totals", None) is not None:
                out[name + "_w"] = np.asarray(b.weight_totals)
    if getattr(blocks, "ss_factor", None) is not None:
        out["ssf"] = np.asarray(
            blocks.ss_factor.fdk_sqr_abs_part.totals)
    if getattr(blocks, "cm_diffusion", None) is not None:
        out["cmd"] = np.asarray(blocks.cm_diffusion.w2_series)
    if getattr(blocks, "itc", None) is not None:
        out["itc"] = np.asarray(blocks.itc.lag_sums)
        out["itc_nw"] = np.asarray(blocks.itc.lag_counts)
    return out


def assert_invariants(cfg, result):
    blocks = result.data.blocks
    assert np.isfinite(blocks.energy.mean)
    # Totals are per-block sums over the NTS steps in both
    # keep_iter_data modes.
    nw = np.asarray(blocks.num_walkers.totals)
    assert np.all(nw / NTS <= cfg["max_num_walkers"] + 1e-9)
    assert np.all(nw > 0)
    if blocks.density is not None:
        np.testing.assert_allclose(blocks.density.mean.sum(), NOP,
                                   rtol=1e-9)
    if blocks.pair_corr is not None:
        np.testing.assert_allclose(blocks.pair_corr.mean.sum(),
                                   NOP * (NOP - 1) / 2, rtol=1e-9)
    if blocks.one_body_dm is not None:
        assert blocks.one_body_dm.mean[0] == pytest.approx(1.0,
                                                           rel=1e-9)
    if blocks.ss_factor is not None:
        assert np.all(np.isfinite(blocks.ss_factor.mean))
    if blocks.cm_diffusion is not None:
        assert np.all(np.isfinite(blocks.cm_diffusion.w2_series))
    if getattr(blocks, "itc", None) is not None:
        # k = 0 sum rule wherever the lag row ever filled: rho_0 = N
        # exactly, so F(0, tau) = N per contributing walker.  Lags
        # that never filled are NaN by construction, never zeros.
        itc = blocks.itc
        filled = itc.lag_counts.sum(axis=0) > 0
        np.testing.assert_allclose(itc.mean[filled, 0], NOP,
                                   rtol=1e-9)
        assert np.all(np.isfinite(itc.mean[filled]))
        assert np.all(np.isnan(itc.mean[~filled]))


def fuzz_one(seed: int, tmp_path):
    rng = np.random.default_rng(seed)
    cfg = draw_dmc_config(rng)
    result = run_config(cfg)
    assert_invariants(cfg, result)

    # Invariant 1 — measurement settings never perturb the dynamics:
    # toggling cadence and keep_iter_data leaves the final walker
    # ensemble bit-identical.  (Estimator SUBSETS may legally change
    # dynamics indirectly when rebalancing defers to the pfw window
    # boundary, so the variant keeps the estimator set.)
    variant = dict(cfg)
    variant["est_every"] = 1
    for key in ("obd_spec", "pair_corr_spec"):
        if variant.get(key):
            variant[key] = {**variant[key], "est_every_mult": 1}
    variant["keep_iter_data"] = not cfg["keep_iter_data"]
    vres = run_config(variant)
    np.testing.assert_array_equal(
        np.asarray(vres.state.pos), np.asarray(result.state.pos),
        err_msg=f"cadence/keep_iter_data toggle changed the dynamics "
                f"(seed {seed}, cfg {cfg})")

    # Invariant 2 — HDF5 round-trip exactness of every series.
    path = str(tmp_path / f"fuzz-{seed}.h5")
    handler = io_mod.DmcHDF5FileHandler(path, group="fuzz")
    handler.dump(result)
    loaded = handler.load()
    want, got = _series(result.data.blocks), _series(
        loaded.data.blocks)
    assert want.keys() == got.keys()
    for name in want:
        np.testing.assert_array_equal(got[name], want[name],
                                      err_msg=f"HDF5 {name} "
                                              f"(seed {seed})")

    # Invariant 3 — kill at a random checkpoint + restore == the
    # uninterrupted run, bit-exactly, including every estimator
    # series (full-state resume across the whole config space).
    ckpt = str(tmp_path / f"fuzz-{seed}-ckpt.h5")
    every = int(rng.integers(1, cfg["num_blocks"]))
    kill_at = int(rng.integers(1, cfg["num_blocks"] // every + 1)) \
        * every
    if kill_at >= cfg["num_blocks"]:
        kill_at = every
    ckpt_cfg = {**cfg, "checkpoint_file": ckpt,
                "checkpoint_every": every}
    proc = dmc_exec.Proc.from_config(ckpt_cfg)
    pin = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)

    class MPatch:
        """Minimal monkeypatch.context() stand-in (the fuzz body runs
        outside a test-function fixture for the slow sweep)."""

        def __init__(self):
            self._saved = dmc_exec.Proc._write_checkpoint

        def setattr(self, target, name, value):
            setattr(target, name, value)

        def restore(self):
            dmc_exec.Proc._write_checkpoint = self._saved

    mp = MPatch()
    try:
        killed = kill_after_checkpoint(mp, dmc_exec.Proc,
                                       at_blocks=kill_at)
        with pytest.raises(killed):
            proc.exec(pin)
    finally:
        mp.restore()
    proc2, pin2 = dmc_exec.Proc.restore_checkpoint(ckpt)
    assert pin2.resume["blocks_completed"] == kill_at
    resumed = proc2.evolve({"checkpoint_file": None}).exec(pin2)
    np.testing.assert_array_equal(np.asarray(resumed.state.pos),
                                  np.asarray(result.state.pos),
                                  err_msg=f"resume pos (seed {seed}, "
                                          f"kill at {kill_at})")
    want, got = _series(result.data.blocks), _series(
        resumed.data.blocks)
    for name in want:
        np.testing.assert_array_equal(
            got[name], want[name],
            err_msg=f"resume {name} (seed {seed}, kill {kill_at}, "
                    f"cfg {cfg})")


#: Fast-tier corpus: seeds chosen to cover mesh on/off, pure
#: multi-block windows, cadence multipliers and CM windows (verified
#: by inspecting the drawn configs; regressions in the draw function
#: surface as coverage assertions below).  Trimmed to two seeds in
#: round 5 for the tier budget: seed 10 carries the hardest
#: interaction (mesh + rebalance + multi-block pure windows +
#: keep_iter_data + pure ITC), seed 4 the single-device + CM-window
#: side; the dropped seeds (22, 31) joined the slow corpus below.
FAST_SEEDS = [4, 10]


@pytest.mark.parametrize("seed", FAST_SEEDS)
def test_config_fuzz_fast(seed, tmp_path):
    fuzz_one(seed, tmp_path)


def test_fast_corpus_covers_the_knobs():
    """The fixed corpus must keep exercising the interacting knobs if
    draw_dmc_config changes."""
    cfgs = [draw_dmc_config(np.random.default_rng(s))
            for s in FAST_SEEDS]
    assert any(c.get("num_mesh_devices") == 0 for c in cfgs)
    assert any(c.get("rebalance_every") for c in cfgs)

    def multi_block(c):
        return any((c.get(k) or {}).get("pfw_num_time_steps")
                   == 2 * NTS
                   for k in ("density_spec", "ssf_spec", "obd_spec",
                             "pair_corr_spec"))

    assert any(multi_block(c) for c in cfgs)
    # The hardest interaction: mesh + rebalance cadence + a pure
    # window spanning several blocks (deferred rebalancing).
    assert any(c.get("num_mesh_devices") == 0
               and c.get("rebalance_every") and multi_block(c)
               for c in cfgs)
    assert any(c.get("cm_diffusion_spec") for c in cfgs)
    assert any(c["est_every"] > 1 for c in cfgs)
    assert any(c["keep_iter_data"] for c in cfgs)
    assert any(c.get("itc_spec") for c in cfgs)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [22, 31, *range(100, 116)])
def test_config_fuzz_wide(seed, tmp_path):
    fuzz_one(seed, tmp_path)


@pytest.mark.parametrize(
    "seed", [pytest.param(5, marks=pytest.mark.slow), 9])
def test_vmc_config_fuzz(seed, tmp_path):
    """The VMC side of the same harness: cadence bit-identity, HDF5
    round-trip, kill/restore bit-exactness.  Seed 9 (fast tier) uses
    Gaussian (vmc_ndf-style) proposals — the config key the driver now
    exposes — so the invariants cover the normal-distribution sampling
    too; seed 5 keeps the uniform-proposal draw in the slow tier (that
    path is exercised by every other VMC test)."""
    rng = np.random.default_rng(seed)
    cfg = {
        "model_spec": {
            "lattice_depth": 10.0, "lattice_ratio": 1,
            "interaction_strength": 1.0, "boson_number": NOP,
            "supercell_size": SC, "tbf_contact_cutoff": 0.3,
        },
        "move_spread": 0.25, "num_blocks": 4, "num_steps_block": 32,
        "burn_in_blocks": 1, "num_walkers": 16,
        "rng_seed": int(rng.integers(1, 10_000)), "dtype": "float64",
        "est_every": 2,
        "gaussian": seed == 9,
        "ssf_spec": {"num_modes": 4},
        "obd_spec": {"num_pos": 3, "est_every_mult": 2},
        "pair_corr_spec": {"num_bins": 6},
    }
    proc = vmc_exec.Proc.from_config(cfg)
    pin = vmc_exec.ProcInput.from_model_sys_conf_spec(
        vmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    result = proc.exec(pin)
    assert np.isfinite(result.data.blocks.energy.mean)

    v = vmc_exec.Proc.from_config(
        {**cfg, "est_every": 1,
         "obd_spec": {"num_pos": 3, "est_every_mult": 1}})
    vres = v.exec(vmc_exec.ProcInput(pin.state))
    np.testing.assert_array_equal(np.asarray(vres.state.pos),
                                  np.asarray(result.state.pos))

    ckpt = str(tmp_path / "vmc-fuzz-ckpt.h5")
    proc_c = vmc_exec.Proc.from_config(
        {**cfg, "checkpoint_file": ckpt, "checkpoint_every": 3})

    class MPatch:
        def __init__(self):
            self._saved = vmc_exec.Proc._write_checkpoint

        def setattr(self, target, name, value):
            setattr(target, name, value)

        def restore(self):
            vmc_exec.Proc._write_checkpoint = self._saved

    mp = MPatch()
    try:
        killed = kill_after_checkpoint(mp, vmc_exec.Proc, at_blocks=3)
        with pytest.raises(killed):
            proc_c.exec(vmc_exec.ProcInput(pin.state))
    finally:
        mp.restore()
    proc2, pin2 = vmc_exec.Proc.restore_checkpoint(ckpt)
    resumed = proc2.evolve({"checkpoint_file": None}).exec(pin2)
    np.testing.assert_array_equal(np.asarray(resumed.state.pos),
                                  np.asarray(result.state.pos))
    np.testing.assert_array_equal(
        resumed.data.blocks.energy.totals,
        result.data.blocks.energy.totals)


def draw_sweep_rows(rng: np.random.Generator) -> list:
    """Two fused-sweep rows over a random estimator/cadence/window
    draw: same block structure and estimator specs (the SweepProc
    contract), couplings varying across rows."""
    cfg = draw_dmc_config(rng)
    cfg.pop("num_mesh_devices", None)   # fused rows are single-device
    cfg.pop("rebalance_every", None)
    gns = (float(cfg["model_spec"]["interaction_strength"]),
           float(rng.uniform(0.5, 4.0)))
    return [{**cfg,
             "model_spec": {**cfg["model_spec"],
                            "interaction_strength": gn}}
            for gn in gns]


def _sweep_fuzz_one(seed):
    from phd_qmclib_tpu.qmc_exec.sweep import SweepProc

    rng = np.random.default_rng(seed)
    rows = draw_sweep_rows(rng)
    procs = [dmc_exec.Proc.from_config(c) for c in rows]
    inputs = [dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), p)
        for p in procs]
    fused = SweepProc(tuple(procs)).exec(inputs)
    for cfg_row, proc, pin, fres in zip(rows, procs, inputs, fused):
        assert_invariants(cfg_row, fres)
        alone = proc.exec(dmc_exec.ProcInput(pin.state))
        np.testing.assert_array_equal(
            np.asarray(fres.state.pos), np.asarray(alone.state.pos),
            err_msg=f"fused row diverged (seed {seed}, cfg {cfg_row})")
        want, got = _series(alone.data.blocks), _series(
            fres.data.blocks)
        assert want.keys() == got.keys()
        for name in want:
            np.testing.assert_array_equal(
                got[name], want[name],
                err_msg=f"fused {name} (seed {seed}, cfg {cfg_row})")


@pytest.mark.parametrize("seed", [10])
def test_sweep_config_fuzz(seed):
    """Fused sweep x the estimator knob cross-product: every row of the
    fused dispatch stream must be bit-identical to its standalone run
    (series AND final ensemble), for whatever estimator subset /
    cadence / pure-window combination the draw produces.  Seed 10
    draws pure multi-block windows + cadence multipliers."""
    _sweep_fuzz_one(seed)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 12, 14])
def test_sweep_config_fuzz_wide(seed):
    _sweep_fuzz_one(seed)
