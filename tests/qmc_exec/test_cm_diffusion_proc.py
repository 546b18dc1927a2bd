"""CM-diffusion observable through the execution/data layer
(VERDICT r2 #3): config-driven runs produce, round-trip and merge
``CMDiffusionBlocks``, with windows spanning blocks.
"""
import numpy as np

from tests.warn_utils import expect_opt_block_warning
import pytest

from phd_qmclib_tpu import ideal
from phd_qmclib_tpu.models import mrbp
from phd_qmclib_tpu.qmc_exec import dmc as dmc_exec, io as io_mod


def make_proc(**kw):
    spec = mrbp.Spec(lattice_depth=5.0, lattice_ratio=1.0,
                     interaction_strength=0.0, boson_number=8,
                     supercell_size=8.0, tbf_contact_cutoff=0.3)
    base = dict(model_spec=spec, time_step=2e-3, max_num_walkers=320,
                target_num_walkers=256, num_blocks=4,
                num_time_steps_block=64, burn_in_blocks=2, rng_seed=31,
                dtype="float64",
                cm_diffusion_spec=dmc_exec.CMDiffusionEstSpec(
                    window_blocks=2))
    base.update(kw)
    return dmc_exec.Proc(**base)


def run(proc):
    proc_input = dmc_exec.ProcInput.from_model_sys_conf_spec(
        dmc_exec.ModelSysConfSpec(dist_type="RANDOM"), proc)
    return proc.exec(proc_input)


class TestCmDiffusionProc:

    @pytest.fixture(scope="class")
    def result(self):
        return run(make_proc())

    def test_windows_span_blocks(self, result):
        cmd = result.data.blocks.cm_diffusion
        # 4 measured blocks / window_blocks=2 -> 2 windows of 128 steps.
        assert cmd.w2_series.shape == (2, 128)
        assert cmd.tau_step == pytest.approx(2e-3)
        # <W^2> grows through the whole window (no per-block reset dip).
        w2 = cmd.w2_series.mean(axis=0)
        assert w2[64] > w2[63] > 0  # continuous across the block seam
        assert w2[-1] > 2 * w2[31]

    def test_recovers_band_curvature(self, result):
        # Ideal lattice gas: the trial orbital is exact, so the slope
        # must recover the single-particle band-curvature ratio.
        cmd = result.data.blocks.cm_diffusion
        ratio, err = cmd.effective_mass_ratio()
        exact = ideal.effective_mass_ratio(5.0, 1.0)
        assert ratio == pytest.approx(exact, rel=0.15), (ratio, exact)

    def test_hdf5_roundtrip_and_merge(self, result, tmp_path):
        handler = io_mod.DmcHDF5FileHandler(str(tmp_path / "cmd.h5"),
                                            group="g")
        handler.dump(result)
        loaded = handler.load()
        cmd = loaded.data.blocks.cm_diffusion
        np.testing.assert_array_equal(
            cmd.w2_series, result.data.blocks.cm_diffusion.w2_series)
        assert cmd.boson_number == 8

        merged = loaded.data.blocks.merge(result.data.blocks)
        assert merged.cm_diffusion.num_windows == 4

    def test_report_renders_effective_mass(self, result):
        from phd_qmclib_tpu.qmc_exec.report import describe_dmc

        with expect_opt_block_warning():
            text = describe_dmc(result)
        assert "m/m* (superfluid fraction)" in text
        assert "2 CM-diffusion windows" in text

    def test_config_roundtrip(self):
        proc = make_proc()
        config = proc.as_config()
        assert config["cm_diffusion_spec"]["window_blocks"] == 2
        assert dmc_exec.Proc.from_config(config) == proc

    def test_keep_iter_data_series(self):
        result = run(make_proc(num_blocks=2, burn_in_blocks=1,
                               keep_iter_data=True,
                               cm_diffusion_spec=
                               dmc_exec.CMDiffusionEstSpec(
                                   window_blocks=1)))
        assert result.data.series.cmd.shape == (2, 64, 2)

    def test_window_validation(self):
        with pytest.raises(ValueError, match="window_blocks"):
            make_proc(num_blocks=5,
                      cm_diffusion_spec=dmc_exec.CMDiffusionEstSpec(
                          window_blocks=2))
