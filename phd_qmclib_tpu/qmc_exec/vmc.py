"""VMC procedure: the variational driver loop.

Combines the reference's driver (``/root/reference/src/phd_qmclib/
qmc_exec/vmc/proc.py``) with its concrete mrbp binding
(``mrbp_qmc/vmc_exec/proc.py``).  The TPU version adds a walker-batch
axis: ``num_walkers`` independent chains advance together, and block
statistics average over steps and chains.
"""
import typing as t
import warnings
from dataclasses import dataclass, replace
from functools import cached_property

import numpy as np

from ..models import mrbp
from ..samplers import vmc as vmc_sampler
from . import proc as proc_base
from .data import vmc as vmc_data
from .logging import exec_logger
from ..constants import ER

__all__ = [
    "ModelSysConfSpec",
    "OBDEstSpec",
    "Proc",
    "ProcInput",
    "ProcResult",
    "SSFEstSpec",
]

ModelSysConfSpec = proc_base.ModelSysConfSpec


@dataclass(frozen=True)
class SSFEstSpec:
    """S(k) estimator config (``mrbp_qmc/vmc_exec/proc.py``)."""
    num_modes: int


@dataclass(frozen=True)
class OBDEstSpec:
    """One-body density matrix estimator config: ``n1(sz)`` on a
    ``num_pos``-point grid over ``[0, L/2]`` (the reference stubs this
    estimator out, ``qmc_base/vmc.py:444-450``)."""
    num_pos: int


@dataclass(frozen=True)
class ProcInput(proc_base.ProcInput):
    """Input for the VMC procedure: an initial VMC state."""
    state: vmc_sampler.State

    @classmethod
    def from_model_sys_conf_spec(cls, sys_conf_spec: ModelSysConfSpec,
                                 proc: "Proc"):
        model_spec = proc.model_spec
        dist_type = mrbp.SysConfDistType[sys_conf_spec.dist_type]
        rng = np.random.default_rng(proc.rng_seed)
        num = sys_conf_spec.num_sys_conf or proc.num_walkers
        if num != proc.num_walkers:
            warnings.warn(
                f"num_sys_conf={num} differs from the procedure's "
                f"num_walkers={proc.num_walkers}; using num_walkers "
                f"(the VMC ensemble size is fixed by the procedure)",
                UserWarning)
            num = proc.num_walkers
        confs = np.stack([
            model_spec.init_get_sys_conf(dist_type=dist_type, rng=rng)
            for _ in range(num)]).astype(np.dtype(proc.dtype))
        return cls(proc.sampling.build_state(confs))

    @classmethod
    def from_result(cls, proc_result: "ProcResult", proc: "Proc"):
        return cls(proc_result.state)


@dataclass(frozen=True)
class ProcResult(proc_base.ProcResult):
    """Result of the VMC procedure."""
    state: vmc_sampler.State
    proc: "Proc"
    data: t.Optional[vmc_data.SamplingData] = None


@dataclass(frozen=True)
class Proc(proc_base.Proc):
    """VMC sampling procedure (defaults follow
    ``mrbp_qmc/vmc_exec/proc.py:155-188``)."""

    model_spec: mrbp.Spec
    move_spread: float
    rng_seed: t.Optional[int] = None
    num_blocks: int = 8
    num_steps_block: int = 4096
    burn_in_blocks: t.Optional[int] = None
    keep_iter_data: bool = False
    #: Index of this run's first block in the (rng_seed)-keyed random
    #: stream; continuation runs resume the stream past the blocks the
    #: original run consumed (see ``dmc.Proc.block_offset``).
    block_offset: int = 0
    ssf_spec: t.Optional[SSFEstSpec] = None
    obd_spec: t.Optional[OBDEstSpec] = None
    #: TPU extension: independent Markov chains advanced in lockstep.
    num_walkers: int = 1
    dtype: str = "float32"
    #: Multi-chip: shard chains over this many local devices (None =
    #: single device, 0 = all available devices).
    num_mesh_devices: t.Optional[int] = None
    verbose: bool = False

    # VMC has no density estimator in the reference either.
    density_spec: t.ClassVar[None] = None

    def __post_init__(self):
        _set = object.__setattr__
        _set(self, "move_spread", float(self.move_spread))
        if self.rng_seed is not None:
            _set(self, "rng_seed", int(self.rng_seed))
        _set(self, "num_blocks", int(self.num_blocks))
        _set(self, "num_steps_block", int(self.num_steps_block))
        _set(self, "num_walkers", int(self.num_walkers))
        _set(self, "keep_iter_data", bool(self.keep_iter_data))
        if self.burn_in_blocks is None:
            object.__setattr__(self, "burn_in_blocks",
                               max(1, self.num_blocks // 8))
        else:
            _set(self, "burn_in_blocks", int(self.burn_in_blocks))
        _set(self, "block_offset", int(self.block_offset))

    @classmethod
    def from_config(cls, config: t.Mapping) -> "Proc":
        self_config = dict(config)
        for old, new in (("num_batches", "num_blocks"),
                         ("num_steps_batch", "num_steps_block"),
                         ("burn_in_batches", "burn_in_blocks")):
            if old in self_config:
                warnings.warn(f"{old} attribute is deprecated, use {new} "
                              f"instead", DeprecationWarning)
                self_config[new] = self_config.pop(old)
        model_spec = mrbp.Spec(**self_config.pop("model_spec"))
        ssf_config = self_config.pop("ssf_spec", None)
        ssf_spec = SSFEstSpec(**ssf_config) if ssf_config is not None \
            else None
        obd_config = self_config.pop("obd_spec", None)
        obd_spec = OBDEstSpec(**obd_config) if obd_config is not None \
            else None
        return cls(model_spec=model_spec, ssf_spec=ssf_spec,
                   obd_spec=obd_spec, **self_config)

    def as_config(self) -> dict:
        config = {
            "model_spec": {
                "lattice_depth": self.model_spec.lattice_depth,
                "lattice_ratio": self.model_spec.lattice_ratio,
                "interaction_strength":
                    self.model_spec.interaction_strength,
                "boson_number": self.model_spec.boson_number,
                "supercell_size": self.model_spec.supercell_size,
                "tbf_contact_cutoff": self.model_spec.tbf_contact_cutoff,
                "num_defects": self.model_spec.num_defects,
                "defect_magnitude": self.model_spec.defect_magnitude,
            },
            "move_spread": self.move_spread,
            "rng_seed": self.rng_seed,
            "num_blocks": self.num_blocks,
            "num_steps_block": self.num_steps_block,
            "burn_in_blocks": self.burn_in_blocks,
            "keep_iter_data": self.keep_iter_data,
            "block_offset": self.block_offset,
            "num_walkers": self.num_walkers,
            "dtype": self.dtype,
            "num_mesh_devices": self.num_mesh_devices,
        }
        if self.ssf_spec is not None:
            config["ssf_spec"] = {"num_modes": self.ssf_spec.num_modes}
        if self.obd_spec is not None:
            config["obd_spec"] = {"num_pos": self.obd_spec.num_pos}
        return {k: v for k, v in config.items() if v is not None}

    def evolve(self, config: t.Mapping) -> "Proc":
        self_config = dict(config)
        model_spec = self.model_spec
        model_spec_config = self_config.pop("model_spec", None)
        if model_spec_config is not None:
            model_spec = model_spec.evolve(**model_spec_config)
        ssf_spec = self.ssf_spec
        ssf_config = self_config.pop("ssf_spec", None)
        if ssf_config is not None:
            ssf_spec = SSFEstSpec(**ssf_config) if ssf_spec is None \
                else replace(ssf_spec, **ssf_config)
        obd_spec = self.obd_spec
        obd_config = self_config.pop("obd_spec", None)
        if obd_config is not None:
            obd_spec = OBDEstSpec(**obd_config) if obd_spec is None \
                else replace(obd_spec, **obd_config)
        return replace(self, model_spec=model_spec, ssf_spec=ssf_spec,
                       obd_spec=obd_spec, **self_config)

    @cached_property
    def sampling(self) -> vmc_sampler.Sampling:
        ssf_est_spec = vmc_sampler.SSFEstSpec(self.ssf_spec.num_modes) \
            if self.should_eval_ssf else None
        obd_est_spec = vmc_sampler.OBDEstSpec(self.obd_spec.num_pos) \
            if self.should_eval_obd else None
        mesh = None
        if self.num_mesh_devices is not None:
            from ..parallel import make_walker_mesh
            mesh = make_walker_mesh(self.num_mesh_devices or None)
        return vmc_sampler.Sampling(
            self.model_spec, self.move_spread, self.rng_seed,
            ssf_est_spec=ssf_est_spec, obd_est_spec=obd_est_spec,
            num_walkers=self.num_walkers, mesh=mesh)

    def describe_model_spec(self):
        spec = self.model_spec
        exec_logger.info("Multi-Rods system parameters:")
        exec_logger.info(f"* Lattice depth: {spec.lattice_depth / ER:.3G} ER")
        exec_logger.info(f"* Lattice ratio: {spec.lattice_ratio:.3G}")
        exec_logger.info(
            f"* Interaction strength: "
            f"{spec.interaction_strength / ER:.3G} ER")
        exec_logger.info(f"* Number of bosons: {spec.boson_number:d}")
        exec_logger.info(f"* Supercell size: {spec.supercell_size:.3G} LKP")
        exec_logger.info(f"* RM: {spec.tbf_contact_cutoff:.3G} LKP")

    def build_result(self, state: vmc_sampler.State,
                     sampling_data: vmc_data.SamplingData) -> ProcResult:
        return ProcResult(state, self, sampling_data)

    def exec(self, proc_input: ProcInput) -> ProcResult:
        """Run the VMC sampling (reference driver:
        ``qmc_exec/vmc/proc.py:87-250``)."""
        num_blocks = self.num_blocks
        ns_block = self.num_steps_block
        burn_in_blocks = self.burn_in_blocks
        keep_iter_data = self.keep_iter_data
        should_eval_ssf = self.should_eval_ssf
        should_eval_obd = self.should_eval_obd
        num_walkers = self.num_walkers

        if not isinstance(proc_input, ProcInput):
            raise proc_base.ProcInputError(
                "the input data for the VMC procedure is not valid")

        exec_logger.info("Starting VMC sampling...")
        self.describe_model_spec()

        sampling = self.sampling
        blocks_iter = sampling.blocks(ns_block, proc_input.state,
                                      block_offset=self.block_offset)

        if burn_in_blocks:
            exec_logger.info(
                f"Computing VMC burn-in stage ({burn_in_blocks} blocks)...")
            for _ in range(burn_in_blocks):
                next(blocks_iter)
            exec_logger.info("Burn-in stage completed.")

        shape = (num_blocks, ns_block) if keep_iter_data else (num_blocks,)
        wf_abs_log = np.zeros(shape)
        energy = np.zeros(shape)
        move_stat = np.zeros(shape)
        ssf_data = None
        if should_eval_ssf:
            num_modes = self.ssf_spec.num_modes
            ssf_shape = shape + (num_modes, 3)
            ssf_data = np.zeros(ssf_shape)
        obd_data = None
        if should_eval_obd:
            obd_data = np.zeros(shape + (self.obd_spec.num_pos,))

        block_data = None
        accept_rates = []
        for block_idx in range(num_blocks):
            block_data = next(blocks_iter)
            bp = block_data.iter_props
            e = np.asarray(bp.energy, dtype=np.float64)
            lp = np.asarray(bp.wf_abs_log, dtype=np.float64)
            mv = np.asarray(bp.move_stat, dtype=np.float64)
            accept_rates.append(block_data.accept_rate)
            if keep_iter_data:
                # Per-step chain means (over the walker axis).
                energy[block_idx] = e.mean(axis=1)
                wf_abs_log[block_idx] = lp.mean(axis=1)
                move_stat[block_idx] = mv.mean(axis=1)
                if should_eval_ssf:
                    ssf_data[block_idx] = np.asarray(
                        block_data.iter_ssf) / num_walkers
                if should_eval_obd:
                    obd_data[block_idx] = np.asarray(
                        block_data.iter_obd) / num_walkers
            else:
                energy[block_idx] = e.mean()
                wf_abs_log[block_idx] = lp.mean()
                move_stat[block_idx] = mv.mean()
                if should_eval_ssf:
                    ssf_data[block_idx] = np.asarray(
                        block_data.iter_ssf).mean(axis=0) / num_walkers
                if should_eval_obd:
                    obd_data[block_idx] = np.asarray(
                        block_data.iter_obd).mean(axis=0) / num_walkers

        exec_logger.info("VMC sampling completed.")
        exec_logger.info(
            f"Mean acceptance rate: {float(np.mean(accept_rates)):.4f}")

        props_data = vmc_data.PropsData(wf_abs_log, energy, move_stat)
        reduce_data = bool(keep_iter_data)
        energy_blocks = vmc_data.EnergyBlocks.from_data(props_data,
                                                        reduce_data)
        ssf_blocks = vmc_data.SSFBlocks.from_data(ssf_data, reduce_data) \
            if should_eval_ssf else None
        obd_blocks = vmc_data.OBDBlocks.from_data(obd_data, reduce_data) \
            if should_eval_obd else None
        data_blocks = vmc_data.PropsDataBlocks(energy_blocks, ssf_blocks,
                                               obd_blocks)
        data_series = vmc_data.PropsDataSeries(props_data, ssf_data,
                                               obd_data) \
            if keep_iter_data else None
        sampling_data = vmc_data.SamplingData(data_blocks, data_series)
        last_state = block_data.last_state if block_data is not None \
            else proc_input.state
        return self.build_result(last_state, sampling_data)
