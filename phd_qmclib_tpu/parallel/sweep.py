"""Parameter-sweep axis: independent model specs per mesh row.

The mrbp workload has one large data axis (walkers).  The natural
second mesh dimension — the one that scales past a pod, since it needs
NO cross-row communication and can ride DCN — is a *parameter sweep*:
each row of a ``("sweep", "walkers")`` mesh runs an independent DMC
sampling with its own model parameters (e.g. one interaction coupling
per row of an equation-of-state scan), walkers sharded over the row's
chips, all rows advanced by ONE dispatch per block.

The reference has no analog (its scans are sequential shell loops);
SURVEY §5.8 records this as the natural >1-pod axis.

Model parameters travel as runtime pytree leaves, so rows may differ in
any continuous parameter (coupling, lattice depth, time step, ...) as
long as the STATIC structure (boson number, defect layout, ideal/free
flags, estimator shapes) is shared — enforced at construction.
"""
import dataclasses
import typing as t
from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..samplers import dmc, vmc
from ..samplers.dmc import PropsData, SamplingBlock, State

__all__ = ["ParamSweep", "VmcSweep"]


@dataclass(frozen=True)
class ParamSweep:
    """A stack of DMC samplings advanced as one fused dispatch.

    ``samplings`` must share static structure; leaf parameters may
    differ per row.  With a ``mesh`` (a ``sweep`` axis of size
    ``len(samplings)`` and a ``walkers`` axis), rows map onto mesh rows
    via ``shard_map``.  With ``mesh=None`` the rows are ``vmap``-fused
    on ONE device — the production form for scans whose per-row walker
    count underfills the chip (R rows of W walkers batch into one
    R*W-walker dispatch, recovering the chip's large-batch efficiency
    that a sequential scan forfeits; measured in
    ``benchmarks/param_scan.py --fused``).
    """
    samplings: t.Tuple[dmc.Sampling, ...]
    mesh: t.Optional[jax.sharding.Mesh] = None
    sweep_axis: str = "sweep"
    walker_axis: str = "walkers"

    def __post_init__(self):
        if not self.samplings:
            raise ValueError("need at least one sampling")
        ref = self.samplings[0]
        static = ref.model_spec.static_spec
        for s in self.samplings[1:]:
            if s.model_spec.static_spec != static:
                raise ValueError(
                    "all sweep rows must share the model's static "
                    f"structure; got {s.model_spec.static_spec} vs "
                    f"{static}")
            if (s.max_num_walkers != ref.max_num_walkers
                    or s.target_num_walkers != ref.target_num_walkers):
                raise ValueError("all sweep rows must use the same "
                                 "walker-buffer sizes")
            if (s.density_est_spec != ref.density_est_spec
                    or s.ssf_est_spec != ref.ssf_est_spec
                    or s.obd_est_spec != ref.obd_est_spec
                    or s.pair_corr_est_spec != ref.pair_corr_est_spec
                    or s.itc_est_spec != ref.itc_est_spec
                    or s.est_every != ref.est_every
                    or s.cm_diffusion_est != ref.cm_diffusion_est
                    or s.cm_window_blocks != ref.cm_window_blocks):
                raise ValueError("all sweep rows must use the same "
                                 "estimator specs")
        if self.mesh is None:
            return
        if self.mesh.shape[self.sweep_axis] != len(self.samplings):
            raise ValueError(
                f"mesh '{self.sweep_axis}' axis size "
                f"{self.mesh.shape[self.sweep_axis]} != number of "
                f"sweep rows {len(self.samplings)}")
        n_w = self.mesh.shape[self.walker_axis]
        if ref.max_num_walkers % n_w or ref.target_num_walkers % n_w:
            raise ValueError("walker buffers must divide the "
                             f"'{self.walker_axis}' axis size ({n_w})")

    @property
    def num_rows(self) -> int:
        return len(self.samplings)

    # -- stacked state ------------------------------------------------------

    def build_states(self, sys_conf_sets: t.Sequence[np.ndarray],
                     dtype=None) -> State:
        """Stack per-row initial states into one sweep-sharded State
        (leading axis = sweep row)."""
        if len(sys_conf_sets) != self.num_rows:
            raise ValueError("one configuration set per sweep row")
        states = []
        for sampling, confs in zip(self.samplings, sys_conf_sets):
            # Give the row the sweep's mesh so build_state uses the
            # exact per-shard layout of a standalone sharded run (bit
            # reproducibility of each row); mesh=None (vmap fusion)
            # keeps the single-device layout.
            row = dataclasses.replace(sampling, mesh=self.mesh,
                                      mesh_axis=self.walker_axis)
            states.append(row.build_state(confs, dtype=dtype))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    # -- the fused block dispatch --------------------------------------------

    @cached_property
    def _block_fn(self):
        ref = self.samplings[0]
        if self.mesh is None:
            # Single-device fusion: vmap the per-row block body.  The
            # row axis becomes a leading batch dimension of every op in
            # the scan, so XLA sees one R*W-walker workload per step.
            run_block = ref.make_run_block(measure=True, axis_name=None)

            def fused_block(state, aux, block_keys, step_offset,
                            scalars, cfc, num_time_steps_block: int):
                final_state, aux_out, props, est = jax.vmap(
                    lambda st, ax, k, sc, cf: run_block(
                        st, k, sc, cf, num_time_steps_block,
                        aux_in=ax, step_offset=step_offset)
                )(state, aux, block_keys, scalars, cfc)
                # Match the mesh path's props layout: (nts, R).
                props = jax.tree.map(
                    lambda x: jnp.moveaxis(x, 0, 1), props)
                return final_state, aux_out, props, est

            return jax.jit(fused_block,
                           static_argnames=("num_time_steps_block",))

        n_walker_shards = self.mesh.shape[self.walker_axis]
        walker_axis = self.walker_axis if n_walker_shards > 1 else None
        run_block = ref.make_run_block(
            measure=True, axis_name=walker_axis,
            extra_varying_axes=(self.sweep_axis,))
        P = jax.sharding.PartitionSpec
        sweep = self.sweep_axis
        wax = self.walker_axis if n_walker_shards > 1 else None

        def row_spec(walker_sharded, extra_dims=0):
            dims = [sweep] + [wax if walker_sharded else None] \
                + [None] * extra_dims
            return P(*dims)

        state_spec = State(
            pos=row_spec(True, 1), drift=row_spec(True, 1),
            energies=row_spec(True), weights=row_spec(True),
            masks=row_spec(True), energy=P(sweep), weight=P(sweep),
            num_walkers=row_spec(True), ref_energy=P(sweep),
            accum_energy=P(sweep), total_energy=P(sweep),
            total_weight=P(sweep),
            cmd_accum=(row_spec(True)
                       if self.samplings[0].cm_diffusion_est else None),
            itc_buf=(row_spec(True, 3)
                     if self.samplings[0].itc_est_spec is not None
                     else None),
            itc_filled=(P(sweep)
                        if self.samplings[0].itc_est_spec is not None
                        else None))
        props_spec = PropsData(*(P(None, sweep) for _ in range(5)))
        aux_spec = {name: row_spec(True, len(shape) - 1)
                    for name, shape in ref._pure_aux_shapes().items()}

        def per_shard(state, aux, block_keys, step_offset, scalars,
                      cfc, num_time_steps_block: int):
            # Each program instance sees one sweep row (leading axis 1)
            # and one walker shard.  Squeeze the row axis, run the
            # per-row body, restore the axis.  The row's key was
            # derived from its own rng_seed outside the shard_map, so
            # each row reproduces its sequential sampling exactly.
            squeeze = lambda x: jnp.squeeze(x, axis=0)
            state = jax.tree.map(squeeze, state)
            aux = jax.tree.map(squeeze, aux)
            scalars = jax.tree.map(squeeze, scalars)
            cfc = jax.tree.map(squeeze, cfc)
            block_key = block_keys[0]
            final_state, aux_out, props, est = run_block(
                state, block_key, scalars, cfc, num_time_steps_block,
                aux_in=aux, step_offset=step_offset)
            expand = lambda x: jnp.expand_dims(x, axis=0)
            final_state = jax.tree.map(expand, final_state)
            aux_out = jax.tree.map(expand, aux_out)
            # props are (nts,) per row -> (nts, 1) so rows concatenate
            # on the trailing axis.
            props = jax.tree.map(lambda x: x[:, None], props)
            est = jax.tree.map(expand, est)
            return final_state, aux_out, props, est

        def sweep_block(state, aux, block_keys, step_offset, scalars,
                        cfc, num_time_steps_block: int):
            fn = jax.shard_map(
                lambda st, ax, k, off, sc, cf: per_shard(
                    st, ax, k, off, sc, cf, num_time_steps_block),
                mesh=self.mesh,
                in_specs=(state_spec, aux_spec, P(sweep), P(),
                          P(sweep), P(sweep)),
                out_specs=(state_spec, aux_spec, props_spec, P(sweep)),
            )
            return fn(state, aux, block_keys, step_offset, scalars,
                      cfc)

        return jax.jit(sweep_block,
                       static_argnames=("num_time_steps_block",))

    def _stacked_scalars(self, dtype):
        rows = [s._scalars(dtype) for s in self.samplings]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *rows)

    def _stacked_cfc(self, dtype):
        rows = [s._cast_params(dtype) for s in self.samplings]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *rows)

    def blocks(self, ini_state: State, num_time_steps_block: int,
               burn_in_blocks: int = 0,
               block_offset: int = 0,
               start_block_idx: int = 0,
               aux_init: t.Optional[dict] = None) \
            -> t.Iterator[SamplingBlock]:
        """Yield stacked :class:`SamplingBlock` objects — every array
        has a leading sweep-row axis (props: trailing row axis,
        ``(nts, R)``); one device dispatch advances all rows.

        Each row's key stream derives from ITS OWN ``rng_seed``
        (exactly the sequential sampling's stream, so a fused row
        reproduces its standalone run bit-for-bit).  Rows sharing a
        seed share a stream — give the rows distinct seeds to
        decorrelate them.

        ``start_block_idx``/``aux_init`` resume mid-run checkpoints
        with continuing window phases (cf.
        :meth:`samplers.dmc.Sampling.blocks`); ``aux_init`` carries a
        leading row axis.
        """
        base_keys = jnp.stack([jax.random.PRNGKey(s.rng_seed)
                               for s in self.samplings])
        dtype = ini_state.pos.dtype
        scalars = self._stacked_scalars(dtype)
        cfc = self._stacked_cfc(dtype)
        state = ini_state
        block_idx = int(start_block_idx)
        cmd_window = self.samplings[0].cm_window_blocks
        if self.samplings[0].cm_diffusion_est \
                and state.cmd_accum is None:
            # Restored/loaded states may lack the CM accumulator; open
            # a fresh window (cf. Sampling.blocks).
            state = state._replace(cmd_accum=jnp.zeros(
                state.pos.shape[:2], dtype=state.pos.dtype))
        use_itc = self.samplings[0].itc_est_spec is not None
        if use_itc and state.itc_buf is None:
            state = state._replace(
                itc_buf=jnp.zeros(
                    (self.num_rows,)
                    + self.samplings[0]._itc_buf_shape,
                    dtype=state.pos.dtype),
                itc_filled=jnp.zeros((self.num_rows,),
                                     dtype=jnp.int32))
        # Forward-walking windows (specs are validated identical across
        # rows): the aux carries a leading row axis.
        pfw_window = self.samplings[0].pfw_window_blocks(
            num_time_steps_block)
        aux_shapes = self.samplings[0]._pure_aux_shapes()
        num_rows = self.num_rows

        def _fresh_aux():
            return {name: jnp.zeros((num_rows,) + shape, dtype=dtype)
                    for name, shape in aux_shapes.items()}

        if aux_init is not None:
            # Names absent from the carry start fresh (light
            # checkpoints drop the ITC aux pair).
            aux = {name: (jnp.asarray(aux_init[name], dtype=dtype)
                          if name in aux_init
                          else jnp.zeros((self.num_rows,) + shape,
                                         dtype=dtype))
                   for name, shape in aux_shapes.items()}
        else:
            aux = _fresh_aux()
        fold = jax.vmap(jax.random.fold_in, in_axes=(0, None))
        # The fused block always runs the measuring step function, so
        # burn-in blocks would fill the imaginary-time-correlation
        # ring buffer that a standalone run (whose burn blocks skip
        # all estimator work) leaves empty; reset it at the
        # burn->measure transition below to keep fused rows
        # bit-identical to their standalone runs.  Resumes
        # (start_block_idx past the burn) never pass the transition
        # and keep the restored fill.
        ran_burn = int(start_block_idx) < burn_in_blocks
        while True:
            if self.samplings[0].cm_diffusion_est:
                # Same CM-diffusion window policy as the per-row
                # sampler (Sampling.blocks): reset at the first
                # measured block and every cm_window_blocks after.
                measured_idx = block_idx - burn_in_blocks
                if measured_idx == 0 or (
                        cmd_window and measured_idx > 0
                        and measured_idx % cmd_window == 0):
                    state = state._replace(
                        cmd_accum=jnp.zeros_like(state.cmd_accum))
            if use_itc and ran_burn and block_idx == burn_in_blocks \
                    and burn_in_blocks:
                state = state._replace(
                    itc_buf=jnp.zeros_like(state.itc_buf),
                    itc_filled=jnp.zeros_like(state.itc_filled))
            block_keys = fold(base_keys,
                              int(block_offset) + block_idx)
            burning = block_idx < burn_in_blocks
            if not burning:
                win_pos = (block_idx - burn_in_blocks) % pfw_window
                if win_pos == 0:
                    aux = _fresh_aux()
            else:
                win_pos = 0
            state, aux, props, est = self._block_fn(
                state, aux, block_keys,
                jnp.int32(win_pos * num_time_steps_block), scalars,
                cfc, num_time_steps_block)
            density = est.get("density") if not burning else None
            ssf = est.get("ssf") if not burning else None
            obd = est.get("obd") if not burning else None
            cmd = est.get("cmd") if not burning else None
            g2 = est.get("g2") if not burning else None
            itc = est.get("itc") if not burning else None
            itc_nw = est.get("itc_nw") if not burning else None
            yield SamplingBlock(props, density, ssf, state, obd, cmd,
                                g2, itc, itc_nw,
                                aux_carry=(aux if (pfw_window > 1
                                                   and not burning)
                                           else None))
            block_idx += 1


@dataclass(frozen=True)
class VmcSweep:
    """A stack of VMC samplings advanced as one vmap-fused dispatch.

    The VMC analog of :class:`ParamSweep`'s single-device form: R rows
    whose model specs share static structure (couplings / variational
    cutoffs / move spreads may differ) batch into one R x W-chain
    workload per block — the production form for VMC scan stages whose
    per-row chain counts underfill the chip (e.g. the variational side
    of an OBDM depletion scan).  No reference analog.
    """
    samplings: t.Tuple[vmc.Sampling, ...]

    def __post_init__(self):
        if not self.samplings:
            raise ValueError("need at least one sampling")
        ref = self.samplings[0]
        for s in self.samplings[1:]:
            if s.model_spec.static_spec != ref.model_spec.static_spec:
                raise ValueError(
                    "all sweep rows must share the model's static "
                    "structure")
            if (s.num_walkers != ref.num_walkers
                    or s.gaussian != ref.gaussian
                    or s.ssf_est_spec != ref.ssf_est_spec
                    or s.obd_est_spec != ref.obd_est_spec
                    or s.pair_corr_est_spec != ref.pair_corr_est_spec
                    or s.est_every != ref.est_every):
                raise ValueError("all sweep rows must share chain count "
                                 "and estimator specs")
            if s.mesh is not None or ref.mesh is not None:
                raise ValueError("VmcSweep rows are single-device")

    @property
    def num_rows(self) -> int:
        return len(self.samplings)

    def build_states(self, sys_conf_sets: t.Sequence[np.ndarray]) \
            -> vmc.State:
        """Stack per-row initial states (leading axis = sweep row)."""
        if len(sys_conf_sets) != self.num_rows:
            raise ValueError("one configuration set per sweep row")
        states = [s.build_state(confs)
                  for s, confs in zip(self.samplings, sys_conf_sets)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    @cached_property
    def _block_fn(self):
        run_block = self.samplings[0].make_run_block(axis_name=None)

        def fused_block(state, block_keys, cfc, move_spread,
                        num_steps_block: int):
            final_state, props, ssf, obd, g2, accept = jax.vmap(
                lambda st, k, cf, ms: run_block(st, k, cf, ms,
                                                num_steps_block)
            )(state, block_keys, cfc, move_spread)
            # Match the standalone props layout per row: (nts, W) with
            # a leading row axis.
            return final_state, props, ssf, obd, g2, accept

        return jax.jit(fused_block,
                       static_argnames=("num_steps_block",))

    def blocks(self, num_steps_block: int, ini_state: vmc.State,
               block_offset: int = 0) \
            -> t.Iterator[vmc.SamplingBlock]:
        """Yield stacked blocks — every array has a leading row axis.
        Each row's key stream derives from its own ``rng_seed`` (a
        fused row reproduces its standalone run exactly on matching
        layouts)."""
        base_keys = jnp.stack([jax.random.PRNGKey(s.rng_seed)
                               for s in self.samplings])
        dtype = ini_state.pos.dtype
        cfc = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[s._cast_params(dtype)
                             for s in self.samplings])
        move_spread = jnp.asarray(
            [s.move_spread for s in self.samplings], dtype=dtype)
        state = ini_state
        block_idx = 0
        fold = jax.vmap(jax.random.fold_in, in_axes=(0, None))
        while True:
            block_keys = fold(base_keys,
                              int(block_offset) + block_idx)
            state, props, ssf, obd, g2, accept = self._block_fn(
                state, block_keys, cfc, move_spread, num_steps_block)
            use_ssf = self.samplings[0].ssf_est_spec is not None
            use_obd = self.samplings[0].obd_est_spec is not None
            use_g2 = self.samplings[0].pair_corr_est_spec is not None
            yield vmc.SamplingBlock(
                props, ssf if use_ssf else None,
                np.asarray(accept), state,
                obd if use_obd else None,
                g2 if use_g2 else None)
            block_idx += 1
