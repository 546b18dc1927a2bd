"""Pallas TPU kernel for the fused Bijl-Jastrow local energy + drift.

The DMC hot op is an all-pairs reduction per walker (structurally the
same problem as attention scores): for every walker, O(N^2) minimum-image
pair terms reduce to a per-particle drift and a per-walker energy.  The
XLA path (``models/jastrow.py``) materializes (B, N, N) temporaries in
HBM; this kernel keeps the whole pair block of a walker tile in VMEM and
streams walker tiles through the grid, making the op compute-bound on
the single fused sincos per pair.

Layout: a grid step processes ``TW`` walkers; the pair block is a
``(TW*N, N)`` 2D array (rows = walker-major/particle-i, lanes =
particle-j), the natural (sublane x lane) mapping for N = 128.

Parameters arrive as a packed f32 vector in SMEM; static model structure
(particle count, free/ideal flags) specializes the kernel at trace time.
Reference semantics: ``qmc_base/jastrow/model.py:777-856`` with the mrbp
analytic functions (``mrbp_qmc/model.py:403-551``).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import trig

__all__ = ["energy_and_drift_pallas", "pack_params", "supports"]

#: Packed-parameter layout (f32 SMEM vector).
PARAMS_SIZE = 16
(P_V0, P_E0, P_K1, P_KP1, P_ZA, P_ZB, P_L, P_RM, P_K2, P_BETA, P_ROFF,
 P_AM, P_V0D) = range(13)


def pack_params_traced(cfc):
    """Traceable packing of the mrbp CFCParams pytree into the kernel's
    SMEM vector (works under jit with traced parameter leaves)."""
    mp_, obf, tbf = cfc.model_params, cfc.obf_params, cfc.tbf_params
    entries = [obf.lattice_depth, obf.param_e0, obf.param_k1,
               obf.param_kp1, obf.well_width, obf.barrier_width,
               mp_.supercell_size, jnp.abs(tbf.tbf_contact_cutoff),
               tbf.param_k2, tbf.param_beta, tbf.param_r_off,
               tbf.param_am, mp_.defect_magnitude]
    entries += [0.0] * (PARAMS_SIZE - len(entries))
    return jnp.asarray(jnp.stack([jnp.float32(e) for e in entries]))[
        None, :]


def pack_params(cfc) -> np.ndarray:
    """Pack the mrbp CFCParams pytree into the kernel's SMEM vector."""
    mp_, obf, tbf = cfc.model_params, cfc.obf_params, cfc.tbf_params
    vec = np.zeros((1, PARAMS_SIZE), dtype=np.float32)
    vec[0, P_V0] = obf.lattice_depth
    vec[0, P_E0] = obf.param_e0
    vec[0, P_K1] = obf.param_k1
    vec[0, P_KP1] = obf.param_kp1
    vec[0, P_ZA] = obf.well_width
    vec[0, P_ZB] = obf.barrier_width
    vec[0, P_L] = mp_.supercell_size
    vec[0, P_RM] = abs(tbf.tbf_contact_cutoff)
    vec[0, P_K2] = tbf.param_k2
    vec[0, P_BETA] = tbf.param_beta
    vec[0, P_ROFF] = tbf.param_r_off
    vec[0, P_AM] = tbf.param_am
    vec[0, P_V0D] = mp_.defect_magnitude
    return vec


def supports(nop: int, dtype) -> bool:
    """Whether the Pallas path handles this configuration."""
    return nop <= 128 and jnp.dtype(dtype) == jnp.float32


# Reduced-range trig polynomials — single source shared with the
# production path (``ops/trig.py``); jnp evaluation lowers fine inside
# the Pallas kernel body.
_sincos_poly = trig.sincos_poly32
_tancot_poly = trig.tancot_poly32


def _kernel(params_ref, pos_ref, energy_ref, drift_ref, *maybe_logpsi,
            nop: int, is_free: bool, is_ideal: bool, defects_sep: int,
            tw: int, npad: int, with_log_psi: bool):
    logpsi_ref = maybe_logpsi[0] if maybe_logpsi else None
    p = params_ref
    tile = pos_ref[:]  # (TW, npad); cols >= nop are zero padding

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tw, npad), 1)
    valid_col = rows_i < nop
    fdtype = tile.dtype

    ob_drift = jnp.zeros((tw, npad), dtype=fdtype)
    ob_kin = jnp.zeros((tw, npad), dtype=fdtype)
    pot = jnp.zeros((tw, npad), dtype=fdtype)
    ob_log = jnp.zeros((tw, npad), dtype=fdtype)

    if not is_free:
        v0, e0 = p[0, P_V0], p[0, P_E0]
        k1, kp1 = p[0, P_K1], p[0, P_KP1]
        z_a, z_b = p[0, P_ZA], p[0, P_ZB]
        n_cell = jnp.floor(tile)
        z_cell = tile - n_cell
        in_barrier = z_a < z_cell
        ob_ldz = jnp.where(in_barrier,
                           kp1 * jnp.tanh(kp1 * (z_cell - 1.0 + 0.5 * z_b)),
                           -k1 * jnp.tan(k1 * (z_cell - 0.5 * z_a)))
        ob_d2 = jnp.where(in_barrier, v0 - e0, -e0)
        if defects_sep == 1:
            barrier_v = jnp.full_like(tile, p[0, P_V0D])
        else:
            on_defect = jnp.mod(n_cell, float(defects_sep)) == 0
            barrier_v = jnp.where(on_defect, p[0, P_V0D], v0)
        pot_v = jnp.where(in_barrier, barrier_v, 0.0)
        ob_drift = jnp.where(valid_col, ob_ldz, 0.0)
        ob_kin = jnp.where(valid_col, -ob_d2 + ob_ldz ** 2, 0.0)
        pot = jnp.where(valid_col, pot_v, 0.0)
        if with_log_psi:
            cf = jnp.sqrt(1.0 + v0 / e0
                          * jnp.sinh(0.5 * jnp.sqrt(v0 - e0) * z_b) ** 2)
            f1 = jnp.where(in_barrier,
                           jnp.cosh(kp1 * (z_cell - 1.0 + 0.5 * z_b)),
                           cf * jnp.cos(k1 * (z_cell - 0.5 * z_a)))
            ob_log = jnp.where(valid_col, jnp.log(jnp.abs(f1)), 0.0)

    drift = ob_drift
    kin_rows = ob_kin
    log_rows = ob_log

    if not is_ideal:
        L = p[0, P_L]
        rm, k2 = p[0, P_RM], p[0, P_K2]
        beta, r_off, am = p[0, P_BETA], p[0, P_ROFF], p[0, P_AM]
        half = 0.5 * L

        # Pair block: rows = (walker, particle-i) flattened, lanes = j.
        # Both orientations build via 3D broadcast + leading-dim collapse
        # (the direct (tw, npad) -> (rows, 1) reshape is a lane->sublane
        # relayout Mosaic rejects).
        rows = tw * npad
        zi = jnp.broadcast_to(tile[:, :, None], (tw, npad, npad)) \
            .reshape(rows, npad)
        zj = jnp.broadcast_to(tile[:, None, :], (tw, npad, npad)) \
            .reshape(rows, npad)
        d = zi - zj
        # Round-based minimum image (positions live in [0, L)).
        d = d - L * jnp.round(d * (1.0 / L))
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, npad), 0) \
            % npad
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, npad), 1)
        off = (i_idx != j_idx) & (j_idx < nop) & (i_idx < nop)
        r = jnp.where(off, jnp.abs(d), 0.25 * L)

        in_cut = r < rm
        arg = jnp.where(in_cut, k2 * (r - r_off), jnp.pi * r / L)
        one = jnp.ones_like(r)
        pref = jnp.pi / L
        # Reduced-range polynomials (the argument never leaves
        # (-pi/2, pi/2]); same coefficients as models/mrbp.py.  The
        # log path needs the factors (sincos); the forward path only
        # their ratio (rational tan, fewer fma).
        if with_log_psi:
            s, c = _sincos_poly(arg)
            s_o = jnp.where(in_cut, one, s)
            c_o = jnp.where(in_cut, one, c)
            c_i = jnp.where(in_cut, c, one)
            s_i = jnp.where(in_cut, s, jnp.zeros_like(r))
            cot = c_o / s_o
            ldz = jnp.where(in_cut, -k2 * s_i / c_i, pref * beta * cot)
            ldz2 = jnp.where(in_cut, -k2 * k2 * one,
                             pref * pref * beta
                             * ((beta - 1.0) * cot * cot - 1.0))
        else:
            # Forward-only fast path: one divide serves both branches
            # (tan = xP/Q inside the cutoff, cot = Q/(xP) outside).
            s, c = _tancot_poly(arg)
            num = jnp.where(in_cut, s, c)
            den = jnp.where(in_cut, c, s)
            v = num / den
            ldz = jnp.where(in_cut, -k2, pref * beta) * v
            ldz2 = jnp.where(in_cut, -k2 * k2 * one,
                             pref * pref * beta
                             * ((beta - 1.0) * v * v - 1.0))
        sgn = jnp.where(d >= 0, one, -one)

        drift_pair = jnp.where(off, ldz * sgn, 0.0).sum(
            axis=1).reshape(tw, npad)
        kin_pair = jnp.where(off, -ldz2 + ldz * ldz, 0.0).sum(
            axis=1).reshape(tw, npad)
        drift = drift + drift_pair
        kin_rows = kin_rows + kin_pair
        if with_log_psi:
            log_f2 = jnp.where(in_cut, jnp.log(jnp.abs(am * c_i)),
                               beta * jnp.log(s_o))
            log_pair = jnp.where(off, log_f2, 0.0).sum(
                axis=1).reshape(tw, npad)
            log_rows = log_rows + 0.5 * log_pair

    drift = jnp.where(valid_col, drift, 0.0)
    energy = (kin_rows - drift * drift + pot).sum(axis=1, keepdims=True)
    energy_ref[:] = jnp.broadcast_to(energy, (tw, 128))
    drift_ref[:] = drift
    if with_log_psi:
        logpsi_ref[:] = jnp.broadcast_to(
            log_rows.sum(axis=1, keepdims=True), (tw, 128))


def _diffuse_kernel(params_ref, dyn_ref, pos_ref, drift_ref, energy_ref,
                    npos_ref, nenergy_ref, ndrift_ref, nweight_ref, *,
                    nop: int, is_free: bool, is_ideal: bool,
                    defects_sep: int, tw: int, npad: int):
    """Fused DMC diffusion step: in-kernel Gaussian noise (Box-Muller on
    the TPU hardware PRNG), drift move, supercell recast, pairwise
    energy+drift of the diffused walkers, and the branching weight -
    everything the XLA step does between the parent gather and the next
    comb, in one VMEM-resident pass.

    ``dyn_ref`` (SMEM): [dt, sigma, e_ref, seed_lo, step_salt].
    """
    p = params_ref
    dt = dyn_ref[0, 0]
    sigma = dyn_ref[0, 1]
    e_ref = dyn_ref[0, 2]
    seed = dyn_ref[0, 3]
    salt = dyn_ref[0, 4]
    L = p[0, P_L]

    # Per-tile, per-step PRNG stream (single combined seed keeps the
    # prng_seed call portable across pallas versions).
    pltpu.prng_seed(seed.astype(jnp.int32)
                    + salt.astype(jnp.int32) * 7919
                    + pl.program_id(0) * 104729)
    def _uniform24(shape):
        # 24-bit uniforms: unsigned shift, then int32 view for the f32
        # cast (Mosaic lacks a direct uint32 -> f32 cast; after >> 8 the
        # value is non-negative in int32).
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 24))

    # Box-Muller: u1 in (0, 1], u2 in [0, 1).
    u1 = _uniform24((tw, npad)) + (1.0 / (1 << 24))
    u2 = _uniform24((tw, npad))
    radius = jnp.sqrt(-2.0 * jnp.log(u1))
    xi = radius * jnp.cos((2.0 * jnp.pi) * u2)

    cpos = pos_ref[:]
    cdrift = drift_ref[:]
    moved = cpos + 2.0 * cdrift * dt + sigma * xi
    # recast_to_supercell([0, L)).
    npos = moved - L * jnp.floor(moved / L)
    npos_ref[:] = npos

    _kernel(params_ref, npos_ref, nenergy_ref, ndrift_ref, nop=nop,
            is_free=is_free, is_ideal=is_ideal, defects_sep=defects_sep,
            tw=tw, npad=npad, with_log_psi=False)

    cenergy = energy_ref[:]  # (tw, 128) col-broadcast parent energies
    nenergy = nenergy_ref[:]
    nweight_ref[:] = jnp.exp(-dt * (0.5 * (nenergy + cenergy) - e_ref))


@functools.partial(jax.jit, static_argnames=(
    "nop", "is_free", "is_ideal", "defects_sep", "tw", "interpret"))
def diffuse_energy_drift_pallas(cpos, cdrift, cenergy, params_vec,
                                dyn_vec, *, nop: int, is_free: bool,
                                is_ideal: bool, defects_sep: int = 1,
                                tw: int = 32, interpret: bool = False):
    """Fused drift-diffusion + energy/drift + branching weight.

    ``cpos, cdrift (W, nop)``, ``cenergy (W,)`` are the cloned parents;
    ``dyn_vec (1, 8)`` packs [dt, sigma, e_ref, seed, salt, 0...].
    Returns ``(npos (W, nop), nenergy (W,), ndrift (W, nop),
    nweight (W,))``.  Uses the TPU hardware PRNG (a different - equally
    valid - random stream than the XLA threefry path).

    Status (v5e, 17408 x 128): validated against XLA recomputation to
    f32 rounding with exact Gaussian moments, but measured 14.7 ms vs
    ~14.4 ms for the XLA composite - the in-kernel Box-Muller costs what
    the fused threefry pass costs, so the sampler keeps the XLA path.
    Kept as a correct single-dispatch building block for future tuning
    (e.g. replacing Box-Muller with a cheaper normal approximation).
    """
    w, n = cpos.shape
    assert n == nop and nop <= 128 and w % tw == 0
    npad = 128
    if n < npad:
        cpos_p = jnp.pad(cpos, ((0, 0), (0, npad - n)))
        cdrift_p = jnp.pad(cdrift, ((0, 0), (0, npad - n)))
    else:
        cpos_p, cdrift_p = cpos, cdrift
    cenergy_p = jnp.broadcast_to(cenergy[:, None], (w, 128))

    kernel = functools.partial(
        _diffuse_kernel, nop=nop, is_free=is_free, is_ideal=is_ideal,
        defects_sep=defects_sep, tw=tw, npad=npad)

    vspec = pl.BlockSpec((tw, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(w // tw,),
        in_specs=[
            pl.BlockSpec((1, PARAMS_SIZE), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vspec, vspec, vspec,
        ],
        out_shape=[jax.ShapeDtypeStruct((w, npad), cpos.dtype),
                   jax.ShapeDtypeStruct((w, 128), cpos.dtype),
                   jax.ShapeDtypeStruct((w, npad), cpos.dtype),
                   jax.ShapeDtypeStruct((w, 128), cpos.dtype)],
        out_specs=[vspec, vspec, vspec, vspec],
        interpret=interpret,
    )(params_vec, dyn_vec, cpos_p, cdrift_p, cenergy_p)

    npos, nenergy, ndrift, nweight = out
    return npos[:, :n], nenergy[:, 0], ndrift[:, :n], nweight[:, 0]


@functools.partial(jax.jit, static_argnames=(
    "nop", "is_free", "is_ideal", "defects_sep", "tw", "with_log_psi",
    "interpret"))
def energy_and_drift_pallas(pos, params_vec, *, nop: int, is_free: bool,
                            is_ideal: bool, defects_sep: int = 1,
                            tw: int = 8, with_log_psi: bool = False,
                            interpret: bool = False):
    """Fused (energy, drift[, log_psi]) for walkers ``pos (W, nop)``.

    ``W`` must be a multiple of ``tw``; ``nop <= 128``.  Returns
    ``(energy (W,), drift (W, nop))`` and optionally ``log_psi (W,)``.
    """
    w, n = pos.shape
    assert n == nop and nop <= 128
    assert w % tw == 0, "walker count must be a multiple of the tile"
    npad = 128
    if n < npad:
        pos_p = jnp.pad(pos, ((0, 0), (0, npad - n)))
    else:
        pos_p = pos

    kernel = functools.partial(
        _kernel, nop=nop, is_free=is_free, is_ideal=is_ideal,
        defects_sep=defects_sep, tw=tw, npad=npad,
        with_log_psi=with_log_psi)

    out_shapes = [jax.ShapeDtypeStruct((w, 128), pos.dtype),
                  jax.ShapeDtypeStruct((w, npad), pos.dtype)]
    out_specs = [pl.BlockSpec((tw, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((tw, npad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if with_log_psi:
        out_shapes.append(jax.ShapeDtypeStruct((w, 128), pos.dtype))
        out_specs.append(pl.BlockSpec((tw, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(w // tw,),
        in_specs=[
            pl.BlockSpec((1, PARAMS_SIZE), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tw, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(params_vec, pos_p)

    energy = outs[0][:, 0]
    drift = outs[1][:, :n]
    if with_log_psi:
        return outs[2][:, 0], energy, drift
    return energy, drift
