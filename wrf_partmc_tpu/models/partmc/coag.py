"""Stochastic coagulation — vectorized on-device Monte Carlo.

Equivalent of PartMC's ``coagulation`` + ``coag_kernel_brown`` modules
(``mc_coag(COAG_KERNEL_TYPE_BROWN, ...)`` called per cell per chem step,
``wrf_pmc_driver.F90:189-198``).  Kernels provided: zero, constant, additive
(Golovin), sedimentation, and Brownian (continuum/free-molecular Fuchs
transition — the production default).

TPU redesign of the MC scheme: the reference's binned max-kernel
accept-reject loop over random pairs is replaced by the super-droplet
all-or-nothing scheme (Shima et al. 2009, Q. J. R. Meteorol. Soc. 135:1307):
each step draws floor(P/2) non-overlapping candidate pairs from a random
permutation of the slots, scales the per-pair event probability by
n(n-1)/(2*floor(n/2)) so the expected event count matches the Smoluchowski
rate, and on an event merges mass into the lower-multiplicity partner while
decrementing the higher-multiplicity one — particle count and static shapes
preserved, number/mass statistically exact.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants as c
from .aero_data import AeroData, particle_mass, particle_volume, vol_to_diam
from .aero_state import AeroState
from .env_state import EnvState

KERNEL_ZERO = "zero"
KERNEL_CONSTANT = "constant"
KERNEL_ADDITIVE = "additive"
KERNEL_SEDI = "sedi"
KERNEL_BROWN = "brown"

# magnitudes used by PartMC's test kernels
CONSTANT_KERNEL_COEF = 1.0e-15     # [m3 s-1]
ADDITIVE_KERNEL_COEF = 1000.0      # [s-1] multiplies volume sum


def cunningham_slip(diam, mean_free_path):
    kn = 2.0 * mean_free_path / diam
    return 1.0 + kn * (1.257 + 0.4 * jnp.exp(-1.1 / kn))


def brownian_kernel(d1, d2, m1, m2, env: EnvState):
    """Fuchs-form Brownian coagulation kernel [m3 s-1]
    (Seinfeld & Pandis 2006, Table 13.1; PartMC coag_kernel_brown).

    d: wet diameters [m]; m: particle masses [kg]; shapes [cells..., n] with
    env fields [cells...] (a trailing particle axis is added to env values).
    """
    temp = jnp.asarray(env.temp)[..., None]
    mfp = jnp.asarray(env.air_mean_free_path)[..., None]
    kT = c.BOLTZMANN * temp

    def props(d, m):
        cc = cunningham_slip(d, mfp)
        diff = kT * cc / (3.0 * jnp.pi * c.AIR_DYN_VISC * d)   # diffusivity
        spd = jnp.sqrt(8.0 * kT / (jnp.pi * jnp.maximum(m, 1e-30)))  # thermal speed
        lp = 8.0 * diff / (jnp.pi * spd)                       # particle m.f.p.
        g = ((d + lp) ** 3 - (d * d + lp * lp) ** 1.5) / (3.0 * d * lp) - d
        return diff, spd, g

    D1, c1, g1 = props(d1, m1)
    D2, c2, g2 = props(d2, m2)
    dsum = d1 + d2
    Dsum = D1 + D2
    cbar = jnp.sqrt(c1 * c1 + c2 * c2)
    gbar = jnp.sqrt(g1 * g1 + g2 * g2)
    denom = dsum / (dsum + 2.0 * gbar) + 8.0 * Dsum / (cbar * dsum)
    return 2.0 * jnp.pi * Dsum * dsum / denom


def sedi_kernel(d1, d2, m1, m2, env: EnvState):
    """Gravitational collection kernel with unit efficiency."""
    def v_term(d, m):
        rho_p = m / jnp.maximum((jnp.pi / 6.0) * d ** 3, 1e-300)
        cc = cunningham_slip(d, jnp.asarray(env.air_mean_free_path)[..., None])
        return rho_p * d * d * c.GRAV * cc / (18.0 * c.AIR_DYN_VISC)
    area = (jnp.pi / 4.0) * (d1 + d2) ** 2
    return area * jnp.abs(v_term(d1, m1) - v_term(d2, m2))


def eval_kernel(kind: str, d1, d2, m1, m2, env: EnvState):
    if kind == KERNEL_ZERO:
        return jnp.zeros_like(d1)
    if kind == KERNEL_CONSTANT:
        return jnp.full_like(d1, CONSTANT_KERNEL_COEF)
    if kind == KERNEL_ADDITIVE:
        v1 = (jnp.pi / 6.0) * d1 ** 3
        v2 = (jnp.pi / 6.0) * d2 ** 3
        return ADDITIVE_KERNEL_COEF * (v1 + v2)
    if kind == KERNEL_SEDI:
        return sedi_kernel(d1, d2, m1, m2, env)
    if kind == KERNEL_BROWN:
        return brownian_kernel(d1, d2, m1, m2, env)
    raise ValueError(f"unknown kernel {kind!r}")


def coag_step(state: AeroState, aero_data: AeroData, env: EnvState, dt, key,
              kernel: str = KERNEL_BROWN, return_events: bool = False):
    """One Monte Carlo coagulation step over every cell at once.

    Works on arbitrary cell batch shapes [...]; cost O(P) per cell
    (vs the reference's O(n_samp) accept-reject loop per cell,
    ``wrf_pmc_driver.F90:192-194``).

    TPU path: the per-cell random pairing is realized by ONE batched
    one-hot MXU permutation (``ops/place.gather_rows``) that puts each
    pair's partners in adjacent slots; all pair math and the merged
    write-back are then pure elementwise ops on the even/odd slot halves.
    Slots are meaningless, so the permuted layout is simply kept.

    ``return_events=True`` additionally returns the per-pair removal records
    (the reference's ``aero_info_array`` with action=AERO_INFO_COAG,
    ``wrf_pmc_driver.F90:251``): ``{"removed_id", "other_id"}`` of shape
    [..., P//2] int32 with -1 marking pairs that produced no removal —
    ``removed_id`` is the id of the computational particle whose multiplicity
    reached zero, ``other_id`` its surviving coagulation partner.
    """
    from ..partmc.aero_state import pack_payload, unpack_payload
    from ...ops.place import gather_rows
    from .aero_data import vol_to_diam

    P = state.capacity
    n_pair = P // 2
    cell_shape = state.cell_shape
    S = state.vol.shape[-2]
    K = state.n_src_comp
    C = 1
    for s in cell_shape:
        C *= s
    k_perm, k_evt = jax.random.split(key)

    # random permutation with alive slots first (dead get +inf keys), then
    # the even/odd pair partners are routed to the two contiguous HALVES of
    # the output (pair t = output slots (t, t + n_pair)): the reindexing is
    # int-only on the permutation, so the payload moves once with contiguous
    # halves — strided payload slices cost 3x in layout padding on TPU
    u = jax.random.uniform(k_perm, state.num.shape)
    perm = jnp.argsort(jnp.where(state.alive, u, 2.0), axis=-1)   # [..., P]
    src = jnp.concatenate([perm[..., 0:2 * n_pair:2],
                           perm[..., 1:2 * n_pair:2],
                           perm[..., 2 * n_pair:]], axis=-1)
    rows = gather_rows(pack_payload(state),
                       src.reshape(C, P).astype(jnp.int32))       # [C, CH, P]
    rows = rows.reshape(*cell_shape, rows.shape[1], P)
    A = rows[..., :n_pair]                              # [.., CH, n_pair]
    B = rows[..., n_pair:2 * n_pair]

    def side(r):
        num = r[..., 0, :]
        vol = r[..., 6:6 + S, :]
        pvol = jnp.sum(vol, axis=-2)
        mass = particle_mass(vol, aero_data)
        diam = vol_to_diam(jnp.maximum(pvol, 1e-300))
        return num, vol, diam, mass

    num_a, vol_a, d_a, m_a = side(A)
    num_b, vol_b, d_b, m_b = side(B)

    kk = eval_kernel(kernel, d_a, d_b, m_a, m_b, env)
    n = state.n_alive().astype(jnp.float32)[..., None]
    pair_scale = n * (n - 1.0) / (2.0 * jnp.maximum(jnp.floor(n / 2.0), 1.0))
    V = jnp.asarray(env.cell_volume, jnp.float32)
    V = V[..., None] if V.ndim else V
    xi_max = jnp.maximum(num_a, num_b)
    xi_min = jnp.minimum(num_a, num_b)
    p_evt = pair_scale * kk * xi_max * dt / V                      # expected events

    # gamma = number of coalescence events for this pair this step
    g_floor = jnp.floor(p_evt)
    g = g_floor + (jax.random.uniform(k_evt, p_evt.shape) < (p_evt - g_floor))
    both = (num_a > 0) & (num_b > 0)
    # cap so the larger-multiplicity partner cannot go negative
    g = jnp.where(both, jnp.minimum(g, jnp.floor(xi_max / jnp.maximum(xi_min, 1e-30))), 0.0)
    did = (g > 0)

    # merge: small-multiplicity side absorbs mass; big side loses count
    a_is_big = num_a >= num_b
    mb = a_is_big[..., None, :]
    big = jnp.where(mb, A, B)
    sml = jnp.where(mb, B, A)
    dec = g * xi_min
    new_big_num = jnp.maximum(big[..., 0, :] - dec, 0.0)
    big_dead = new_big_num <= 0.0
    out_big = big.at[..., 0, :].set(new_big_num)
    out_big = jnp.where(big_dead[..., None, :], 0.0, out_big)
    vol_new = sml[..., 6:6 + S, :] + g[..., None, :] * big[..., 6:6 + S, :]

    # source-component merge (aero_component equivalent): combine the two
    # K-lists, accumulate duplicate sources into their first occurrence,
    # keep the top-K by attributed volume (fixed-width truncation)
    sv_s = jnp.moveaxis(sml[..., 6 + S:6 + S + K, :], -2, -1)   # [.., np, K]
    si_s = jnp.round(jnp.moveaxis(sml[..., 6 + S + K:6 + S + 2 * K, :],
                                  -2, -1)).astype(jnp.int32)
    sv_b = g[..., :, None] * jnp.moveaxis(big[..., 6 + S:6 + S + K, :],
                                          -2, -1)
    si_b = jnp.round(jnp.moveaxis(big[..., 6 + S + K:6 + S + 2 * K, :],
                                  -2, -1)).astype(jnp.int32)
    cv = jnp.concatenate([sv_s, sv_b], axis=-1)            # [.., n_pair, 2K]
    ci = jnp.concatenate([si_s, si_b], axis=-1)
    eq = (ci[..., :, None] == ci[..., None, :])            # [.., 2K, 2K]
    first = jnp.argmax(eq, axis=-1)                        # first occurrence
    oh = jax.nn.one_hot(first, 2 * K, dtype=cv.dtype)
    cv_m = jnp.einsum("...jk,...j->...k", oh, cv)          # accumulated
    is_first = first == jnp.arange(2 * K)
    cv_m = jnp.where(is_first & (ci >= 0), cv_m, -1.0)     # sort key
    order = jnp.argsort(-cv_m, axis=-1)[..., :K]           # top-K entries
    ohk = jax.nn.one_hot(order, 2 * K, dtype=cv.dtype)     # [.., K, 2K]
    sv_out = jnp.maximum(jnp.einsum("...kj,...j->...k", ohk, cv_m), 0.0)
    si_out = jnp.einsum("...kj,...j->...k", ohk,
                        ci.astype(cv.dtype)).astype(jnp.int32)
    si_out = jnp.where(sv_out > 0.0, si_out, -1)
    sv_out = jnp.where(did[..., None], sv_out, sv_s)
    si_out = jnp.where(did[..., None], si_out, si_s)

    out_sml = sml
    out_sml = out_sml.at[..., 6:6 + S, :].set(
        jnp.where(did[..., None, :], vol_new, sml[..., 6:6 + S, :]))
    out_sml = out_sml.at[..., 6 + S:6 + S + K, :].set(
        jnp.moveaxis(sv_out, -1, -2))
    out_sml = out_sml.at[..., 6 + S + K:6 + S + 2 * K, :].set(
        jnp.moveaxis(si_out.astype(cv.dtype), -1, -2))

    out_A = jnp.where(mb, out_big, out_sml)
    out_B = jnp.where(mb, out_sml, out_big)
    parts = [out_A, out_B]
    if P > 2 * n_pair:                                  # odd capacity
        parts.append(rows[..., 2 * n_pair:])
    out = jnp.concatenate(parts, axis=-1).reshape(C, rows.shape[-2], P)
    st = unpack_payload(state, out)
    # primary source label follows the largest component
    ohp = jax.nn.one_hot(jnp.argmax(st.src_vol, axis=-2), K,
                         dtype=jnp.float32)                # [.., P, K]
    prim = jnp.round(jnp.einsum("...kp,...pk->...p",
                                st.src_id.astype(jnp.float32), ohp)
                     ).astype(jnp.int32)
    out_state = dataclasses.replace(
        st, source=jnp.where((prim >= 0) & st.alive, prim, st.source))
    if not return_events:
        return out_state
    from ..partmc.aero_state import _PID_SPLIT

    pid_of = lambda r: (jnp.round(r[..., 2, :]).astype(jnp.int32)
                        + _PID_SPLIT * jnp.round(r[..., 3, :]).astype(jnp.int32))
    removed = did & big_dead
    events = {"removed_id": jnp.where(removed, pid_of(big), -1),
              "other_id": jnp.where(removed, pid_of(sml), -1)}
    return out_state, events
