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
              kernel: str = KERNEL_BROWN) -> AeroState:
    """One Monte Carlo coagulation step over every cell at once.

    Works on arbitrary cell batch shapes [...]; cost O(P) per cell
    (vs the reference's O(n_samp) accept-reject loop per cell,
    ``wrf_pmc_driver.F90:192-194``).
    """
    P = state.capacity
    n_pair = P // 2
    cell_shape = state.cell_shape
    k_perm, k_evt, k_gamma = jax.random.split(key, 3)

    # random permutation with alive slots first: dead slots get +inf keys
    u = jax.random.uniform(k_perm, state.num.shape)
    perm = jnp.argsort(jnp.where(state.alive, u, 2.0), axis=-1)   # [..., P]
    ia = perm[..., 0:2 * n_pair:2]                                # [..., n_pair]
    ib = perm[..., 1:2 * n_pair:2]

    take = lambda a, i: jnp.take_along_axis(a, i, axis=-1)
    num_a, num_b = take(state.num, ia), take(state.num, ib)
    diam = state.wet_diameter()
    mass = particle_mass(state.vol, aero_data)
    d_a, d_b = take(diam, ia), take(diam, ib)
    m_a, m_b = take(mass, ia), take(mass, ib)

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

    # merge: j = argmin multiplicity absorbs mass; i = argmax loses count
    a_is_big = num_a >= num_b
    i_big = jnp.where(a_is_big, ia, ib)
    i_sml = jnp.where(a_is_big, ib, ia)
    vol_big = jnp.take_along_axis(state.vol, i_big[..., None, :], axis=-1)

    # scatter updates back to the flat slot arrays (pair indices are disjoint
    # by construction, so plain put_along_axis is safe)
    dec = g * xi_min                                   # count removed from big
    upd_big = take(state.num, i_big) - dec
    num_new = _scatter_set(state.num, i_big, jnp.maximum(upd_big, 0.0))
    vol_new = _scatter_add_vol(state.vol, i_sml, g[..., None, :] * vol_big)
    # if big's multiplicity hits zero it dies; clear its volume
    dead_big = upd_big <= 0.0
    vol_new = _scatter_mul_vol(vol_new, i_big, jnp.where(dead_big, 0.0, 1.0)[..., None, :])
    return dataclasses.replace(state, vol=vol_new, num=num_new)


def _scatter_set(arr, idx, val):
    """arr[..., idx] = val along last axis (indices unique by construction)."""
    return jnp.put_along_axis(arr, idx, val, axis=-1, inplace=False)


def _scatter_add_vol(vol, idx, delta):
    """vol[..., S, idx] += delta for unique idx.  idx: [..., n], delta [..., S, n]."""
    idx_s = jnp.broadcast_to(idx[..., None, :], vol.shape[:-1] + idx.shape[-1:])
    cur = jnp.take_along_axis(vol, idx_s, axis=-1)
    return jnp.put_along_axis(vol, idx_s, cur + delta, axis=-1, inplace=False)


def _scatter_mul_vol(vol, idx, factor):
    idx_s = jnp.broadcast_to(idx[..., None, :], vol.shape[:-1] + idx.shape[-1:])
    cur = jnp.take_along_axis(vol, idx_s, axis=-1)
    return jnp.put_along_axis(vol, idx_s, cur * jnp.broadcast_to(factor, cur.shape),
                              axis=-1, inplace=False)
