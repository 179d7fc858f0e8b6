"""Per-particle dry deposition (resistance-in-series).

Equivalent of the reference's ``wrf_pmc_dep.F90`` + ``wrf_pmc_dep_aero.F90``:
settling velocity with Cunningham slip correction (``:310-324,:430``), surface
resistance from Brownian diffusion / impaction / interception (``:329-449``),
``v_d = 1/(r_a + r_s + r_a r_s v_s) + v_s`` (``:409``), removal probability
``p = v_d dt / dz`` (``:262-283``) with stochastic per-particle removal
(``:289-304``).  Physics after Seinfeld & Pandis (2006) ch. 19 / Zhang et
al. (2001).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants as c
from .aero_data import AeroData, particle_mass, particle_volume
from .aero_state import AeroState
from .coag import cunningham_slip
from .env_state import EnvState

# Zhang et al. (2001) land-use constants for a generic vegetated surface
_ALPHA_IMP = 1.0       # impaction shape parameter
_A_INT = 2.0e-3        # characteristic collector radius [m]
_EB_EXP = 2.0 / 3.0    # Brownian efficiency exponent


def settling_velocity(diam, rho_p, env: EnvState):
    """Stokes settling velocity with slip correction [m s-1].
    diam/rho_p: [cells..., P]; env fields [cells...]."""
    mfp = jnp.asarray(env.air_mean_free_path)[..., None]
    cc = cunningham_slip(diam, mfp)
    return rho_p * diam ** 2 * c.GRAV * cc / (18.0 * c.AIR_DYN_VISC)


def deposition_velocity(diam, rho_p, env: EnvState, r_a):
    """v_d per particle given aerodynamic resistance r_a [s m-1]."""
    temp = jnp.asarray(env.temp)[..., None]
    ustar = jnp.asarray(env.ustar)[..., None]
    v_s = settling_velocity(diam, rho_p, env)
    cc = cunningham_slip(diam, jnp.asarray(env.air_mean_free_path)[..., None])
    diff = c.BOLTZMANN * temp * cc / (3.0 * jnp.pi * c.AIR_DYN_VISC * diam)
    nu = c.AIR_DYN_VISC / jnp.asarray(env.air_density)[..., None]
    sc = nu / diff                                   # Schmidt number
    st = v_s * ustar ** 2 / (c.GRAV * nu)            # Stokes number (smooth)
    e_b = sc ** (-_EB_EXP)
    e_im = (st / (_ALPHA_IMP + st)) ** 2
    e_in = 0.5 * (diam / _A_INT) ** 2
    r_s = 1.0 / jnp.maximum(3.0 * ustar * (e_b + e_im + e_in), 1e-30)
    r_a = jnp.asarray(r_a)[..., None]
    return v_s + 1.0 / (r_a + r_s + r_a * r_s * v_s)


def _psi_h(zeta):
    """Businger-Dyer integrated stability function for heat/scalars."""
    x = (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** 0.25
    unstable = 2.0 * jnp.log(0.5 * (1.0 + x * x))
    stable = -5.0 * jnp.maximum(zeta, 0.0)
    return jnp.where(zeta < 0.0, unstable, stable)


def aerodynamic_resistance(env: EnvState, z_ref, z0=0.1, rmol=None):
    """Aerodynamic resistance r_a with Monin-Obukhov stability corrections.

    The reference consumes the WRF surface layer's ``rmol`` (1/L) and ``znt``
    (``wrf_pmc_dep.F90:31-101,188``):
    r_a = [ln(z/z0) - psi_h(z/L) + psi_h(z0/L)] / (kappa u*).
    ``rmol=None`` reduces to the neutral log law."""
    log_term = jnp.log(jnp.maximum(z_ref / z0, 1.1))
    if rmol is not None:
        log_term = (log_term - _psi_h(z_ref * rmol) + _psi_h(z0 * rmol))
    return jnp.maximum(log_term, 0.1) / (c.KARMAN
                                         * jnp.maximum(env.ustar, 0.01))


def deposit_step(state: AeroState, aero_data: AeroData, env: EnvState, dt, dz,
                 key, z0=0.1) -> AeroState:
    """Stochastic removal from the surface-layer cell population."""
    diam = state.wet_diameter()
    vol = particle_volume(state.vol)
    mass = particle_mass(state.vol, aero_data)
    rho_p = mass / jnp.maximum(vol, 1e-300)
    diam = jnp.maximum(diam, 1e-9)
    r_a = aerodynamic_resistance(env, jnp.asarray(env.height), z0)
    v_d = deposition_velocity(diam, rho_p, env, r_a)
    p_rem = jnp.clip(v_d * dt / jnp.asarray(dz)[..., None], 0.0, 1.0)
    u = jax.random.uniform(key, state.num.shape)
    keep = (u >= p_rem) & state.alive
    return dataclasses.replace(
        state, num=jnp.where(keep, state.num, 0.0),
        vol=jnp.where(keep[..., None, :], state.vol, 0.0))
