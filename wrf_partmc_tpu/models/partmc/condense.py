"""kappa-Koehler water equilibrium and CCN activation.

Equivalent of PartMC's ``condense`` module as used by the coupled model:
``condense_equilib_particles`` equilibrium water uptake
(``wrf_pmc_driver.F90:1201``) and ``aero_state_crit_rel_humids`` kappa-Koehler
critical supersaturations feeding the CCN spectra diagnostics
(``wrf_pmc_driver.F90:1043-1100``).  The full dynamic condensation ODE solver
is a later milestone (reference keeps it optional in the coupled model too).

Theory: kappa-Koehler (Petters & Kreidenweis 2007, ACP 7:1961):
    S(D) = [(D^3 - Dd^3) / (D^3 - Dd^3 (1 - kappa))] * exp(A / D)
with A = 4 sigma M_w / (R T rho_w).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .aero_data import AeroData, diam_to_vol, solute_kappa, particle_volume, vol_to_diam
from .aero_state import AeroState
from .env_state import EnvState


def kappa_rh_at_diam(d_wet, d_dry, kappa, A):
    """Equilibrium saturation ratio over a wet particle."""
    d3 = d_wet ** 3
    dd3 = d_dry ** 3
    aw = (d3 - dd3) / jnp.maximum(d3 - dd3 * (1.0 - kappa), 1e-300)
    return aw * jnp.exp(A / d_wet)


def crit_supersat(d_dry, kappa, A):
    """Critical supersaturation s_c = S_c - 1 for each dry diameter.

    Found by maximizing S(D) over D with a fixed-iteration Newton search in
    log-diameter space (static shapes; the reference solves the same max).
    For kappa >> A/Dd the closed form sqrt(4 A^3 / (27 kappa Dd^3)) is the
    familiar limit; the solve keeps accuracy for small/large kappa.
    """
    kappa = jnp.maximum(kappa, 1e-12)
    # initial guess from the analytic large-kappa limit: D_c = sqrt(3 kappa Dd^3 / A)
    d_c = jnp.sqrt(3.0 * kappa * d_dry ** 3 / A)
    d_c = jnp.maximum(d_c, d_dry * 1.01)

    def ln_S(ln_d):
        d = jnp.exp(ln_d)
        d3 = d ** 3
        dd3 = d_dry ** 3
        aw = (d3 - dd3) / jnp.maximum(d3 - dd3 * (1.0 - kappa), 1e-300)
        return jnp.log(jnp.maximum(aw, 1e-300)) + A / d

    gradf = jax.grad(lambda x: jnp.sum(ln_S(x)))

    ln_d = jnp.log(d_c)
    h = 1e-3
    for _ in range(12):  # Newton via central finite-difference second derivative
        g = gradf(ln_d)
        g2 = (gradf(ln_d + h) - gradf(ln_d - h)) / (2 * h)
        step = jnp.clip(g / jnp.where(jnp.abs(g2) > 1e-30, g2, 1e-30), -1.0, 1.0)
        ln_d = jnp.where(g2 < 0, ln_d - step, ln_d)   # only step on concave region
        ln_d = jnp.maximum(ln_d, jnp.log(d_dry * 1.001))
    return jnp.exp(ln_S(ln_d)) - 1.0


def state_crit_supersats(state: AeroState, aero_data: AeroData, env: EnvState):
    """[..., P] critical supersaturation per particle (aero_state
    crit_rel_humids equivalent)."""
    d_dry = state.dry_diameter(aero_data)
    kap = solute_kappa(state.vol, aero_data)
    A = jnp.asarray(env.kelvin_A)[..., None]
    d_dry = jnp.maximum(d_dry, 1e-10)
    return crit_supersat(d_dry, kap, A)


def equilib_water(state: AeroState, aero_data: AeroData, env: EnvState,
                  n_iter: int = 20) -> AeroState:
    """Set each particle's water volume to kappa-Koehler equilibrium with the
    ambient RH (condense_equilib_particles, driver :1201).

    Fixed-point iteration on D from RH = a_w(D) exp(A/D):
        D_{n+1}^3 = Dd^3 * [1 + kappa * rh_eff / (1 - rh_eff)],
        rh_eff = RH * exp(-A / D_n)
    which converges for RH < 1 (subsaturated equilibrium leg).
    """
    d_dry = jnp.maximum(state.dry_diameter(aero_data), 1e-10)
    kap = solute_kappa(state.vol, aero_data)
    rh = jnp.clip(jnp.asarray(env.rel_humid)[..., None], 1e-4, 0.99)
    A = jnp.asarray(env.kelvin_A)[..., None]

    d = d_dry
    for _ in range(n_iter):
        rh_eff = jnp.clip(rh * jnp.exp(-A / jnp.maximum(d, d_dry)), 0.0, 0.9999)
        growth = 1.0 + kap * rh_eff / (1.0 - rh_eff)
        d = d_dry * jnp.cbrt(growth)
    v_wet = diam_to_vol(d)
    v_dry = particle_volume(state.vol, dry=True, aero_data=aero_data)
    v_water = jnp.where(state.alive, jnp.maximum(v_wet - v_dry, 0.0), 0.0)
    vol = state.vol.at[..., aero_data.i_water, :].set(v_water)
    return dataclasses.replace(state, vol=vol)


def ccn_conc(state: AeroState, aero_data: AeroData, env: EnvState,
             supersats) -> jax.Array:
    """CCN number conc [# m-3] active at each supersaturation in ``supersats``
    [..., K] (CCN spectra, driver :1043-1100)."""
    sc = state_crit_supersats(state, aero_data, env)          # [..., P]
    act = sc[..., None, :] <= jnp.asarray(supersats)[..., :, None]  # [..., K, P]
    w = state.num[..., None, :] * act
    V = jnp.asarray(env.cell_volume)[..., None]
    return jnp.sum(w, axis=-1) / V
