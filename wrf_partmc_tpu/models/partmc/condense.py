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
    return _set_equilib_water(state, aero_data, env, d_dry, kap, n_iter)


def _set_equilib_water(state, aero_data, env, d_dry, kap, n_iter):
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


# Deliquescence / crystallization RH per electrolyte-forming species
# (mutual DRH/CRH of the dominant MOSAIC salts: (NH4)2SO4 0.80/0.35,
# NH4NO3 0.618/0.25, NaCl 0.753/0.45; Tang & Munkelwitz 1994, Zaveri et
# al. 2008 MOSAIC).  Non-electrolyte species carry 0 weight.
_HYST_SPECIES = {
    "SO4": (0.80, 0.35), "NH4": (0.80, 0.35),
    "NO3": (0.618, 0.25),
    "Cl": (0.753, 0.45), "Na": (0.753, 0.45),
    "CO3": (0.80, 0.35), "Ca": (0.80, 0.35), "MSA": (0.80, 0.35),
}


def particle_drh_crh(state: AeroState, aero_data: AeroData):
    """Per-particle mixture deliquescence/crystallization RH and electrolyte
    dry-volume fraction: electrolyte-volume-weighted means of the salt-class
    DRH/CRH (the MESA mixture rule compressed to the fixed species set)."""
    drh_s = jnp.asarray([_HYST_SPECIES.get(n, (0.0, 0.0))[0]
                         for n in aero_data.names], jnp.float32)
    crh_s = jnp.asarray([_HYST_SPECIES.get(n, (0.0, 0.0))[1]
                         for n in aero_data.names], jnp.float32)
    is_el = (drh_s > 0.0).astype(jnp.float32)
    dry = aero_data.dry_mask[..., :, None]
    v_el = jnp.sum(state.vol * dry * is_el[..., :, None], axis=-2)
    v_dry = jnp.maximum(
        jnp.sum(state.vol * dry, axis=-2), 1e-300)
    drh = jnp.sum(state.vol * dry * (drh_s * is_el)[..., :, None],
                  axis=-2) / jnp.maximum(v_el, 1e-300)
    crh = jnp.sum(state.vol * dry * (crh_s * is_el)[..., :, None],
                  axis=-2) / jnp.maximum(v_el, 1e-300)
    return drh, crh, v_el / v_dry


def equilib_water_hyst(state: AeroState, aero_data: AeroData, env: EnvState,
                       n_iter: int = 20) -> AeroState:
    """Hysteresis-aware equilibrium water (the MESA water path the reference
    persists per particle, ``wrf_pmc_init.F90:1111-1272``).

    Leg transitions: RH rising past the mixture DRH deliquesces the
    electrolyte (leg -> 1); RH falling below the mixture CRH effloresces it
    (leg -> 0); in between the particle stays on its current branch.  On the
    lower branch the electrolyte fraction is solid and contributes no
    hygroscopicity — only the non-electrolyte (organic) fraction takes
    water.  Particles with a negligible electrolyte fraction have no
    hysteresis (continuous kappa-Koehler uptake, leg pinned to 1)."""
    d_dry = jnp.maximum(state.dry_diameter(aero_data), 1e-10)
    kap = solute_kappa(state.vol, aero_data)
    drh, crh, el_frac = particle_drh_crh(state, aero_data)
    rh = jnp.asarray(env.rel_humid)[..., None]
    has_hyst = el_frac > 1e-6
    leg = jnp.where(rh >= drh, 1, jnp.where(rh <= crh, 0, state.hyst_leg))
    leg = jnp.where(has_hyst, leg, 1).astype(jnp.int32)
    # effloresced: electrolyte kappa suppressed, organics still hygroscopic
    dry = aero_data.dry_mask[..., :, None]
    is_el = jnp.asarray([1.0 if n in _HYST_SPECIES else 0.0
                         for n in aero_data.names], jnp.float32)
    v_dry_s = state.vol * dry
    kv_org = jnp.sum(v_dry_s * (aero_data.kappa * (1.0 - is_el))[..., :, None],
                     axis=-2)
    kap_org = kv_org / jnp.maximum(jnp.sum(v_dry_s, axis=-2), 1e-300)
    kap_eff = jnp.where(leg == 1, kap, kap_org)
    out = _set_equilib_water(state, aero_data, env, d_dry, kap_eff, n_iter)
    return dataclasses.replace(out, hyst_leg=leg)


def _growth_coefficient(diam, temp, pressure):
    """Maxwellian growth coefficient G [kg m-1 s-1] in
    dm/dt = 4 pi r G (S - S_eq), with transition-regime (Fukuta-Walter)
    corrected vapor diffusivity and thermal conductivity."""
    from ... import constants as c

    T = temp
    # free diffusivity / conductivity
    dv = 0.211e-4 * (T / 273.15) ** 1.94 * (101325.0 / pressure)
    ka = 2.38e-2 * (T / 296.0) ** 0.83
    r = jnp.maximum(diam, 1e-9) * 0.5
    # transition corrections (accommodation alpha=1, thermal 0.96)
    vbar = jnp.sqrt(8.0 * c.UNIV_GAS_CONST * T
                    / (jnp.pi * c.WATER_MOLEC_WEIGHT))
    dv_c = dv / (1.0 + 4.0 * dv / (vbar * r))
    cbar = jnp.sqrt(8.0 * c.UNIV_GAS_CONST * T
                    / (jnp.pi * c.AIR_MOLEC_WEIGHT))
    rho_air = pressure / (c.R_D * T)
    ka_c = ka / (1.0 + 4.0 * ka / (0.96 * rho_air * c.CP * cbar * r))

    es = 610.78 * jnp.exp(17.27 * (T - 273.15) / (T - 35.85))
    L = c.WATER_LATENT_HEAT
    Rv = c.UNIV_GAS_CONST / c.WATER_MOLEC_WEIGHT
    term_d = Rv * T / (dv_c * es)
    term_k = (L / (ka_c * T)) * (L / (Rv * T) - 1.0)
    return 1.0 / (term_d + term_k)


def condense_dynamic(state: AeroState, aero_data: AeroData, env: EnvState,
                     dt, n_sub: int = 5, n_newton: int = 3):
    """Dynamic per-particle condensation/evaporation ODE — the reference
    ``condense`` module's implicit kappa-Koehler growth solve (PartMC
    condense.F90; optional in the coupled model, which defaults to the
    equilibrium call at ``wrf_pmc_driver.F90:1201``).

    TPU scheme: sub-stepped semi-implicit solve, every particle in every
    cell in lockstep.  Per substep each particle's water mass is advanced by
    Newton iterations on
        f(m) = m - m^n - h * 4 pi r(m) G (S - S_eq(m)) = 0
    with the ambient saturation S frozen, then S is updated from exact
    vapor-mass conservation (the reference couples the same way, particle
    loop inside an outer vapor/temperature update).

    Returns (new_state, new_rel_humid [...]) — caller owns writing RH back
    into its moisture field (latent heating is the dycore's job).
    """
    from ... import constants as c

    temp = jnp.asarray(env.temp)[..., None]
    pres = jnp.asarray(env.pressure)[..., None]
    V = jnp.asarray(env.cell_volume)
    alive = state.alive
    d_dry = jnp.maximum(state.dry_diameter(aero_data), 1e-10)
    kap = jnp.maximum(solute_kappa(state.vol, aero_data), 1e-12)
    A = jnp.asarray(env.kelvin_A)[..., None]
    v_dry = particle_volume(state.vol, dry=True, aero_data=aero_data)
    rho_w = c.WATER_DENSITY

    es = 610.78 * jnp.exp(17.27 * (jnp.asarray(env.temp) - 273.15)
                          / (jnp.asarray(env.temp) - 35.85))
    # vapor mass per cell [kg] at saturation ratio S=1
    Rv = c.UNIV_GAS_CONST / c.WATER_MOLEC_WEIGHT
    m_vap_sat = es / (Rv * jnp.asarray(env.temp)) * V

    m_w = state.vol[..., aero_data.i_water, :] * rho_w        # [..., P]
    S = jnp.clip(jnp.asarray(env.rel_humid), 0.0, 1.1)
    h = dt / n_sub

    def s_eq(m):
        # dead slots have zero volume: clamp the wet diameter to the (already
        # floored) dry diameter so A/d stays finite, and mask the result
        d = jnp.maximum(vol_to_diam(v_dry + m / rho_w), d_dry)
        return jnp.where(alive, kappa_rh_at_diam(d, d_dry, kap, A), 0.0)

    def flux(m, S_cell):
        d = jnp.maximum(vol_to_diam(v_dry + m / rho_w), d_dry)
        G = _growth_coefficient(d, temp, pres)
        return jnp.where(alive,
                         2.0 * jnp.pi * d * G * (S_cell[..., None] - s_eq(m)),
                         0.0)

    m_scale = rho_w * v_dry                          # dry-mass scale [kg]

    def substep(_, carry):
        m, S_c = carry
        m_n = m
        # semi-implicit vapor projection (ASTEM-style): with the linearized
        # flux k_i (S - S_eq,i), solve S implicitly over the substep so the
        # vapor field cannot overshoot/oscillate no matter how strong the
        # particle sink is relative to the vapor reservoir
        d_n = vol_to_diam(v_dry + m_n / rho_w)
        G_n = _growth_coefficient(d_n, temp, pres)
        seq_n = s_eq(m_n)
        k_i = jnp.where(alive, 2.0 * jnp.pi * d_n * G_n * state.num, 0.0) \
            / jnp.maximum(m_vap_sat, 1e-30)[..., None]     # [..., P] 1/s
        ksum = k_i.sum(-1)
        S_imp = (S_c + h * (k_i * seq_n).sum(-1)) / (1.0 + h * ksum)
        # damped Newton iterations with S frozen at the implicit value; the
        # FD perturbation is on the particle's own mass scale so f32
        # differences stay representable
        for _ in range(n_newton):
            f = m - m_n - h * flux(m, S_imp)
            dm = jnp.maximum(jnp.abs(m), m_scale) * 1e-3
            f2 = (m + dm) - m_n - h * flux(m + dm, S_imp)
            dfdm = jnp.maximum((f2 - f) / dm, 1.0)   # damped (stable branch)
            m = jnp.clip(m - f / dfdm, 0.0, None)
        m = jnp.where(alive, m, 0.0)
        # exact vapor balance: condensed water comes out of the vapor field
        dm_tot = jnp.sum((m - m_n) * state.num * alive, axis=-1)   # [...] kg
        S_c = jnp.maximum(S_c - dm_tot / jnp.maximum(m_vap_sat, 1e-30), 0.0)
        return m, S_c

    m_w, S = jax.lax.fori_loop(0, n_sub, substep, (m_w, S))
    vol = state.vol.at[..., aero_data.i_water, :].set(
        jnp.where(alive, m_w / rho_w, 0.0))
    return dataclasses.replace(state, vol=vol), S


def ccn_conc(state: AeroState, aero_data: AeroData, env: EnvState,
             supersats) -> jax.Array:
    """CCN number conc [# m-3] active at each supersaturation in ``supersats``
    [..., K] (CCN spectra, driver :1043-1100)."""
    sc = state_crit_supersats(state, aero_data, env)          # [..., P]
    act = sc[..., None, :] <= jnp.asarray(supersats)[..., :, None]  # [..., K, P]
    w = state.num[..., None, :] * act
    V = jnp.asarray(env.cell_volume)[..., None]
    return jnp.sum(w, axis=-1) / V
