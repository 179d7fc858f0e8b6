"""Warm-rain (Kessler) bulk microphysics.

Equivalent of the reference's ``microphysics_driver`` slot (called as the
adjustment step at the end of the last RK3 stage, ``solve_em.F:3760``) with
the classic Kessler (1969) scheme — the standard WRF ideal-case choice
(mp_physics=1): saturation adjustment with latent heating, autoconversion,
accretion, rain evaporation, and rain sedimentation with an upwind fall-term.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ... import constants as c
from ...grid import Grid
from ..dycore.state import DycoreState, base_profiles, temperature, total_pressure
from .thermo import saturation_mixing_ratio

K_AUTO = 1.0e-3        # autoconversion rate [s-1]
QC0 = 1.0e-3           # autoconversion threshold [kg kg-1]
K_ACCR = 2.2           # accretion coefficient
VT_COEF = 36.34        # rain fall speed coefficient (Kessler)


def rain_fall_speed(qr, rho):
    """Mass-weighted rain terminal velocity [m s-1]."""
    return VT_COEF * jnp.maximum(rho * qr, 0.0) ** 0.1346 * jnp.sqrt(1.2 / rho)


def kessler_step(state: DycoreState, grid: Grid, dt) -> DycoreState:
    """One microphysics adjustment; moist = [qv, qc, qr] (config n_moist>=3)."""
    qv = jnp.maximum(state.moist[0], 0.0)     # guard advection roundoff
    qc = jnp.maximum(state.moist[1], 0.0)
    qr = jnp.maximum(state.moist[2], 0.0)
    rho_b, theta_b, _ = base_profiles(grid)
    rho = rho_b.reshape(-1, 1, 1)
    temp = temperature(state, grid)
    pres = total_pressure(state, grid)
    qsat = saturation_mixing_ratio(temp, pres)
    exner = (pres / c.P0) ** c.KAPPA
    lv_cp = c.WATER_LATENT_HEAT / (c.CP * exner)

    # saturation adjustment (single Newton step with qsat sensitivity)
    dqsat_dT = qsat * c.WATER_LATENT_HEAT / (c.R_V * temp * temp)
    cond = (qv - qsat) / (1.0 + lv_cp * exner * dqsat_dT)
    cond = jnp.maximum(cond, -qc)           # can't evaporate more cloud than exists
    qv = qv - cond
    qc = qc + cond
    theta = state.theta_p + lv_cp * cond

    # autoconversion + accretion
    auto = K_AUTO * dt * jnp.maximum(qc - QC0, 0.0)
    accr = dt * K_ACCR * qc * jnp.maximum(qr, 0.0) ** 0.875
    to_rain = jnp.minimum(auto + accr, qc)
    qc = qc - to_rain
    qr = qr + to_rain

    # rain evaporation in subsaturated air
    subsat = jnp.maximum(qsat - qv, 0.0)
    evap = jnp.minimum(jnp.minimum(0.1 * dt * subsat, qr), subsat)
    qr = qr - evap
    qv = qv + evap
    theta = theta - lv_cp * evap

    # sedimentation: upwind downward flux of rho*qr with fall speed at faces
    vt = rain_fall_speed(qr, rho)
    flux = rho * qr * vt                                   # [nz, ny, nx] downward
    rdz = (1.0 / grid.dz).reshape(-1, 1, 1)
    flux_in = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
    dqr = dt * (flux_in - flux) * rdz / rho
    qr = jnp.maximum(qr + dqr, 0.0)        # surface flux = rain reaching ground

    moist = state.moist.at[0].set(qv).at[1].set(jnp.maximum(qc, 0.0)) \
                       .at[2].set(qr)
    return dataclasses.replace(state, moist=moist, theta_p=theta)


# --- WSM5-class ice microphysics (mp_physics=2) -----------------------------
# Clean-room 5-class (qv, qc, qr, qi, qs) bulk scheme in the adjustment slot
# the reference fills with WSM5/Morrison (``solve_em.F:3760`` ->
# ``phys/module_mp_wsm5.F``): mixed-phase saturation adjustment, ice/snow
# conversions, riming, melting, depositional growth, and two sedimenting
# species.  Process forms follow the standard published bulk formulations
# (Hong et al. 2004 class); coefficients are the classic values.

QI0_AUTO = 1.0e-4      # ice -> snow autoconversion threshold [kg kg-1]
K_AUTO_I = 1.0e-3      # ice autoconversion rate [s-1]
K_ACCR_S = 1.0         # snow accretion (of ice/cloud) coefficient
VT_SNOW = 5.40         # snow fall speed coeff (power law)
VT_ICE = 3.29          # ice crystal fall speed coeff (Heymsfield-Donner)
TAU_DEP = 600.0        # depositional growth relaxation time [s]


def sat_mixing_ratio_ice(temp, pres):
    """Saturation mixing ratio over ice (Magnus-ice form)."""
    dt = temp - 273.16
    esi = 611.2 * jnp.exp(21.8745584 * dt / jnp.maximum(temp - 7.66, 1.0))
    esi = jnp.minimum(esi, 0.5 * pres)
    return c.EPS_VAP * esi / jnp.maximum(pres - esi, 1.0)


def _sediment(q, rho, vt, dz, dt):
    """Upwind downward sedimentation of rho*q with face speed vt [nz,...].
    dz: [nz] column or [nz, ny, nx] field."""
    flux = rho * q * vt
    rdz = 1.0 / dz
    if rdz.ndim == 1:
        rdz = rdz.reshape(-1, 1, 1)
    flux_in = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
    return jnp.maximum(q + dt * (flux_in - flux) * rdz / rho, 0.0)


def wsm5_step(state: DycoreState, grid: Grid, dt) -> DycoreState:
    """One 5-class adjustment; moist = [qv, qc, qr, qi, qs] (n_moist >= 5)."""
    qv = jnp.maximum(state.moist[0], 0.0)
    qc = jnp.maximum(state.moist[1], 0.0)
    qr = jnp.maximum(state.moist[2], 0.0)
    qi = jnp.maximum(state.moist[3], 0.0)
    qs = jnp.maximum(state.moist[4], 0.0)
    rho_b, _, _ = base_profiles(grid)
    rho = rho_b.reshape(-1, 1, 1)
    temp = temperature(state, grid)
    pres = total_pressure(state, grid)
    exner = (pres / c.P0) ** c.KAPPA
    theta = state.theta_p

    lv_cp = c.WATER_LATENT_HEAT / (c.CP * exner)
    ls_cp = c.ICE_LATENT_HEAT_SUB / (c.CP * exner)
    lf_cp = c.ICE_LATENT_HEAT_FUS / (c.CP * exner)

    qsw = saturation_mixing_ratio(temp, pres)
    qsi = sat_mixing_ratio_ice(temp, pres)
    # ice partition ramp: all liquid at T0, all ice at T_HOMOG
    fice = jnp.clip((c.T_FREEZE - temp) / (c.T_FREEZE - c.T_HOMOG), 0.0, 1.0)
    qsat = (1.0 - fice) * qsw + fice * qsi
    l_cp = (1.0 - fice) * lv_cp + fice * ls_cp

    # --- mixed-phase saturation adjustment (one Newton step) ---
    L_blend = (1.0 - fice) * c.WATER_LATENT_HEAT + fice * c.ICE_LATENT_HEAT_SUB
    dqsat_dT = qsat * L_blend / (c.R_V * temp * temp)
    cond = (qv - qsat) / (1.0 + l_cp * exner * dqsat_dT)
    cond = jnp.maximum(cond, -(qc + qi))          # evaporate at most qc+qi
    qv = qv - cond
    dqc = jnp.where(cond >= 0.0, (1.0 - fice) * cond,
                    -jnp.minimum(-cond, qc))
    dqi = cond - dqc
    dqi = jnp.maximum(dqi, -qi)
    qc = jnp.maximum(qc + dqc, 0.0)
    qi = jnp.maximum(qi + dqi, 0.0)
    theta = theta + lv_cp * dqc + ls_cp * dqi

    # --- homogeneous freezing / melting of cloud species ---
    frz = jnp.where(temp < c.T_HOMOG, qc, 0.0)
    qc, qi = qc - frz, qi + frz
    theta = theta + lf_cp * frz
    mlt_i = jnp.where(temp > c.T_FREEZE, qi, 0.0)
    qi, qc = qi - mlt_i, qc + mlt_i
    theta = theta - lf_cp * mlt_i

    # --- warm-rain conversions (Kessler forms) ---
    auto = K_AUTO * dt * jnp.maximum(qc - QC0, 0.0)
    accr = dt * K_ACCR * qc * jnp.maximum(qr, 0.0) ** 0.875
    to_rain = jnp.minimum(auto + accr, qc)
    qc, qr = qc - to_rain, qr + to_rain

    # --- ice -> snow autoconversion + snow accretion of ice ---
    auto_i = K_AUTO_I * dt * jnp.maximum(qi - QI0_AUTO, 0.0)
    accr_i = dt * K_ACCR_S * qi * jnp.maximum(qs, 0.0) ** 0.875
    to_snow = jnp.minimum(auto_i + accr_i, qi)
    qi, qs = qi - to_snow, qs + to_snow

    # --- snow riming of cloud water (T < T0): qc -> qs, fusion heating ---
    rim = jnp.where(temp < c.T_FREEZE,
                    jnp.minimum(dt * K_ACCR_S * qc
                                * jnp.maximum(qs, 0.0) ** 0.875, qc), 0.0)
    qc, qs = qc - rim, qs + rim
    theta = theta + lf_cp * rim

    # --- depositional growth/sublimation of snow (ice handled by adjust) ---
    ssi = qv - qsi
    dep = jnp.where((temp < c.T_FREEZE) & (qs > 0.0),
                    ssi * (1.0 - jnp.exp(-dt / TAU_DEP)), 0.0)
    dep = jnp.maximum(dep, -qs)
    qv, qs = qv - dep, qs + dep
    theta = theta + ls_cp * dep

    # --- snow melting above freezing (heat-capacity limited) ---
    melt_cap = c.CP * jnp.maximum(temp - c.T_FREEZE, 0.0) \
        / c.ICE_LATENT_HEAT_FUS
    melt = jnp.minimum(qs, melt_cap)
    qs, qr = qs - melt, qr + melt
    theta = theta - lf_cp * melt

    # --- rain evaporation (subsaturated) ---
    subsat = jnp.maximum(qsw - qv, 0.0)
    evap = jnp.minimum(jnp.minimum(0.1 * dt * subsat, qr), subsat)
    qr, qv = qr - evap, qv + evap
    theta = theta - lv_cp * evap

    # --- sedimentation ---
    qr = _sediment(qr, rho, rain_fall_speed(qr, rho), grid.dz, dt)
    vt_s = VT_SNOW * jnp.maximum(rho * qs, 0.0) ** 0.0625 \
        * jnp.sqrt(1.2 / rho)
    qs = _sediment(qs, rho, vt_s, grid.dz, dt)
    vt_i = VT_ICE * jnp.maximum(rho * qi, 0.0) ** 0.16
    qi = _sediment(qi, rho, vt_i, grid.dz, dt)

    moist = (state.moist.at[0].set(qv).at[1].set(qc).at[2].set(qr)
             .at[3].set(qi).at[4].set(qs))
    return dataclasses.replace(state, moist=moist, theta_p=theta)
