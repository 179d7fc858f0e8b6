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
