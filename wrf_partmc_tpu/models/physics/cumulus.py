"""Betts-Miller-class convective adjustment (cumulus driver slot).

The reference orchestrates a cumulus driver from
``module_first_rk_step_part1.F:1052`` (the CARES d01 runs cu_physics=5);
this module fills the cumulus slot with a clean-room Betts-Miller-Janjic-
class deep-convection adjustment (Betts & Miller 1986, QJRMS 112:693;
Janjic 1994, MWR 122:927): conditionally unstable columns relax temperature
and humidity toward convective reference profiles over a fixed timescale,
with an enthalpy-conservation correction; the removed moisture is the
convective rainfall.

Scheme (whole-domain, no column loops):
1. Parcel ascent from the lowest layer conserving equivalent potential
   temperature theta_e (pseudoadiabat via 3 fixed Newton steps per level).
2. CAPE and cloud top from parcel buoyancy; deep columns = CAPE above
   threshold and depth above ``min_depth``.
3. Reference temperature = parcel profile relaxed 90% of the way toward the
   environment lapse (the BM stability-weighted first guess), shifted by a
   constant so column enthalpy is conserved; reference humidity = a fixed
   sub-saturation profile of the reference temperature.
4. T/q relax toward the references with timescale ``tau`` in deep columns
   only; net column moisture removal is reported as rainfall [kg m-2 s-1].
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ... import constants as c
from ...grid import Grid
from ..dycore.state import DycoreState, temperature, total_pressure
from .thermo import saturation_mixing_ratio

LV = c.WATER_LATENT_HEAT

TAU_BM = 2400.0          # adjustment timescale [s] (BMJ ~40 min)
CAPE_MIN = 150.0         # [J/kg]
MIN_DEPTH = 3000.0       # [m] deep-convection depth threshold
SUBSAT = (0.95, 0.85, 0.75)   # sub-saturation at base / mid / top


def _parcel_profile(temp, qv, pres):
    """Pseudoadiabatic parcel temperature from the lowest layer [nz,...]."""
    t0 = temp[0]
    q0 = qv[0]
    p0 = pres[0]
    # theta_e (Bolton-class approximation)
    th0 = t0 * (c.P0 / p0) ** c.KAPPA
    th_e = th0 * jnp.exp(LV * q0 / (c.CP * t0))

    # invert theta_e = th(T,p) exp(Lv qs(T,p)/(cp T)) for T at each level
    t_p = jnp.broadcast_to(t0, temp.shape)
    for _ in range(4):
        qs = saturation_mixing_ratio(t_p, pres)
        th = t_p * (c.P0 / pres) ** c.KAPPA
        f = th * jnp.exp(LV * qs / (c.CP * t_p)) - th_e[None]
        dqs_dt = qs * LV / (c.R_V * t_p ** 2)
        dfdt = (th / t_p) * jnp.exp(LV * qs / (c.CP * t_p)) * (
            1.0 + LV * dqs_dt / c.CP - LV * qs / (c.CP * t_p))
        t_p = jnp.clip(t_p - f / jnp.maximum(dfdt, 1e-3), 150.0, 330.0)
    # below the LCL (parcel still unsaturated) follow the dry adiabat
    t_dry = t0[None] * (pres / p0[None]) ** c.KAPPA
    return jnp.where(saturation_mixing_ratio(t_dry, pres) > q0[None],
                     t_dry, t_p)


def bmj_step(state: DycoreState, grid: Grid, dt) -> tuple[DycoreState,
                                                          jnp.ndarray]:
    """One convective-adjustment step.  Returns (new_state, rain_rate
    [kg m-2 s-1])."""
    temp = temperature(state, grid)
    pres = total_pressure(state, grid)
    qv = state.moist[0]
    if state.ph is not None:
        dz = (grid.phb[1:] - grid.phb[:-1] + state.ph[1:] - state.ph[:-1]) \
            / c.GRAV
    else:
        dz = jnp.broadcast_to(grid.dz.reshape(-1, 1, 1), temp.shape)
    rho = pres / (c.R_D * temp)
    dm = rho * dz                                        # layer mass [kg/m2]

    t_parcel = _parcel_profile(temp, qv, pres)
    buoy = (t_parcel - temp) / temp
    cape = jnp.sum(jnp.maximum(buoy, 0.0) * c.GRAV * dz, axis=0)
    z = jnp.cumsum(dz, axis=0) - 0.5 * dz
    top_z = jnp.max(jnp.where(buoy > 0.0, z, 0.0), axis=0)
    deep = (cape > CAPE_MIN) & (top_z > MIN_DEPTH)

    in_cloud = (buoy > -0.02) & (z < top_z[None])
    # reference T: mostly the environment, nudged toward the parcel curve
    t_ref = temp + 0.25 * (t_parcel - temp)
    # enthalpy-conserving shift per column (cp dT sums to zero over cloud)
    w_cl = jnp.where(in_cloud, dm, 0.0)
    shift = (jnp.sum(w_cl * (t_ref - temp), axis=0)
             / jnp.maximum(jnp.sum(w_cl, axis=0), 1e-3))
    t_ref = t_ref - shift[None]
    # reference humidity: sub-saturated reference profile
    frac = jnp.clip(z / jnp.maximum(top_z[None], 1.0), 0.0, 1.0)
    subsat = (SUBSAT[0] * (1 - frac) ** 2 + SUBSAT[1] * 2 * frac * (1 - frac)
              + SUBSAT[2] * frac ** 2)
    q_ref = subsat * saturation_mixing_ratio(t_ref, pres)

    relax = jnp.where(deep[None] & in_cloud, dt / TAU_BM, 0.0)
    d_t = relax * (t_ref - temp)
    d_q = relax * (jnp.minimum(q_ref, qv * 1.5) - qv)
    # rainfall = net column moisture removal (clip: BM produces rain, never
    # moistens the column net)
    rain_col = -jnp.sum(d_q * dm, axis=0) / dt
    pos = rain_col > 0.0
    d_q = jnp.where(pos[None], d_q, 0.0)
    d_t = jnp.where(pos[None], d_t, 0.0)
    rain = jnp.maximum(rain_col, 0.0) * pos
    # condensation heating consistent with the removed moisture, distributed
    # with the same weights as the T adjustment
    exner = (pres / c.P0) ** c.KAPPA
    heat_budget = LV * jnp.sum(-d_q * dm, axis=0) / c.CP
    wsum = jnp.maximum(jnp.sum(jnp.abs(d_t) * dm, axis=0), 1e-6)
    d_t = d_t + jnp.abs(d_t) * (heat_budget - jnp.sum(d_t * dm, axis=0)
                                )[None] / wsum[None]

    theta_p = state.theta_p + d_t / exner
    moist = state.moist.at[0].set(jnp.maximum(qv + d_q, 0.0))
    return (dataclasses.replace(state, theta_p=theta_p, moist=moist),
            rain)
