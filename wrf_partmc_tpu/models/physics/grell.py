"""Grell-class ensemble mass-flux deep convection (cu_physics=5).

The CARES d01 domain runs the G3 ensemble scheme
(``WRFV3/test/em_real/namelist.input.cares:85``; ``phys/module_cu_g3.F``,
Grell 1993 MWR 121:764; Grell & Devenyi 2002 GRL 29:1693).  This module is a
clean-room compact member of that family: a steady entraining updraft plume
with compensating-subsidence environment tendencies, cloud-top detrainment,
an evaporative downdraft, and an *ensemble* over entrainment members whose
closure is cloud-work-function relaxation (the Fritsch-Chappell/CAPE-removal
member of the GD closure ensemble) — averaged exactly as GD averages its
member tendencies.

TPU-native design: the whole scheme is [nz, ny, nx] array arithmetic; the
plume integration is one ``lax.scan`` up the column carrying (h_u, q_u, eta)
for ALL members at once (members stacked on a leading axis), the
updraft-origin search and cloud-top selection are masked reductions, and all
triggers are ``where`` masks (no data-dependent control flow).

Scheme per member (entrainment rate eps):
  1. Updraft origin = level of max moist static energy h below 3 km.
  2. Entraining plume: dh_u/dz = -eps (h_u - h); condensate c = max(q_u -
     q_sat_env, 0) removed as precipitation production; normalized mass
     flux eta grows by (eps - delta).
  3. Buoyancy h_u > h_sat defines the active cloud; top = highest buoyant
     level; trigger = depth > 3 km and positive cloud work function
     A = int (g/(cp T)) (h_u - h_sat)/(1+gamma) eta dz.
  4. Closure: base mass flux M_b = A / (tau dA/dM), with dA/dM evaluated by
     applying the unit-subsidence tendencies to the buoyancy integral.
  5. Environment tendencies: compensating subsidence
     dT/dt = M_b eta/rho (dT/dz + g/cp), dq/dt = M_b eta/rho dq/dz;
     cloud-top detrainment of saturated air + condensate; evaporative
     downdraft returns a fraction beta of the precipitation to the
     sub-cloud layer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ... import constants as c
from ...grid import Grid
from ..dycore.state import DycoreState, temperature, total_pressure
from .thermo import saturation_mixing_ratio

LV = c.WATER_LATENT_HEAT

ENTR_MEMBERS = (7e-5, 1.4e-4, 2.8e-4)   # fractional entrainment [1/m]
DETR_RATIO = 0.5                         # delta = DETR_RATIO * eps
TAU_G = 3600.0                           # CAPE-removal timescale [s]
MIN_DEPTH_G = 3000.0                     # [m]
A_MIN = 40.0                             # [J/kg] trigger work function
BETA_DD = 0.3                            # downdraft evaporation fraction
Z_ORIGIN_MAX = 3000.0                    # updraft source search depth [m]


def grell_step(state: DycoreState, grid: Grid, dt):
    """One ensemble mass-flux step (cumulus_driver slot,
    ``module_first_rk_step_part1.F:1052``).  Returns (new_state, rain_rate
    [kg m-2 s-1])."""
    temp = temperature(state, grid)
    pres = total_pressure(state, grid)
    qv = jnp.maximum(state.moist[0], 0.0)
    if state.ph is not None:
        dz = (grid.phb[1:] - grid.phb[:-1] + state.ph[1:] - state.ph[:-1]) \
            / c.GRAV
    else:
        dz = jnp.broadcast_to(grid.dz.reshape(-1, 1, 1), temp.shape)
    rho = pres / (c.R_D * temp)
    dm = rho * dz
    z = jnp.cumsum(dz, axis=0) - 0.5 * dz
    qs = saturation_mixing_ratio(temp, pres)
    h = c.CP * temp + c.GRAV * z + LV * qv
    h_sat = c.CP * temp + c.GRAV * z + LV * qs

    # 1. updraft origin: max-h level below Z_ORIGIN_MAX
    low = z < Z_ORIGIN_MAX
    h_msk = jnp.where(low, h, -1e30)
    h0 = jnp.max(h_msk, axis=0)                           # [ny, nx]
    is0 = h_msk == h0[None]
    # break ties toward the lowest such level
    first0 = jnp.cumsum(jnp.cumsum(is0.astype(jnp.int32), axis=0),
                        axis=0) == 1
    z0 = jnp.sum(jnp.where(first0, z, 0.0), axis=0)       # origin height
    q0 = jnp.sum(jnp.where(first0, qv, 0.0), axis=0)

    # 2. entraining plume scan (members stacked on axis 0)
    n_m = len(ENTR_MEMBERS)
    eps = jnp.asarray(ENTR_MEMBERS).reshape(n_m, 1, 1)
    above = z >= z0[None]                                 # [nz, ny, nx]

    def plume(carry, xs):
        h_u, q_u, eta = carry                             # each [n_m, ny, nx]
        h_k, q_k, qs_k, dz_k, up_k = xs
        ed = eps * dz_k[None]
        h_new = (h_u + ed * h_k[None]) / (1.0 + ed)
        q_new = (q_u + ed * q_k[None]) / (1.0 + ed)
        cond = jnp.maximum(q_new - qs_k[None], 0.0)       # condensate formed
        q_new = q_new - cond
        eta_new = eta * (1.0 + (1.0 - DETR_RATIO) * ed)
        h_u = jnp.where(up_k[None], h_new, h0[None])
        q_u = jnp.where(up_k[None], q_new, q0[None])
        eta = jnp.where(up_k[None], eta_new, 1.0)
        cond = jnp.where(up_k[None], cond, 0.0)
        return (h_u, q_u, eta), (h_u, q_u, eta, cond)

    init = (jnp.broadcast_to(h0[None], (n_m,) + h0.shape),
            jnp.broadcast_to(q0[None], (n_m,) + h0.shape),
            jnp.ones((n_m,) + h0.shape))
    _, (h_u, q_u, eta, cond) = lax.scan(
        plume, init, (h, qv, qs, dz, above))
    # scanned outputs: [nz, n_m, ny, nx] -> [n_m, nz, ny, nx]
    h_u, q_u, eta, cond = (jnp.moveaxis(a, 0, 1)
                           for a in (h_u, q_u, eta, cond))

    # 3. buoyancy, cloud top, work function
    buoy = (h_u - h_sat[None]) / (c.CP * temp[None])      # [n_m, nz, ny, nx]
    pos = (buoy > 0.0) & above[None]
    z_top = jnp.max(jnp.where(pos, z[None], 0.0), axis=1)  # [n_m, ny, nx]
    in_cloud = above[None] & (z[None] <= z_top[:, None])
    gamma = LV * LV * qs / (c.CP * c.R_V * temp ** 2)
    a_wf = jnp.sum(jnp.where(pos, c.GRAV * buoy / (1.0 + gamma[None])
                             * eta * dz[None], 0.0), axis=1)
    # trigger: work function + depth + the standard cap constraint (the
    # parcel must reach its LFC within ~2 km of the origin — Grell's
    # cap_max; guards against spurious upper-level "buoyancy")
    z_lfc = jnp.min(jnp.where(pos, z[None], 1e9), axis=1)
    deep = ((a_wf > A_MIN) & ((z_top - z0[None]) > MIN_DEPTH_G)
            & ((z_lfc - z0[None]) < 2000.0))

    # 4. unit-subsidence tendencies (per unit base mass flux, M_b = 1).
    # The net updraft mass flux detrains over the upper cloud (the G3/AS
    # detrainment layer): eta_sub ramps to zero across the top 40% of the
    # cloud depth, so compensating-subsidence warming peaks in the mid-to-
    # upper troposphere instead of at cloud top (r5: the quantified-bounds
    # test caught monotone warming to the model top without this)
    depth = jnp.maximum(z_top[:, None] - z0[None, None], 1.0)
    z_frac = (z[None] - z0[None, None]) / depth               # [n_m,nz,ny,nx]
    taper = jnp.clip((1.0 - z_frac) / 0.4, 0.0, 1.0)
    eta_sub = eta * taper
    dtdz = jnp.gradient(temp, axis=0) / jnp.maximum(dz, 1.0)
    dqdz = jnp.gradient(qv, axis=0) / jnp.maximum(dz, 1.0)
    dT_unit = eta_sub / rho[None] * (dtdz[None] + c.GRAV / c.CP)  # [K/s per M]
    dq_unit = eta_sub / rho[None] * dqdz[None]
    dT_unit = jnp.where(in_cloud, dT_unit, 0.0)
    dq_unit = jnp.where(in_cloud, dq_unit, 0.0)
    # closure: dA/dM from the warming's effect on the buoyancy integral
    dA_unit = jnp.sum(jnp.where(
        pos, c.GRAV / temp[None] * (dT_unit + LV / c.CP * dq_unit)
        * dz[None], 0.0), axis=1)
    m_b = jnp.where(deep, a_wf / (TAU_G * jnp.maximum(dA_unit, 1e-6)), 0.0)
    # physical cap: the scheme may not overturn more than the lightest
    # in-cloud layer's mass per step
    m_cap = jnp.min(jnp.where(in_cloud, dm[None], 1e9), axis=1) / dt
    m_b = jnp.clip(m_b, 0.0, 0.5 * m_cap)

    # 5. member tendencies: compensating subsidence advects from above
    # (dT/dt = +M eta/rho (dT/dz + g/cp) warms, dq/dt = +M eta/rho dq/dz
    # dries where q decreases with height)
    dT = m_b[:, None] * dT_unit
    dq = m_b[:, None] * dq_unit
    # detrainment-layer moistening: the updraft's saturated air deposits
    # where the net flux decreases (d eta_sub/dz < 0 across the upper
    # cloud), replacing the single-top-layer dump
    eta_above = jnp.concatenate(
        [eta_sub[:, 1:], jnp.zeros_like(eta_sub[:, :1])], axis=1)
    det_w = jnp.where(in_cloud, jnp.maximum(eta_sub - eta_above, 0.0), 0.0)
    det_q = (m_b[:, None] * det_w
             * jnp.maximum(qs[None] - qv[None], 0.0) / dm[None])
    dq = dq + det_q
    # precipitation production [kg m-2 s-1] per member
    rain_prod = m_b * jnp.sum(eta * cond, axis=1)
    # downdraft: beta of the rain evaporates below the origin
    sub = z[None] < z0[None, None]
    w_sub = jnp.where(sub, dm[None], 0.0)
    w_sub_tot = jnp.maximum(jnp.sum(w_sub, axis=1), 1e-3)
    evap = BETA_DD * rain_prod
    dq = dq + evap[:, None] * w_sub / w_sub_tot[:, None] / dm[None]
    dT = dT - LV / c.CP * evap[:, None] * w_sub / w_sub_tot[:, None] \
        / dm[None]
    rain_m = (1.0 - BETA_DD) * rain_prod

    # ensemble average (GD: equal weights)
    dT_e = jnp.mean(dT, axis=0)
    dq_e = jnp.mean(dq, axis=0)
    rain = jnp.mean(rain_m, axis=0)

    # moisture positivity: scale the column's drying if it would overdraw
    dq_e = jnp.maximum(dq_e, -qv / dt)
    exner = (pres / c.P0) ** c.KAPPA
    theta_p = state.theta_p + dt * dT_e / exner
    moist = state.moist.at[0].set(jnp.maximum(qv + dt * dq_e, 0.0))
    return (dataclasses.replace(state, theta_p=theta_p, moist=moist),
            jnp.maximum(rain, 0.0))
