"""Slab land-surface model: prognostic skin temperature by surface energy
balance (force-restore).

Equivalent of the reference's LSM slot (``phys/module_sf_slab.F``, the
Blackadar force-restore soil called from ``surface_driver``,
``module_first_rk_step_part1.F:431``): the skin temperature TSK integrates
net radiation minus sensible, latent and ground heat flux over a thin slab,
restored toward a slowly-evolving deep-soil temperature — replacing round
1's prescribed diurnal theta excess.

TPU design: two [ny, nx] prognostic fields carried in CoupledState; the
step is a pure function evaluated once per model step with the previous
step's radiation fluxes (standard time staggering).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ... import constants as c
from .thermo import saturation_mixing_ratio

STEFAN = 5.670e-8          # W m-2 K-4
C_SLAB = 8.0e4             # slab areal heat capacity [J m-2 K-1]
TAU_RESTORE = 86400.0      # force-restore period [s]
EMISS = 0.98               # surface emissivity
MOIST_AVAIL = 0.3          # soil moisture availability (mavail)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LandState:
    tsk: jax.Array       # [ny, nx] skin temperature [K]
    t_deep: jax.Array    # [ny, nx] deep-soil (restore) temperature [K]


def init_land(ny: int, nx: int, t0: float = 288.0) -> LandState:
    f = jnp.full((ny, nx), t0, jnp.float32)
    return LandState(tsk=f, t_deep=f)


def slab_lsm_step(land: LandState, sw_dn, lw_dn, temp1, qv1, rho1, ustar,
                  exner_sfc, th1, dt, albedo=0.2,
                  mavail=MOIST_AVAIL) -> tuple:
    """One force-restore step.

    sw_dn/lw_dn: surface downward fluxes [W m-2] from radiation_driver;
    temp1/qv1/rho1/th1: lowest-level air state; ustar from the surface
    layer; exner_sfc: surface Exner function (converts TSK to theta).
    Returns (new LandState, fluxes dict(hfx, qfx_w, grf)).
    """
    tsk = land.tsk
    # aerodynamic exchange: C u* (bulk transfer with the similarity u*)
    ch = 0.1 * ustar + 1.0e-3
    th_sk = tsk / exner_sfc
    hfx = rho1 * c.CP * ch * (th_sk - th1)                  # W m-2 upward
    qsat_sk = saturation_mixing_ratio(tsk, 1.0e5 * exner_sfc ** (1.0 / c.KAPPA))
    qfx = mavail * rho1 * ch * jnp.maximum(qsat_sk - qv1, 0.0)   # kg m-2 s-1
    le = c.WATER_LATENT_HEAT * qfx
    lw_up = EMISS * STEFAN * tsk ** 4
    rnet = (1.0 - albedo) * sw_dn + EMISS * lw_dn - lw_up
    grf = (2.0 * jnp.pi / TAU_RESTORE) * C_SLAB * (tsk - land.t_deep)
    tsk_new = tsk + dt * (rnet - hfx - le - grf) / C_SLAB
    tsk_new = jnp.clip(tsk_new, 200.0, 340.0)
    t_deep_new = land.t_deep + dt * (tsk_new - land.t_deep) / TAU_RESTORE
    new = dataclasses.replace(land, tsk=tsk_new.astype(jnp.float32),
                              t_deep=t_deep_new.astype(jnp.float32))
    return new, dict(hfx=hfx, qfx_w=qfx, grf=grf, rnet=rnet)
