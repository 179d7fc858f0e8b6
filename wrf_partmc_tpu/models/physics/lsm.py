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


# ---------------------------------------------------------------------------
# Noah-class 4-layer land-surface model (sf_surface_physics=2)
#
# The CARES d02 configuration (``namelist.input.cares:82,93``:
# sf_surface_physics=2 with num_soil_layers=4; ``phys/module_sf_noahdrv.F``,
# Chen & Dudhia 2001 MWR 129:569; soil init per ``share/module_soil_pre.F``).
# Clean-room compact member of the family: 4 prognostic soil-temperature and
# soil-moisture layers at the Noah thicknesses, Newton-linearized surface
# energy balance for the skin temperature, Johansen-class moisture-dependent
# thermal conductivity, implicit soil heat diffusion (4-layer Thomas solve),
# Clapp-Hornberger hydraulics with gravity drainage, direct soil evaporation
# (beta method) + Jarvis-class canopy-resistance transpiration from the root
# zone.  TPU-native: everything is [4, ny, nx] / [ny, nx] array arithmetic;
# the tridiagonal is the shared ops/tridiag solver.
# ---------------------------------------------------------------------------

DZS = (0.10, 0.30, 0.60, 1.00)       # Noah soil layer thicknesses [m]
THETA_SAT = 0.45                     # porosity (loam-class)
THETA_FC = 0.33                      # field capacity
THETA_WILT = 0.12                    # wilting point
B_CH = 5.3                           # Clapp-Hornberger exponent
K_SAT = 2.5e-6                       # saturated hydraulic conductivity [m/s]
PSI_SAT = 0.478                      # |saturation matric potential| [m]
C_SOIL_DRY = 1.26e6                  # dry soil volumetric heat cap [J/m3/K]
C_WATER = 4.18e6
RSMIN = 100.0                        # minimum stomatal resistance [s/m]
LAI = 2.0
VEG_FRAC = 0.7


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NoahState:
    tsk: jax.Array       # [ny, nx] skin temperature [K]
    t_soil: jax.Array    # [4, ny, nx] soil layer temperatures [K]
    smois: jax.Array     # [4, ny, nx] volumetric soil moisture [m3/m3]
    tbot: jax.Array      # [ny, nx] deep boundary temperature [K]


def init_noah(ny: int, nx: int, t0: float = 288.0, tbot: float = 285.0,
              sm0: float = 0.25) -> NoahState:
    """Soil-column init (module_soil_pre-class): temperatures interpolated
    from skin toward the deep boundary, uniform moisture."""
    depth = jnp.cumsum(jnp.asarray(DZS)) - 0.5 * jnp.asarray(DZS)
    frac = (depth / (depth[-1] + 0.5 * DZS[-1])).reshape(-1, 1, 1)
    t_soil = jnp.broadcast_to(t0 + (tbot - t0) * frac,
                              (4, ny, nx)).astype(jnp.float32)
    return NoahState(
        tsk=jnp.full((ny, nx), t0, jnp.float32),
        t_soil=t_soil,
        smois=jnp.full((4, ny, nx), sm0, jnp.float32),
        tbot=jnp.full((ny, nx), tbot, jnp.float32))


def _soil_conductivity(theta):
    """Johansen-class thermal conductivity [W/m/K] vs moisture."""
    ke = jnp.clip(jnp.log10(jnp.maximum(theta / THETA_SAT, 0.1)) + 1.0,
                  0.0, 1.0)
    return 0.15 + (1.9 - 0.15) * ke


def noah_lsm_step(land: NoahState, sw_dn, lw_dn, temp1, qv1, rho1, ustar,
                  exner_sfc, th1, dt, albedo=0.2, precip=0.0) -> tuple:
    """One Noah-class step.  Same call contract as :func:`slab_lsm_step`
    (+ optional ``precip`` [kg m-2 s-1] infiltration).  Returns
    (new NoahState, fluxes dict)."""
    from ...ops.tridiag import solve as tridiag_solve

    dzs = jnp.asarray(DZS).reshape(-1, 1, 1)
    theta = jnp.clip(land.smois, 0.02, THETA_SAT)
    kappa = _soil_conductivity(theta)                   # [4, ny, nx]
    c_soil = (1.0 - THETA_SAT) * C_SOIL_DRY + theta * C_WATER

    # ---- evaporative partition ----
    ch = 0.1 * ustar + 1.0e-3
    beta1 = jnp.clip((theta[0] - THETA_WILT) / (THETA_FC - THETA_WILT),
                     0.0, 1.0)
    # Jarvis canopy resistance: solar + root-zone moisture stress
    root = (theta[1] * DZS[1] + theta[2] * DZS[2]) / (DZS[1] + DZS[2])
    beta_rz = jnp.clip((root - THETA_WILT) / (THETA_FC - THETA_WILT),
                       0.05, 1.0)
    f_sw = sw_dn / (sw_dn + 100.0)
    r_c = RSMIN / (LAI * jnp.maximum(f_sw * beta_rz, 0.05))
    r_a = 1.0 / jnp.maximum(ch, 1e-5)

    # ---- skin-temperature Newton solve of the surface energy balance ----
    tsk = land.tsk
    p_sfc = 1.0e5 * exner_sfc ** (1.0 / c.KAPPA)
    g_coef = kappa[0] / (0.5 * DZS[0])
    for _ in range(3):
        qsat = saturation_mixing_ratio(tsk, p_sfc)
        dqsat = qsat * c.WATER_LATENT_HEAT / (461.5 * tsk ** 2)
        e_dir = ((1.0 - VEG_FRAC) * beta1 * rho1 * ch
                 * jnp.maximum(qsat - qv1, 0.0))
        e_t = (VEG_FRAC * rho1 / (r_a + r_c)
               * jnp.maximum(qsat - qv1, 0.0))
        qfx = e_dir + e_t
        le = c.WATER_LATENT_HEAT * qfx
        hfx = rho1 * c.CP * ch * (tsk / exner_sfc - th1)
        lw_up = EMISS * STEFAN * tsk ** 4
        g_flx = g_coef * (tsk - land.t_soil[0])
        f = (1.0 - albedo) * sw_dn + EMISS * lw_dn - lw_up - hfx - le \
            - g_flx
        dfdt = -(4.0 * EMISS * STEFAN * tsk ** 3
                 + rho1 * c.CP * ch / exner_sfc
                 + c.WATER_LATENT_HEAT * rho1
                 * ((1.0 - VEG_FRAC) * beta1 * ch
                    + VEG_FRAC / (r_a + r_c)) * dqsat
                 + g_coef)
        tsk = jnp.clip(tsk - f / dfdt, 200.0, 340.0)

    qsat = saturation_mixing_ratio(tsk, p_sfc)
    e_dir = ((1.0 - VEG_FRAC) * beta1 * rho1 * ch
             * jnp.maximum(qsat - qv1, 0.0))
    e_t = VEG_FRAC * rho1 / (r_a + r_c) * jnp.maximum(qsat - qv1, 0.0)
    qfx = e_dir + e_t
    hfx = rho1 * c.CP * ch * (tsk / exner_sfc - th1)
    g_flx = g_coef * (tsk - land.t_soil[0])

    # ---- implicit soil heat diffusion with the solved G as top flux and
    # a fixed deep boundary temperature ----
    k_int = 0.5 * (kappa[1:] + kappa[:-1])              # between layers
    dz_int = 0.5 * (dzs[1:] + dzs[:-1])
    flux_c = k_int / dz_int                             # [3, ny, nx]
    lo = jnp.concatenate([jnp.zeros_like(flux_c[:1]), flux_c], axis=0)
    hi = jnp.concatenate([flux_c, jnp.zeros_like(flux_c[:1])], axis=0)
    # bottom layer couples to tbot across half the deepest layer
    hb = kappa[3:] / (0.5 * dzs[3:] + 4.0)              # TBOT at ~8 m depth
    hi = hi.at[3].set(hb[0])
    alpha = dt / (c_soil * dzs)
    dl = -alpha * lo
    du = -alpha * hi
    d = 1.0 - dl - du
    rhs = land.t_soil + alpha * (
        jnp.concatenate([g_flx[None], jnp.zeros_like(flux_c)], axis=0))
    rhs = rhs.at[3].add(alpha[3] * hb[0] * land.tbot)
    t_soil = tridiag_solve(dl, d, du, rhs)

    # ---- soil moisture: Clapp-Hornberger diffusion + gravity drainage,
    # evaporation sinks, infiltration ----
    rel = theta / THETA_SAT
    diff = (B_CH * K_SAT * PSI_SAT / THETA_SAT) * rel ** (B_CH + 2.0)
    k_hyd = K_SAT * rel ** (2.0 * B_CH + 3.0)
    d_int = 0.5 * (diff[1:] + diff[:-1])
    q_diff = d_int * (theta[:-1] - theta[1:]) / dz_int  # downward if wetter
    k_int_h = 0.5 * (k_hyd[1:] + k_hyd[:-1])
    q_grav = k_int_h                                    # gravity drainage
    q_net = q_diff + q_grav                             # [3, ny, nx] m/s down
    inflow = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(precip, jnp.float32) / 1000.0,
                          q_net[:1].shape), q_net], axis=0)
    outflow = jnp.concatenate([q_net, k_hyd[3:]], axis=0)
    sink_e = jnp.zeros_like(theta)
    sink_e = sink_e.at[0].add(e_dir / 1000.0)           # kg/m2/s -> m/s
    w_rz = jnp.asarray([0.0, 0.5, 0.5, 0.0]).reshape(-1, 1, 1)
    sink_e = sink_e + w_rz * e_t[None] / 1000.0
    smois = theta + dt * (inflow - outflow - sink_e) / dzs
    smois = jnp.clip(smois, 0.02, THETA_SAT)

    new = NoahState(tsk=tsk.astype(jnp.float32),
                    t_soil=t_soil.astype(jnp.float32),
                    smois=smois.astype(jnp.float32),
                    tbot=land.tbot)
    rnet = (1.0 - albedo) * sw_dn + EMISS * lw_dn - EMISS * STEFAN * tsk ** 4
    return new, dict(hfx=hfx, qfx_w=qfx, grf=g_flx, rnet=rnet)
