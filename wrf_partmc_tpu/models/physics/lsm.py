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

# Per-category vegetation/soil parameters (porosity, field capacity,
# wilting point, Clapp-Hornberger b, k_sat, psi_sat, rsmin, LAI, veg
# fraction, albedo, emissivity) come from the LANDUSE/SOILPARM-class
# tables in models.physics.landuse, resolved per cell each step.
DZS = (0.10, 0.30, 0.60, 1.00)       # Noah soil layer thicknesses [m]
THETA_SAT = 0.45                     # loam-class porosity (fallback default)
C_WATER = 4.18e6


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NoahState:
    tsk: jax.Array       # [ny, nx] skin temperature [K]
    t_soil: jax.Array    # [4, ny, nx] soil layer temperatures [K]
    smois: jax.Array     # [4, ny, nx] volumetric soil moisture [m3/m3]
    tbot: jax.Array      # [ny, nx] deep boundary temperature [K]
    # LANDUSE.TBL / SOILPARM.TBL category maps (1-based USGS / STAS
    # indices, the IVGTYP/ISLTYP fields of a wrfinput); the step resolves
    # them to parameters through models.physics.landuse each call
    ivgtyp: jax.Array    # [ny, nx] int32 USGS land-use category
    isltyp: jax.Array    # [ny, nx] int32 STAS soil-texture category


def init_noah(ny: int, nx: int, t0: float = 288.0, tbot: float = 285.0,
              sm0: float | None = 0.25, ivgtyp=None, isltyp=None) -> NoahState:
    """Soil-column init (module_soil_pre-class): temperatures interpolated
    from skin toward the deep boundary; moisture uniform at ``sm0``, or at
    80% of the texture class's field capacity when ``sm0=None``."""
    from .landuse import DEFAULT_ISLTYP, DEFAULT_IVGTYP, soil_params

    depth = jnp.cumsum(jnp.asarray(DZS)) - 0.5 * jnp.asarray(DZS)
    frac = (depth / (depth[-1] + 0.5 * DZS[-1])).reshape(-1, 1, 1)
    t_soil = jnp.broadcast_to(t0 + (tbot - t0) * frac,
                              (4, ny, nx)).astype(jnp.float32)
    iv = (jnp.full((ny, nx), DEFAULT_IVGTYP, jnp.int32) if ivgtyp is None
          else jnp.asarray(ivgtyp, jnp.int32))
    isl = (jnp.full((ny, nx), DEFAULT_ISLTYP, jnp.int32) if isltyp is None
           else jnp.asarray(isltyp, jnp.int32))
    if sm0 is None:
        smois = jnp.broadcast_to(soil_params(isl)["theta_fc"] * 0.8,
                                 (4, ny, nx)).astype(jnp.float32)
    else:
        smois = jnp.full((4, ny, nx), sm0, jnp.float32)
    return NoahState(
        tsk=jnp.full((ny, nx), t0, jnp.float32),
        t_soil=t_soil,
        smois=smois,
        tbot=jnp.full((ny, nx), tbot, jnp.float32),
        ivgtyp=iv, isltyp=isl)


def _soil_conductivity(theta, theta_sat=THETA_SAT):
    """Johansen-class thermal conductivity [W/m/K] vs moisture."""
    ke = jnp.clip(jnp.log10(jnp.maximum(theta / theta_sat, 0.1)) + 1.0,
                  0.0, 1.0)
    return 0.15 + (1.9 - 0.15) * ke


def noah_lsm_step(land: NoahState, sw_dn, lw_dn, temp1, qv1, rho1, ustar,
                  exner_sfc, th1, dt, albedo=None, precip=0.0,
                  season: str = "summer") -> tuple:
    """One Noah-class step.  Same call contract as :func:`slab_lsm_step`
    (+ optional ``precip`` [kg m-2 s-1] infiltration).  Returns
    (new NoahState, fluxes dict).

    Vegetation and soil parameters come from the LANDUSE/SOILPARM-class
    tables (:mod:`~.landuse`) through the state's per-cell IVGTYP/ISLTYP
    category maps; ``albedo`` overrides the table value when given."""
    from ...ops.tridiag import solve as tridiag_solve
    from .landuse import noah_params

    p = noah_params(land.ivgtyp, land.isltyp, season)
    theta_sat, theta_fc, theta_wilt = (p["theta_sat"], p["theta_fc"],
                                       p["theta_wilt"])
    b_ch, k_sat, psi_sat = p["b_ch"], p["k_sat"], p["psi_sat"]
    veg_frac, rsmin, lai = p["veg_frac"], p["rsmin"], p["lai"]
    emiss = p["emiss"]
    albedo = p["albedo"] if albedo is None else albedo

    dzs = jnp.asarray(DZS).reshape(-1, 1, 1)
    theta = jnp.clip(land.smois, 0.02, theta_sat)
    kappa = _soil_conductivity(theta, theta_sat)        # [4, ny, nx]
    c_soil = (1.0 - theta_sat) * p["c_dry"] + theta * C_WATER

    # ---- evaporative partition ----
    ch = 0.1 * ustar + 1.0e-3
    beta1 = jnp.clip((theta[0] - theta_wilt) / (theta_fc - theta_wilt),
                     0.0, 1.0)
    # Jarvis canopy resistance: solar + root-zone moisture stress
    root = (theta[1] * DZS[1] + theta[2] * DZS[2]) / (DZS[1] + DZS[2])
    beta_rz = jnp.clip((root - theta_wilt) / (theta_fc - theta_wilt),
                       0.05, 1.0)
    f_sw = sw_dn / (sw_dn + 100.0)
    r_c = rsmin / (jnp.maximum(lai, 0.1) * jnp.maximum(f_sw * beta_rz, 0.05))
    r_a = 1.0 / jnp.maximum(ch, 1e-5)

    # ---- skin-temperature Newton solve of the surface energy balance ----
    tsk = land.tsk
    p_sfc = 1.0e5 * exner_sfc ** (1.0 / c.KAPPA)
    g_coef = kappa[0] / (0.5 * DZS[0])
    for _ in range(3):
        qsat = saturation_mixing_ratio(tsk, p_sfc)
        dqsat = qsat * c.WATER_LATENT_HEAT / (461.5 * tsk ** 2)
        e_dir = ((1.0 - veg_frac) * beta1 * rho1 * ch
                 * jnp.maximum(qsat - qv1, 0.0))
        e_t = (veg_frac * rho1 / (r_a + r_c)
               * jnp.maximum(qsat - qv1, 0.0))
        qfx = e_dir + e_t
        le = c.WATER_LATENT_HEAT * qfx
        hfx = rho1 * c.CP * ch * (tsk / exner_sfc - th1)
        lw_up = emiss * STEFAN * tsk ** 4
        g_flx = g_coef * (tsk - land.t_soil[0])
        f = (1.0 - albedo) * sw_dn + emiss * lw_dn - lw_up - hfx - le \
            - g_flx
        dfdt = -(4.0 * emiss * STEFAN * tsk ** 3
                 + rho1 * c.CP * ch / exner_sfc
                 + c.WATER_LATENT_HEAT * rho1
                 * ((1.0 - veg_frac) * beta1 * ch
                    + veg_frac / (r_a + r_c)) * dqsat
                 + g_coef)
        tsk = jnp.clip(tsk - f / dfdt, 200.0, 340.0)

    qsat = saturation_mixing_ratio(tsk, p_sfc)
    e_dir = ((1.0 - veg_frac) * beta1 * rho1 * ch
             * jnp.maximum(qsat - qv1, 0.0))
    e_t = veg_frac * rho1 / (r_a + r_c) * jnp.maximum(qsat - qv1, 0.0)
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
    rel = theta / theta_sat
    diff = (b_ch * k_sat * psi_sat / theta_sat) * rel ** (b_ch + 2.0)
    k_hyd = k_sat * rel ** (2.0 * b_ch + 3.0)
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
    smois = jnp.clip(smois, 0.02, theta_sat)

    new = NoahState(tsk=tsk.astype(jnp.float32),
                    t_soil=t_soil.astype(jnp.float32),
                    smois=smois.astype(jnp.float32),
                    tbot=land.tbot, ivgtyp=land.ivgtyp, isltyp=land.isltyp)
    rnet = (1.0 - albedo) * sw_dn + emiss * lw_dn - emiss * STEFAN * tsk ** 4
    return new, dict(hfx=hfx, qfx_w=qfx, grf=g_flx, rnet=rnet)
