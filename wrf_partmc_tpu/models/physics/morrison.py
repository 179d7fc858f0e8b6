"""Morrison-class two-moment bulk microphysics (mp_physics=10).

Clean-room implementation of the scheme family the reference's CARES case
runs (``phys/module_mp_morr_two_moment.F``, selected by ``mp_physics=10`` in
``test/em_real/namelist.input.cares``; Morrison, Curry & Khvorostyanov 2005,
J. Atmos. Sci. 62:1665; Morrison et al. 2009, Mon. Wea. Rev. 137:991): five
water classes (vapor, cloud, rain, ice, snow) with prognostic *number*
concentrations for rain, ice and snow, inverse-exponential size spectra with
diagnosed slope, double-moment process rates, and moment-weighted
sedimentation.  Cloud droplet number is the fixed NDCNST analogue (the WRF
default for non-aerosol-aware runs).

Moist-axis layout (n_moist == 8, no graupel):
  0 qv, 1 qc, 2 qr, 3 qi, 4 qs    [kg/kg]
  5 nr, 6 ni, 7 ns                [#/kg]
With graupel (n_moist == 10 — the CARES configuration: the reference
Morrison carries qg/ng with a hail switch, ``module_mp_morr_two_moment.F``):
  0 qv, 1 qc, 2 qr, 3 qi, 4 qs, 5 qg   [kg/kg]
  6 nr, 7 ni, 8 ns, 9 ng               [#/kg]
Graupel processes: rain freezing routed to graupel, riming-to-graupel
conversion when snow riming outpaces its depositional growth, graupel
accretion of cloud and rain with a Musil-class wet-growth limit (unfrozen
collected water sheds to rain), deposition/sublimation, melting, and
moment-weighted sedimentation with the Locatelli-Hobbs lump-graupel fall
law.

All process formulations are the standard published ones: KK2000 warm-rain
autoconversion/accretion, ventilated rain evaporation, Cooper ice
nucleation, capacitance depositional growth, threshold ice->snow
autoconversion, snow riming/aggregation, Bigg freezing, melting — a compact
process set, not a line port; TPU-first (single fused column pass, no
iteration over species loops, static shapes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants as c
from ...grid import Grid
from ..dycore.state import DycoreState, base_profiles, temperature, total_pressure
from .microphysics import sat_mixing_ratio_ice
from .thermo import saturation_mixing_ratio as sat_mixing_ratio

LV = c.WATER_LATENT_HEAT

# fixed cloud-droplet number (Morrison NDCNST = 250 /cm3)
NDCNST = 250.0e6        # [# m-3]
RHO_W = 1000.0
RHO_I = 500.0
RHO_S = 100.0
LS = c.ICE_LATENT_HEAT_SUB
LF = c.ICE_LATENT_HEAT_FUS

# fall speed power laws V = a D^b [SI] (Morrison 2005 Table 1 class)
AR, BR = 841.99667, 0.8       # rain (Liu & Orville)
AI, BI = 700.0, 1.0           # cloud ice
AS, BS = 11.72, 0.41          # snow (Locatelli & Hobbs)
AG, BG = 19.3, 0.37           # graupel (Locatelli & Hobbs lump graupel)
RHO_G = 400.0
M_G0 = 3.0e-9                 # embryo graupel mass (~250 um at rho_g)

_G4 = 6.0                      # Gamma(4)


def _gamma(x):
    return jnp.exp(jax.scipy.special.gammaln(x))


def _slope(q, n, rho, rho_p, lam_min, lam_max):
    """Inverse-exponential spectrum slope lambda = (pi rho_p n / (rho q))^1/3
    per unit air mass moments; n capped to keep lambda in bounds."""
    lam = (jnp.pi * rho_p * jnp.maximum(n, 1.0)
           / jnp.maximum(q, 1e-14)) ** (1.0 / 3.0)
    lam = jnp.clip(lam, lam_min, lam_max)
    n0 = n * lam
    return lam, n0


def morrison_step(state: DycoreState, grid: Grid, dt) -> DycoreState:
    """One adjustment-slot microphysics step (microphysics_driver position,
    ``solve_em.F:3760``)."""
    m = state.moist
    has_g = m.shape[0] >= 10
    qv, qc, qr, qi, qs = (m[0], m[1], m[2], m[3], m[4])
    if has_g:
        qg = jnp.maximum(m[5], 0.0)
        nr, ni, ns, ng = (jnp.maximum(m[6], 0.0), jnp.maximum(m[7], 0.0),
                          jnp.maximum(m[8], 0.0), jnp.maximum(m[9], 0.0))
    else:
        qg = jnp.zeros_like(qr)
        ng = jnp.zeros_like(qr)
        nr, ni, ns = (jnp.maximum(m[5], 0.0), jnp.maximum(m[6], 0.0),
                      jnp.maximum(m[7], 0.0))
    temp = temperature(state, grid)
    pres = total_pressure(state, grid)
    rho = pres / (c.R_D * temp)
    t0c = 273.15
    cold = temp < t0c

    # ---- spectra slopes (per-kg moments; rho converts to per-volume) ----
    lam_r, _ = _slope(qr, nr, rho, RHO_W, 1e3, 1e5)
    lam_i, _ = _slope(qi, ni, rho, RHO_I, 1e3, 1e7)
    lam_s, _ = _slope(qs, ns, rho, RHO_S, 1e2, 1e5)
    lam_g, _ = _slope(qg, ng, rho, RHO_G, 1e2, 1e5)

    # ---- warm rain (KK2000) ----
    nc = NDCNST / rho                                     # [#/kg]
    prc = 1350.0 * jnp.maximum(qc, 0.0) ** 2.47 \
        * (nc * 1e-6 * rho) ** (-1.79)                    # autoconversion
    nprc = prc / (4.0 / 3.0 * jnp.pi * RHO_W * (25e-6) ** 3) / rho
    pra = 67.0 * jnp.maximum(qc * qr, 0.0) ** 1.15        # accretion
    # rain self-collection reduces nr (Beheng 1994 class)
    nragg = 8.0 * nr * qr * rho

    # ---- rain evaporation (sub-saturated), ventilated ----
    qvs = sat_mixing_ratio(temp, pres)
    ssw = qv / jnp.maximum(qvs, 1e-12) - 1.0
    dv = 8.794e-5 * temp ** 1.81 / pres
    ab_w = 1.0 + LV ** 2 * qvs / (c.CP * c.R_V * temp ** 2)
    vent_r = (0.78 * nr * lam_r ** (-1.0)
              + 0.308 * 0.9 * (nr * lam_r)
              * jnp.sqrt(AR * rho ** 0.5) * _gamma(2.5 + BR / 2.0)
              * lam_r ** (-(2.5 + BR / 2.0)))
    pre = jnp.where(ssw < 0.0,
                    2.0 * jnp.pi * dv * ssw * vent_r / ab_w, 0.0)
    pre = jnp.maximum(pre, -qr / dt)                      # <= available rain
    npre = jnp.where(qr > 1e-12, pre * nr / jnp.maximum(qr, 1e-12), 0.0)

    # ---- ice nucleation (Cooper 1986) + deposition growth ----
    qvi = sat_mixing_ratio_ice(temp, pres)
    ssi = qv / jnp.maximum(qvi, 1e-12) - 1.0
    n_nuc = jnp.where(cold & (ssi > 0.05),
                      0.005 * jnp.exp(0.304 * (t0c - temp)) * 1e3, 0.0)
    n_nuc = jnp.minimum(n_nuc, 1e8) / rho                 # [#/kg]
    pnuc_n = jnp.maximum(n_nuc - ni, 0.0) / dt
    pnuc_q = pnuc_n * 1e-12                                # 1 pg embryos
    ab_i = 1.0 + LS ** 2 * qvi / (c.CP * c.R_V * temp ** 2)
    prd = jnp.where(cold,
                    2.0 * jnp.pi * dv * ssi * ni / (ab_i * lam_i), 0.0)
    prd = jnp.clip(prd, -qi / dt, jnp.maximum(qv - qvi, 0.0) / dt)

    # ---- ice -> snow autoconversion (size threshold 125 um) ----
    d_crit = 125e-6
    frac_big = jnp.exp(-lam_i * d_crit)
    prci = jnp.where(cold, qi * frac_big / (dt * 3.0), 0.0)
    nprci = jnp.where(cold, ni * frac_big / (dt * 3.0), 0.0)

    # ---- snow deposition + aggregation + riming ----
    vent_s = (0.78 * ns * lam_s ** (-1.0)
              + 0.308 * 0.9 * (ns * lam_s)
              * jnp.sqrt(AS * rho ** 0.5) * _gamma(2.5 + BS / 2.0)
              * lam_s ** (-(2.5 + BS / 2.0)))
    prds = jnp.where(cold, 2.0 * jnp.pi * dv * ssi * vent_s / ab_i, 0.0)
    prds = jnp.clip(prds, -qs / dt, jnp.maximum(qv - qvi, 0.0) / dt)
    nsagg = jnp.where(cold, 0.1 * ns * qs * rho, 0.0)     # aggregation
    # riming: snow sweeps cloud water (continuous collection)
    eff = 0.8
    psacw = jnp.where(cold, jnp.pi / 4.0 * eff * AS * rho ** 0.5 * qc * ns
                      * _gamma(3.0 + BS) * lam_s ** (-(3.0 + BS)), 0.0)

    # ---- rain freezing (Bigg 1953) below -4 C; frozen drops are dense
    # rimed particles -> graupel when carried, else snow (the reference
    # routes PGFR to graupel, module_mp_morr_two_moment.F) ----
    # supercooling clamped to 40 K: below -40 C homogeneous freezing has
    # consumed the rain anyway, and the unclamped exponential overflows
    # f32 (exp(0.66*118) ~ 8e35 -> inf * lam^-6 = NaN at a 155 K model top)
    bigg = jnp.where(temp < t0c - 4.0,
                     100.0 * (jnp.exp(0.66 * jnp.minimum(t0c - temp, 40.0))
                              - 1.0), 0.0)
    pgfr = jnp.pi ** 2 / 36.0 * RHO_W / rho * bigg * nr \
        * _gamma(7.0) * lam_r ** (-6.0)
    pgfr = jnp.minimum(pgfr, qr / dt)
    ngfr = jnp.where(qr > 1e-12, pgfr * nr / jnp.maximum(qr, 1e-12), 0.0)

    # ---- graupel processes (only live when the moist family carries
    # qg/ng; all rates are ~ ng and vanish otherwise) ----
    # riming-to-graupel conversion: when snow riming outpaces twice its
    # depositional growth, half the rimed mass densifies into graupel
    # (threshold behavior of PGSACW, module_mp_morr_two_moment.F)
    if has_g:
        conv = cold & (psacw > 2.0 * jnp.maximum(prds, 0.0)) & (qs > 1e-7)
        pgsacw = jnp.where(conv, 0.5 * psacw, 0.0)
        psacw = psacw - pgsacw
        ngsacw = pgsacw / M_G0
    else:
        pgsacw = jnp.zeros_like(psacw)
        ngsacw = pgsacw
    # graupel continuous collection of cloud water and rain (below 0 C)
    gcol = jnp.pi / 4.0 * AG * rho ** 0.5 * ng \
        * _gamma(3.0 + BG) * lam_g ** (-(3.0 + BG))
    pgacw = jnp.where(cold, 0.7 * qc * gcol, 0.0)
    pgacr = jnp.where(cold, 1.0 * qr * gcol, 0.0)
    ngacr = jnp.where(qr > 1e-12, pgacr * nr / jnp.maximum(qr, 1e-12), 0.0)
    # Musil-class wet-growth limit: freezing enthalpy flux bounds the
    # rime rate; unfrozen collected water sheds back to rain
    vent_g = (0.78 * ng * lam_g ** (-1.0)
              + 0.308 * 0.9 * (ng * lam_g)
              * jnp.sqrt(AG * rho ** 0.5) * _gamma(2.5 + BG / 2.0)
              * lam_g ** (-(2.5 + BG / 2.0)))
    kair = 0.024
    pgwet = jnp.where(
        cold,
        2.0 * jnp.pi * (kair * (t0c - temp)
                        + LV * dv * rho * jnp.maximum(qvs - qv, 0.0))
        * vent_g / (rho * (LF + 4187.0 * (t0c - temp) + 1.0)), 1e9)
    # graupel deposition/sublimation (as snow, with graupel ventilation)
    prdg = jnp.where(cold, 2.0 * jnp.pi * dv * ssi * vent_g / ab_i, 0.0)
    prdg = jnp.clip(prdg, -qg / dt, jnp.maximum(qv - qvi, 0.0) / dt)

    # ---- melting (ice -> cloud, snow/graupel -> rain) above 0 C ----
    melt_rate = jnp.maximum(temp - t0c, 0.0) / (dt * 50.0)
    pim = jnp.where(~cold, jnp.minimum(qi / dt, qi * melt_rate / 1e-3), 0.0)
    psm = jnp.where(~cold, jnp.minimum(qs / dt, qs * melt_rate / 1e-3), 0.0)
    pgm = jnp.where(~cold, jnp.minimum(qg / dt, qg * melt_rate / 2e-3), 0.0)
    nim = jnp.where(qi > 1e-12, pim * ni / jnp.maximum(qi, 1e-12), 0.0)
    nsm = jnp.where(qs > 1e-12, psm * ns / jnp.maximum(qs, 1e-12), 0.0)
    ngm = jnp.where(qg > 1e-12, pgm * ng / jnp.maximum(qg, 1e-12), 0.0)

    # ---- conservation-limited process application: scale each species'
    # total sinks so they cannot exceed what is available (the positivity
    # clamps alone would create water) ----
    sink_v = (jnp.maximum(pnuc_q, 0.0) + jnp.maximum(prd, 0.0)
              + jnp.maximum(prds, 0.0) + jnp.maximum(prdg, 0.0))
    fv = jnp.minimum(1.0, jnp.maximum(qv, 0.0)
                     / jnp.maximum(sink_v * dt, 1e-30))
    pnuc_q = pnuc_q * fv
    pnuc_n = pnuc_n * fv
    prd = jnp.where(prd > 0, prd * fv, prd)
    prds = jnp.where(prds > 0, prds * fv, prds)
    prdg = jnp.where(prdg > 0, prdg * fv, prdg)
    sink_c = prc + pra + psacw + pgsacw + pgacw
    fc = jnp.minimum(1.0, jnp.maximum(qc, 0.0)
                     / jnp.maximum(sink_c * dt, 1e-30))
    prc, nprc, pra, psacw = prc * fc, nprc * fc, pra * fc, psacw * fc
    pgsacw, ngsacw, pgacw = pgsacw * fc, ngsacw * fc, pgacw * fc
    sink_i = prci + pim + jnp.maximum(-prd, 0.0)
    fi = jnp.minimum(1.0, jnp.maximum(qi, 0.0)
                     / jnp.maximum(sink_i * dt, 1e-30))
    prci, nprci, pim, nim = prci * fi, nprci * fi, pim * fi, nim * fi
    prd = jnp.where(prd < 0, prd * fi, prd)
    sink_r = pgfr + pgacr + jnp.maximum(-pre, 0.0)
    fr = jnp.minimum(1.0, jnp.maximum(qr, 0.0)
                     / jnp.maximum(sink_r * dt, 1e-30))
    pgfr, ngfr = pgfr * fr, ngfr * fr
    pgacr, ngacr = pgacr * fr, ngacr * fr
    pre = jnp.where(pre < 0, pre * fr, pre)
    npre = jnp.where(pre < 0, npre * fr, npre)
    sink_s = psm + jnp.maximum(-prds, 0.0)
    fs = jnp.minimum(1.0, jnp.maximum(qs, 0.0)
                     / jnp.maximum(sink_s * dt, 1e-30))
    psm, nsm = psm * fs, nsm * fs
    prds = jnp.where(prds < 0, prds * fs, prds)
    sink_g = pgm + jnp.maximum(-prdg, 0.0)
    fg = jnp.minimum(1.0, jnp.maximum(qg, 0.0)
                     / jnp.maximum(sink_g * dt, 1e-30))
    pgm, ngm = pgm * fg, ngm * fg
    prdg = jnp.where(prdg < 0, prdg * fg, prdg)

    # wet-growth split after limiting: the unfrozen part of the collected
    # cloud+rain water sheds back to rain
    dry = pgacw + pgacr
    f_frz = jnp.minimum(1.0, pgwet / jnp.maximum(dry, 1e-30))
    pshed = dry * (1.0 - f_frz)
    pgacw_f = pgacw * f_frz
    pgacr_f = pgacr * f_frz

    pgfr_s = jnp.where(has_g, 0.0, pgfr)   # frozen rain -> snow w/o graupel
    pgfr_g = pgfr - pgfr_s
    dqc = -(prc + pra + psacw + pgsacw + pgacw) * dt + pim * dt
    dqr = (prc + pra - pgfr - pgacr + pshed) * dt \
        + pre * dt + (psm + pgm) * dt
    dqi = (pnuc_q + prd - prci - pim) * dt
    dqs = (prci + prds + psacw + pgfr_s - psm) * dt
    dqg = (pgfr_g + pgsacw + pgacw_f + pgacr_f + prdg - pgm) * dt
    dqv = -(pnuc_q + prd + prds + prdg) * dt - pre * dt

    qc1 = jnp.maximum(qc + dqc, 0.0)
    qr1 = jnp.maximum(qr + dqr, 0.0)
    qi1 = jnp.maximum(qi + dqi, 0.0)
    qs1 = jnp.maximum(qs + dqs, 0.0)
    qg1 = jnp.maximum(qg + dqg, 0.0)
    qv1 = jnp.maximum(qv + dqv, 0.0)
    nr1 = jnp.maximum(nr + (nprc - nragg - ngfr + nsm + ngm + npre
                            - ngacr * f_frz) * dt, 0.0)
    ni1 = jnp.maximum(ni + (pnuc_n - nprci - nim) * dt, 0.0)
    ns1 = jnp.maximum(ns + (nprci + jnp.where(has_g, 0.0, ngfr)
                            - nsagg - nsm) * dt, 0.0)
    ng1 = jnp.maximum(ng + (jnp.where(has_g, ngfr, 0.0) + ngsacw
                            - ngm) * dt, 0.0)

    # latent heating: condensation/deposition/freezing -> theta
    exner = (pres / c.P0) ** c.KAPPA
    heat = (LV * (-pre) + LS * (pnuc_q + prd + prds + prdg)
            + LF * (pgfr + psacw + pgsacw + pgacw_f + pgacr_f
                    - pim - psm - pgm)) * dt / (c.CP * exner)

    # ---- saturation adjustment for cloud water (after processes) ----
    temp1 = temp + heat * exner
    qvs1 = sat_mixing_ratio(temp1, pres)
    ab1 = 1.0 + LV ** 2 * qvs1 / (c.CP * c.R_V * temp1 ** 2)
    cond = jnp.clip((qv1 - qvs1) / ab1, -qc1, None)
    qv1 = qv1 - cond
    qc1 = qc1 + cond
    heat = heat + LV * cond / (c.CP * exner)

    # ---- sedimentation (moment-weighted fall speeds) ----
    def fall_speed(a, b, lam, mom):
        return a * _gamma(1.0 + b + mom) / _gamma(1.0 + mom) \
            * lam ** (-b) * (1.2 / rho) ** 0.5

    lam_r1, _ = _slope(qr1, nr1, rho, RHO_W, 1e3, 1e5)
    lam_i1, _ = _slope(qi1, ni1, rho, RHO_I, 1e3, 1e7)
    lam_s1, _ = _slope(qs1, ns1, rho, RHO_S, 1e2, 1e5)
    lam_g1, _ = _slope(qg1, ng1, rho, RHO_G, 1e2, 1e5)
    from .microphysics import _sediment

    if state.ph is not None:
        dz = (grid.phb[1:] - grid.phb[:-1] + state.ph[1:] - state.ph[:-1]) \
            / c.GRAV
    else:
        dz = jnp.broadcast_to(grid.dz.reshape(-1, 1, 1), qr1.shape)

    species = [(qr1, nr1, lam_r1, AR, BR, 9.0, "r"),
               (qi1, ni1, lam_i1, AI, BI, 9.0, "i"),
               (qs1, ns1, lam_s1, AS, BS, 9.0, "s")]
    if has_g:
        species.append((qg1, ng1, lam_g1, AG, BG, 20.0, "g"))
    out = {}
    for (q_, n_, lam_, a_, b_, vmax, tag) in species:
        vq = jnp.clip(fall_speed(a_, b_, lam_, 3.0), 0.0, vmax)
        vn = jnp.clip(fall_speed(a_, b_, lam_, 0.0), 0.0, vmax)
        out[tag] = (_sediment(q_, rho, vq, dz, dt),
                    _sediment(n_, rho, vn, dz, dt))
    qr1, nr1 = out["r"]
    qi1, ni1 = out["i"]
    qs1, ns1 = out["s"]

    moist = m.at[0].set(qv1).at[1].set(qc1).at[2].set(qr1) \
        .at[3].set(qi1).at[4].set(qs1)
    if has_g:
        qg1, ng1 = out["g"]
        moist = moist.at[5].set(qg1).at[6].set(nr1).at[7].set(ni1) \
            .at[8].set(ns1).at[9].set(ng1)
    else:
        moist = moist.at[5].set(nr1).at[6].set(ni1).at[7].set(ns1)
    return dataclasses.replace(state, moist=moist,
                               theta_p=state.theta_p + heat)
