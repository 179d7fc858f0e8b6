"""Real-data initialization: wrfinput-like NetCDF -> ARW core state.

TPU-native equivalent of the reference's real-case on-ramp
(``WRFV3/main/real_em.F:1`` + ``dyn_em/module_initialize_real.F``): ingest a
wrfinput-style file (terrain, map-projection metadata, winds, potential
temperature, moisture, surface pressure), rebuild the terrain-following base
state, and *hydrostatically rebalance* the disturbance fields in the exact
discrete sense of the mass-coordinate core — the vertical buoyancy residual
of ``arw._slow_tendencies`` is zero by construction at the initial state, so
a stratified real sounding does not launch spurious acoustic/gravity noise.

The file schema mirrors wrfinput (dims ``west_east[_stag]``,
``south_north[_stag]``, ``bottom_top``; vars HGT, U, V, T (theta - 300),
QVAPOR, PSFC, XLAT/XLONG/MAPFAC_M/F; global attrs DX, DY, MAP_PROJ,
TRUELAT1/2, STAND_LON, CEN_LAT/LON, P_TOP).  ``tools/make_inputs.py``
generates synthetic instances of the same schema (WPS itself is out of scope
per SURVEY §7.2.9).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ... import constants as c
from ...config import Config
from ...grid import Grid, make_grid
from ...utils import llxy
from .state import DycoreState, zero_dycore_state


def hydrostatic_rebalance(theta_p, qv, mu_p, grid: Grid):
    """phi' [nz+1, ny, nx] in exact discrete hydrostatic balance with
    (theta', qv, mu') — the buoyancy term of the w equation
    (``arw._slow_tendencies``: g[ratio dp'/deta + (ratio-1) mub - mu'])
    vanishes identically at the returned state.

    Construction (float64, host): integrate the face-balance relation
    p'_{k-1} - p'_k = def_f (mu' - (ratio_f - 1) mub) / ratio_f downward
    from a continuum-limit top-layer seed, then invert the well-conditioned
    EOS of ``arw._eos`` layer-by-layer for dphi' (closed form — pb_eff is
    base-state only)."""
    th = np.asarray(theta_p, np.float64)
    qv = np.asarray(qv, np.float64)
    mu_p = np.asarray(mu_p, np.float64)
    nz = grid.nz
    deta = np.asarray(grid.deta, np.float64).reshape(-1, 1, 1)
    eta_half = np.asarray(grid.eta_half, np.float64)
    mub = np.asarray(grid.mub, np.float64)
    phb = np.asarray(grid.phb, np.float64)
    phbd = phb[1:] - phb[:-1]
    alb_eff = phbd / (mub[None] * deta)
    pb_eff = c.P0 * (c.R_D * c.T0 / (c.P0 * alb_eff)) ** c.GAMMA

    ratio = 1.0 / (1.0 + qv)                        # alpha/alpha_d (init: qv)
    # interior-face averages (arw._avg_zf restricted to faces 1..nz-1)
    ratio_f = 0.5 * (ratio[:-1] + ratio[1:])        # [nz-1, ny, nx]
    def_f = (eta_half[:-1] - eta_half[1:]).reshape(-1, 1, 1)

    # top-layer seed: continuum dp/deta = mu_d/ratio vs base dpb/deta = mub
    mu_d = mub + mu_p
    p_pert = np.zeros((nz,) + mub.shape)
    p_pert[nz - 1] = eta_half[nz - 1] * (mu_d / ratio[nz - 1] - mub)
    # downward face integration: exact discrete balance at every interior face
    for k in range(nz - 1, 0, -1):
        p_pert[k - 1] = p_pert[k] + def_f[k - 1] * (
            mu_p - (ratio_f[k - 1] - 1.0) * mub) / ratio_f[k - 1]

    # invert the EOS split for dphi' (see arw._eos):
    #   p' = pb_eff expm1(gamma ln r),  r = F / (1 + dphi'/dphib)
    #   F = (1 + theta'/T0)(1 + Rv/Rd qv)(1 + mu'/mub)
    r = np.exp(np.log1p(p_pert / pb_eff) / c.GAMMA)
    F = ((1.0 + th / c.T0) * (1.0 + (c.R_V / c.R_D) * qv)
         * (1.0 + mu_p / mub)[None])
    dphi_p = phbd * (F / r - 1.0)
    ph_p = np.zeros((nz + 1,) + mub.shape)
    for k in range(nz):
        ph_p[k + 1] = ph_p[k] + dphi_p[k]
    return jnp.asarray(ph_p, jnp.float32)


def init_real_from_arrays(cfg: Config, grid: Grid, u, v, theta_p, qv,
                          psfc=None) -> DycoreState:
    """Build a hydrostatically rebalanced ARW state from mass-point arrays
    (u/v already on owner faces, [nz, ny, nx]); ``psfc`` [ny, nx] full moist
    surface pressure sets mu' (one-pass vapor-column correction, the
    real_em dry-pressure adjustment)."""
    nz = grid.nz
    deta = np.asarray(grid.deta, np.float64).reshape(-1, 1, 1)
    qv64 = np.asarray(qv, np.float64)
    if psfc is not None:
        # p_half = p_top + mu_base * eta_half (make_grid base construction)
        p_top = float(np.asarray(grid.p_base)[0]
                      - float(grid.mu_base) * float(np.asarray(grid.eta_half)[0]))
        # psfc - p_top = integral of mu_full deta ~ mu_d (1 + sum qv deta)
        wet_col = np.sum(qv64 * deta, axis=0)
        mu_d = (np.asarray(psfc, np.float64) - p_top) / (1.0 + wet_col)
        mu_p = mu_d - np.asarray(grid.mub, np.float64)
    else:
        mu_p = np.zeros((grid.ny, grid.nx))
    ph_p = hydrostatic_rebalance(theta_p, qv64, mu_p, grid)
    s = zero_dycore_state(cfg, grid)
    moist = s.moist.at[0].set(jnp.asarray(qv, jnp.float32))
    return dataclasses.replace(
        s, u=jnp.asarray(u, jnp.float32), v=jnp.asarray(v, jnp.float32),
        theta_p=jnp.asarray(theta_p, jnp.float32), moist=moist,
        mu=jnp.asarray(mu_p, jnp.float32), ph=ph_p)


def read_wrfinput(path: str) -> dict:
    """Read the wrfinput-like schema into numpy arrays + projection attrs."""
    from scipy.io import netcdf_file

    f = netcdf_file(path, "r", mmap=False)
    g = lambda n: np.array(f.variables[n][:]) if n in f.variables else None
    out = dict(
        hgt=g("HGT"), u_stag=g("U"), v_stag=g("V"), t=g("T"),
        qvapor=g("QVAPOR"), psfc=g("PSFC"),
        xlat=g("XLAT"), xlong=g("XLONG"), msft=g("MAPFAC_M"), f_cor=g("F"),
        ivgtyp=g("IVGTYP"), isltyp=g("ISLTYP"),
    )
    for a in ("DX", "DY", "MAP_PROJ", "TRUELAT1", "TRUELAT2", "STAND_LON",
              "CEN_LAT", "CEN_LON", "P_TOP"):
        out[a.lower()] = getattr(f, a, None)
    f.close()
    return out


_PROJ_BY_CODE = {1: llxy.PROJ_LC, 2: llxy.PROJ_PS, 3: llxy.PROJ_MERC,
                 6: llxy.PROJ_LATLON}


def init_real(cfg: Config, path: str):
    """wrfinput-like file -> (grid, state): the real_em on-ramp.

    The terrain-following base state is rebuilt by :func:`make_grid` (as
    real_em reconstructs base fields rather than trusting the met input);
    map factors and Coriolis come from the file when present, else from the
    MAP_PROJ metadata via :mod:`utils.llxy`."""
    d = read_wrfinput(path)
    cfg_d = cfg.domain
    hgt = d["hgt"]
    if hgt.shape != (cfg_d.ny, cfg_d.nx):
        raise ValueError(
            f"wrfinput grid {hgt.shape} != config {(cfg_d.ny, cfg_d.nx)}")
    grid = make_grid(cfg, hgt=hgt)

    # projection geography: file fields win; else derive from attrs
    msft, f_cor = d["msft"], d["f_cor"]
    if (msft is None or f_cor is None) and d["map_proj"] is not None:
        kind = _PROJ_BY_CODE.get(int(d["map_proj"]))
        if kind is not None:
            proj = llxy.make_projection(
                kind, float(d["cen_lat"]), float(d["cen_lon"]),
                float(d["dx"]), stdlon=float(d["stand_lon"]),
                truelat1=float(d["truelat1"]), truelat2=float(d["truelat2"]))
            _, _, msft, f_cor = llxy.grid_geography(proj, cfg_d.nx, cfg_d.ny)
    if msft is not None:
        grid = dataclasses.replace(grid, msft=jnp.asarray(msft, jnp.float32))
    if f_cor is not None:
        grid = dataclasses.replace(grid,
                                   f_cor=jnp.asarray(f_cor, jnp.float32))

    # unstagger: wrfinput U [nz, ny, nx+1] west faces -> owner-face u = U[:nx]
    u = d["u_stag"][..., : cfg_d.nx]
    v = d["v_stag"][..., : cfg_d.ny, :]
    state = init_real_from_arrays(cfg, grid, u, v, d["t"], d["qvapor"],
                                  psfc=d["psfc"])
    sfc = {"ivgtyp": d.get("ivgtyp"), "isltyp": d.get("isltyp")}
    return grid, state, sfc
