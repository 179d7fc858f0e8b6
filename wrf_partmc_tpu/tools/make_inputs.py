"""Initial-condition / boundary-condition / emission input generators+readers.

Equivalent of the reference's pre-processing tools (SURVEY 2.6):
``boundary_and_initial_conditions/make_ics.F90`` / ``make_bcs.F90`` (per-column
NetCDF files of log-normal modes read by ``init_read_in_ics`` / ``_bcs``,
``wrf_pmc_init.F90:809-1080``) and ``emissions/make_emissions.F90``
(per-cell ``aero_emit_dist_<i>_<j>_<k>.nc`` mode time series read by
``init_read_in_emissions`` ``:583-804``).

TPU-native redesign of the file contract: ONE whole-domain NetCDF per kind
holding stacked mode-parameter arrays (the reference writes one small file
per column/cell from each MPI rank; with device-global arrays a single file
is the natural unit).  Readers return :class:`AeroDist` pytrees with leading
cell axes that feed directly into ``populate_from_dist`` / ``Scenario``.
"""

from __future__ import annotations

import numpy as np

from ..models.partmc.dist import AeroDist
import jax.numpy as jnp


def _nc(path, mode="w"):
    from scipy.io import netcdf_file
    return netcdf_file(path, mode, version=2)


def _write_dist(f, prefix: str, dist: AeroDist, dims: tuple):
    """Write a (possibly cell-batched) AeroDist's arrays under name prefix."""
    def var(name, extra_dims, data, typ="f"):
        v = f.createVariable(prefix + name, typ, dims + extra_dims)
        v[:] = np.asarray(data, np.float32 if typ == "f" else np.int32)

    var("num_conc", ("mode",), dist.num_conc)
    var("geom_mean_diam", ("mode",), dist.geom_mean_diam)
    var("log_geom_std", ("mode",), dist.log_geom_std)
    var("vol_frac", ("mode", "spec"), dist.vol_frac)
    # source/w_class are mode-only (no cell batch)
    v = f.createVariable(prefix + "source", "i", ("mode",))
    v[:] = np.asarray(dist.source, np.int32)
    v = f.createVariable(prefix + "w_class", "i", ("mode",))
    v[:] = np.asarray(dist.w_class, np.int32)


def _read_dist(f, prefix: str) -> AeroDist:
    g = lambda n: jnp.asarray(np.array(f.variables[prefix + n][:]), jnp.float32)
    gi = lambda n: jnp.asarray(np.array(f.variables[prefix + n][:]), jnp.int32)
    return AeroDist(num_conc=g("num_conc"), geom_mean_diam=g("geom_mean_diam"),
                    log_geom_std=g("log_geom_std"), vol_frac=g("vol_frac"),
                    source=gi("source"), w_class=gi("w_class"))


# ------------------------------------------------------------------- ICs

def write_ics(path: str, dist: AeroDist, grid) -> None:
    """Per-level/per-cell IC modes.  dist arrays may be [M], [nz, M] or
    [nz, ny, nx, M] (plus [.., M, S] vol_frac)."""
    f = _nc(path)
    lead = dist.num_conc.shape[:-1]
    names = ("z", "y", "x")[:len(lead)]
    for n, s in zip(names, lead):
        f.createDimension(n, s)
    f.createDimension("mode", dist.n_mode)
    f.createDimension("spec", dist.vol_frac.shape[-1])
    _write_dist(f, "ic_", dist, names)
    f.flush()
    f.close()


def read_ics(path: str) -> AeroDist:
    f = _nc(path, "r")
    d = _read_dist(f, "ic_")
    f.close()
    return d


# -------------------------------------------------------------- emissions

def write_emissions(path: str, times, dist: AeroDist, gas_rate) -> None:
    """Emission time series.  dist arrays [T, (nz, ny, nx,)? M] with rates in
    [# m-3 s-1]; gas_rate [T, (nz, ny, nx,)? G] ppb s-1."""
    f = _nc(path)
    f.createDimension("time", len(np.asarray(times)))
    lead = dist.num_conc.shape[1:-1]
    names = ("z", "y", "x")[:len(lead)]
    for n, s in zip(names, lead):
        f.createDimension(n, s)
    f.createDimension("mode", dist.n_mode)
    f.createDimension("spec", dist.vol_frac.shape[-1])
    f.createDimension("gas", np.asarray(gas_rate).shape[-1])
    v = f.createVariable("time", "f", ("time",))
    v[:] = np.asarray(times, np.float32)
    _write_dist(f, "emit_", dist, ("time",) + names)
    v = f.createVariable("gas_emit_rate", "f", ("time",) + names + ("gas",))
    v[:] = np.asarray(gas_rate, np.float32)
    f.flush()
    f.close()


def read_emissions(path: str):
    f = _nc(path, "r")
    times = jnp.asarray(np.array(f.variables["time"][:]), jnp.float32)
    dist = _read_dist(f, "emit_")
    gas = jnp.asarray(np.array(f.variables["gas_emit_rate"][:]), jnp.float32)
    f.close()
    return times, dist, gas


# -------------------------------------------------------------------- BCs

def write_bcs(path: str, times, back_dist: AeroDist, back_gas,
              dilution_rate) -> None:
    """Lateral-boundary background reservoir time series (the scenario
    background+dilution encoding of ``init_read_in_bcs``)."""
    f = _nc(path)
    f.createDimension("time", len(np.asarray(times)))
    lead = back_dist.num_conc.shape[1:-1]
    names = ("z",)[:len(lead)]
    for n, s in zip(names, lead):
        f.createDimension(n, s)
    f.createDimension("mode", back_dist.n_mode)
    f.createDimension("spec", back_dist.vol_frac.shape[-1])
    f.createDimension("gas", np.asarray(back_gas).shape[-1])
    v = f.createVariable("time", "f", ("time",))
    v[:] = np.asarray(times, np.float32)
    _write_dist(f, "bc_", back_dist, ("time",) + names)
    v = f.createVariable("back_gas", "f", ("time",) + names + ("gas",))
    v[:] = np.asarray(back_gas, np.float32)
    v = f.createVariable("dilution_rate", "f", ("time",))
    v[:] = np.asarray(dilution_rate, np.float32)
    f.flush()
    f.close()


def read_bcs(path: str):
    f = _nc(path, "r")
    times = jnp.asarray(np.array(f.variables["time"][:]), jnp.float32)
    dist = _read_dist(f, "bc_")
    gas = jnp.asarray(np.array(f.variables["back_gas"][:]), jnp.float32)
    dil = jnp.asarray(np.array(f.variables["dilution_rate"][:]), jnp.float32)
    f.close()
    return times, dist, gas, dil


def write_wrfinput(path: str, cfg, hgt=None, proj_kind="lambert",
                   cen_lat=40.0, cen_lon=-97.0, truelat1=30.0, truelat2=60.0,
                   stand_lon=-97.0, dtheta_dz=4.0e-3, u_jet=12.0, v0=0.0,
                   rh0=0.5, seed=0, ivgtyp=None, isltyp=None) -> None:
    """Synthetic wrfinput-like NetCDF (the ``real_em`` input contract,
    ``WRFV3/main/real_em.F:1``): terrain + map-projection metadata + a
    stable sheared sounding, in wrfinput variable names/dims so
    :func:`models.dycore.real.init_real` can ingest it.  Stands in for WPS
    (out of scope per SURVEY §7.2.9) the way CARES/CONUS wrfinputs feed the
    reference."""
    from .. import constants as c
    from ..grid import make_grid
    from ..models.dycore.ideal import hill_terrain
    from ..models.physics.thermo import saturation_vapor_pressure
    from ..utils import llxy

    d = cfg.domain
    if hgt is None:
        hgt = hill_terrain(cfg, h0=300.0, half_width_frac=0.2)
    hgt = np.asarray(hgt)
    grid = make_grid(cfg, hgt=hgt)
    nz, ny, nx = d.nz, d.ny, d.nx

    proj = llxy.make_projection(proj_kind, cen_lat, cen_lon, d.dx,
                                stdlon=stand_lon, truelat1=truelat1,
                                truelat2=truelat2)
    xlat, xlong, msft, f_cor = llxy.grid_geography(proj, nx, ny)

    # stable sounding on the terrain-following half levels
    z3 = np.asarray(0.5 * (grid.phb[1:] + grid.phb[:-1])) / c.GRAV
    theta = c.T0 + dtheta_dz * z3                         # [nz, ny, nx]
    rng = np.random.default_rng(seed)
    theta += 0.1 * rng.standard_normal(theta.shape)       # seed perturbations
    # sheared zonal jet peaking mid-troposphere
    ztop = float(np.asarray(grid.z_full)[-1])
    u3 = u_jet * np.sin(np.pi * np.clip(z3 / ztop, 0, 1))
    v3 = np.full_like(u3, v0)
    # moisture: fixed RH against the base-state temperature profile
    t3 = theta * (np.asarray(grid.pb3) / c.P0) ** c.KAPPA
    e_sat = np.asarray(saturation_vapor_pressure(jnp.asarray(t3)))
    qv = rh0 * c.EPS_VAP * e_sat / np.maximum(
        np.asarray(grid.pb3) - e_sat, 1e3)
    qv = np.clip(qv, 0.0, 0.02) * np.exp(-z3 / 3000.0)
    # moist surface pressure: base dry + vapor column
    p_top = float(np.asarray(grid.p_base)[0]
                  - float(grid.mu_base) * float(np.asarray(grid.eta_half)[0]))
    deta = np.asarray(grid.deta).reshape(-1, 1, 1)
    psfc = p_top + np.asarray(grid.mub) * (1.0 + np.sum(qv * deta, axis=0))

    f = _nc(path)
    for name, n in (("west_east", nx), ("west_east_stag", nx + 1),
                    ("south_north", ny), ("south_north_stag", ny + 1),
                    ("bottom_top", nz), ("bottom_top_stag", nz + 1)):
        f.createDimension(name, n)

    def var(name, dims, data):
        v = f.createVariable(name, "f", dims)
        v[:] = np.asarray(data, np.float32)

    var("HGT", ("south_north", "west_east"), hgt)
    # owner-face u == west-face values; replicate the last face for _stag
    u_stag = np.concatenate([u3, u3[..., -1:]], axis=-1)
    v_stag = np.concatenate([v3, v3[..., -1:, :]], axis=-2)
    var("U", ("bottom_top", "south_north", "west_east_stag"), u_stag)
    var("V", ("bottom_top", "south_north_stag", "west_east"), v_stag)
    var("T", ("bottom_top", "south_north", "west_east"), theta - c.T0)
    var("QVAPOR", ("bottom_top", "south_north", "west_east"), qv)
    var("PSFC", ("south_north", "west_east"), psfc)
    var("XLAT", ("south_north", "west_east"), xlat)
    var("XLONG", ("south_north", "west_east"), xlong)
    var("MAPFAC_M", ("south_north", "west_east"), msft)
    var("F", ("south_north", "west_east"), f_cor)
    # land-use / soil-texture category maps (Noah-class LSM consumers via
    # models.physics.landuse; optional like real wrfinputs always carry them)
    if ivgtyp is not None:
        vi = f.createVariable("IVGTYP", "i", ("south_north", "west_east"))
        vi[:] = np.asarray(ivgtyp, np.int32)
    if isltyp is not None:
        vs = f.createVariable("ISLTYP", "i", ("south_north", "west_east"))
        vs[:] = np.asarray(isltyp, np.int32)
    f.DX = float(d.dx)
    f.DY = float(d.dy)
    f.MAP_PROJ = {"lambert": 1, "polar": 2, "mercator": 3, "lat-lon": 6}[proj_kind]
    f.TRUELAT1 = float(truelat1)
    f.TRUELAT2 = float(truelat2)
    f.STAND_LON = float(stand_lon)
    f.CEN_LAT = float(cen_lat)
    f.CEN_LON = float(cen_lon)
    f.P_TOP = p_top
    f.flush()
    f.close()


def write_wrfbdy(path: str, bdy) -> None:
    """Write a BdyData time series as the wrfbdy-equivalent NetCDF contract
    (``share/wrf_bdyout.F``: per-edge boundary slabs + boundary times)."""
    import numpy as np

    with _nc(path, "w") as f:
        f.createDimension("Time", bdy.times.shape[0])
        f.createVariable("btime", "f4", ("Time",))[:] = np.asarray(bdy.times)
        for name, edges in bdy.slabs.items():
            for e, arr in edges.items():
                a = np.asarray(arr)
                dims = []
                for d, n in enumerate(a.shape):
                    dn = f"{name}_{e}_d{d}"
                    f.createDimension(dn, n)
                    dims.append(dn)
                f.createVariable(f"{name}_{e}", "f4", tuple(dims))[:] = a


def read_wrfbdy(path: str):
    """Read the wrfbdy-equivalent file back into a BdyData."""
    import jax.numpy as jnp

    from ..models.coupled.bdy import BdyData

    import numpy as np

    with _nc(path, "r") as f:
        f32 = lambda v: jnp.asarray(np.asarray(v[:], dtype=np.float32))
        times = f32(f.variables["btime"])
        slabs = {}
        for vn in f.variables:
            if vn == "btime" or "_" not in vn:
                continue
            name, e = vn.rsplit("_", 1)
            if e not in ("xs", "xe", "ys", "ye"):
                continue
            slabs.setdefault(name, {})[e] = f32(f.variables[vn])
    return BdyData(times=times, slabs=slabs)
