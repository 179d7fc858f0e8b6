"""Coupled-model initialization — population builders.

Equivalent of the idealized branch of ``wrf_pmc_init.F90``
(``init_wrf_partmc_idealized`` :1505-1839: analytic tracer/particle ICs for
the uniform/rotational verification cases) plus the per-cell sampling used by
``init_read_in_ics`` (log-normal modes sampled into each cell's population).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...config import Config
from ...grid import Grid
from ..partmc.aero_data import AeroData, diam_to_vol
from ..partmc.aero_state import (AeroState, add_particles, fill_fresh,
                                 zero_state)
from ..partmc.dist import AeroDist, sample_particles


def populate_from_number_field(aero_data: AeroData, cfg: Config, grid: Grid,
                               number_conc, key, n_per_cell: int | None = None,
                               diam: float = 1e-7, spec: str = "SO4",
                               w_class: int = 0, source: int = 0) -> AeroState:
    """Monodisperse population whose per-cell represented number matches the
    Eulerian field ``number_conc`` [nz, ny, nx] [# m-3] — the idealized-IC
    construction that makes particles and NUM_CONC tracer start identical
    (``wrf_pmc_init.F90:1810-1839``)."""
    if n_per_cell is None:
        n_per_cell = cfg.partmc.num_particles
    cell_shape = (grid.nz, grid.ny, grid.nx)
    st = zero_state(aero_data, cfg.partmc.max_particles, cell_shape)
    V = grid.cell_volume.reshape(-1, 1, 1)
    total = jnp.asarray(number_conc) * V                    # [nz, ny, nx]
    E = n_per_cell
    num = jnp.broadcast_to((total / E)[..., None], (*cell_shape, E)).astype(jnp.float32)
    pvol = diam_to_vol(jnp.float32(diam))
    s_idx = aero_data.spec_by_name(spec)
    vol = jnp.zeros((*cell_shape, aero_data.n_spec, E), jnp.float32)
    vol = vol.at[..., s_idx, :].set(jnp.where(num > 0, pvol, 0.0))
    src = jnp.full((*cell_shape, E), source, jnp.int32)
    wcl = jnp.full((*cell_shape, E), w_class, jnp.int32)
    return add_particles(st, vol, num, src, wcl)


def populate_from_dist(aero_data: AeroData, cfg: Config, grid: Grid,
                       dist: AeroDist, key,
                       n_per_cell: int | None = None) -> AeroState:
    """Sample a (possibly per-level) mode set into every cell
    (``init_read_in_ics`` behavior, ``wrf_pmc_init.F90:972-1080``)."""
    if n_per_cell is None:
        n_per_cell = cfg.partmc.num_particles
    cell_shape = (grid.nz, grid.ny, grid.nx)
    V = jnp.broadcast_to(grid.cell_volume.reshape(-1, 1, 1), cell_shape)
    vol, num, src, wcl = sample_particles(key, dist, aero_data, n_per_cell,
                                          V, cell_shape)
    return fill_fresh(aero_data, cfg.partmc.max_particles, vol, num, src,
                      wcl)


def init_from_files(aero_data: AeroData, n_gas: int, cfg: Config, grid: Grid,
                    key, ics_path: str, emissions_path: str | None = None,
                    bcs_path: str | None = None):
    """File-driven initialization — the real-data branch of
    ``init_wrf_partmc`` (``wrf_pmc_init.F90:284-379``): per-level/per-cell IC
    modes sampled into every cell (``init_read_in_ics`` :972), emission mode
    time series (``init_read_in_emissions`` :583), and lateral-BC background
    reservoir series (``init_read_in_bcs`` :809, stored as scenario
    background+dilution).

    Files follow the whole-domain NetCDF contract of ``tools/make_inputs.py``
    (the TPU-native replacement for the reference's per-column
    ``ics_<i>_<j>.nc`` / ``aero_emit_dist_<i>_<j>_<k>.nc`` file sets).

    Returns ``(aero_state, scenario_fn)`` where ``scenario_fn(t)`` yields the
    :class:`Scenario` for model time t — emission series are carried whole
    (interpolated on-device per step); the BC background is selected by time
    slab on the host, mirroring the reference's BC time-index change trigger
    (``wrf_pmc_trans_aero.F90:824-838``).
    """
    import numpy as np

    from ...tools.make_inputs import read_bcs, read_emissions, read_ics
    from ..partmc.scenario import Scenario

    def _cellify(a, trail: int):
        """Insert (ny, nx) broadcast axes when the array carries a leading
        per-level z axis (``trail`` = # of non-cell trailing axes)."""
        if a.ndim == trail + 1:          # [nz, ...] -> [nz, 1, 1, ...]
            return a.reshape(a.shape[0], 1, 1, *a.shape[1:])
        return a

    def _cellify_dist(d: AeroDist) -> AeroDist:
        return dataclasses.replace(
            d, num_conc=_cellify(d.num_conc, 1),
            geom_mean_diam=_cellify(d.geom_mean_diam, 1),
            log_geom_std=_cellify(d.log_geom_std, 1),
            vol_frac=_cellify(d.vol_frac, 2))

    ic_dist = _cellify_dist(read_ics(ics_path))
    aero = populate_from_dist(aero_data, cfg, grid, ic_dist, key)

    if emissions_path is not None:
        emit_times, emit_dist, gas_rate = read_emissions(emissions_path)
    else:
        vf = jnp.ones((1, aero_data.n_spec), jnp.float32) / aero_data.n_spec
        emit_times = jnp.zeros(1, jnp.float32)
        emit_dist = AeroDist(
            num_conc=jnp.zeros((1, 1), jnp.float32),
            geom_mean_diam=jnp.full((1, 1), 1e-7, jnp.float32),
            log_geom_std=jnp.full((1, 1), 0.5, jnp.float32),
            vol_frac=vf[None], source=jnp.zeros(1, jnp.int32),
            w_class=jnp.zeros(1, jnp.int32))
        gas_rate = jnp.zeros((1, n_gas), jnp.float32)

    if bcs_path is not None:
        bc_times, bc_dist, bc_gas, bc_dil = read_bcs(bcs_path)
        bc_times_np = np.asarray(bc_times)
    else:
        bc_times_np = np.zeros(1)
        bc_dist = jax.tree.map(lambda a: a[:1] * 0.0, emit_dist)
        bc_gas = jnp.zeros((1, n_gas), jnp.float32)
        bc_dil = jnp.zeros(1, jnp.float32)

    def scenario_fn(t: float) -> Scenario:
        i = int(np.clip(np.searchsorted(bc_times_np, t, side="right") - 1,
                        0, len(bc_times_np) - 1))
        bd = _cellify_dist(jax.tree.map(lambda a: a[i], bc_dist))
        return Scenario(
            emit_times=emit_times, emit_dist=emit_dist,
            gas_emit_rate=gas_rate,
            dilution_rate=jnp.asarray(bc_dil)[i],
            back_dist=bd,
            back_gas=_cellify(jnp.asarray(bc_gas)[i], 1))

    return aero, scenario_fn


def init_from_spec(aero_data: AeroData, gas_data, cfg: Config, grid: Grid,
                   key, spec_path: str):
    """PartMC .spec scenario -> initialized population + scenario_fn + gas.

    The spec-file branch of ``init_wrf_partmc`` (the reference reads the
    per-height scenario of ``WRFV3/test/em_scm_xy/test.spec`` through
    ``partmc/src/spec_file.F90``): per-height IC aerosol modes and gas
    profiles are mapped to model levels by height slab, emission time
    series become the :class:`Scenario` (surface-layer coupling: fluxes are
    divided by the lowest layer depth, the reference's 1/dz surface-emission
    coupling in ``wrf_pmc_driver.F90``).

    Returns ``(aero_state, gas0 [nz,ny,nx,G] ppb, scenario_fn)``.
    """
    import numpy as np

    from ... import constants as c
    from ...utils import spec_file as sf
    from ..partmc.dist import AeroDist
    from ..partmc.scenario import Scenario

    s = sf.load_scenario_spec(spec_path)
    z_spec = np.asarray(s["z"])
    z_half = np.asarray(grid.z_half)
    # height-slab index per model level (slab k covers [z_k, z_{k+1}))
    lev = np.clip(np.searchsorted(z_spec, z_half, side="right") - 1, 0,
                  len(z_spec) - 1)

    # --- per-level ICs: stack per-slab dists along a leading z axis ---
    ic_by_slab = [sf.read_aero_dist_dat(p, aero_data) for p in s["aero_init"]]
    n_mode = ic_by_slab[0].n_mode
    if any(d.n_mode != n_mode for d in ic_by_slab):
        raise ValueError("aero_init files must agree on mode count")
    stack = lambda f: jnp.stack([getattr(ic_by_slab[i], f) for i in lev])
    ic_dist = AeroDist(
        num_conc=stack("num_conc").reshape(grid.nz, 1, 1, n_mode),
        geom_mean_diam=stack("geom_mean_diam").reshape(grid.nz, 1, 1, n_mode),
        log_geom_std=stack("log_geom_std").reshape(grid.nz, 1, 1, n_mode),
        vol_frac=stack("vol_frac").reshape(grid.nz, 1, 1, n_mode, -1),
        source=ic_by_slab[0].source, w_class=ic_by_slab[0].w_class)
    aero = populate_from_dist(aero_data, cfg, grid, ic_dist, key)

    # --- per-level gas init [nz, ny, nx, G] ppb ---
    gas_prof = np.stack([sf.read_gas_init_dat(p, gas_data)
                         for p in s["gas_init"]])           # [L, G]
    gas0 = jnp.asarray(np.broadcast_to(
        gas_prof[lev][:, None, None, :],
        (grid.nz, grid.ny, grid.nx, gas_data.n_spec)), jnp.float32)

    # --- emissions (surface slab's series drives the scenario) ---
    dz0 = float(np.asarray(grid.dz)[0])
    rho0 = float(c.P0 / (c.R_D * c.T0))       # surface base density approx
    n_air = rho0 / 0.028964                   # mol air m-3
    zmask_g = np.zeros((grid.nz, 1, 1, 1), np.float32)
    zmask_g[0] = 1.0
    if s["gas_emission"] is not None:
        gt, gr, gemit = sf.read_gas_emit_dat(s["gas_emission"][0], gas_data)
        # mol m-2 s-1 -> ppb s-1, deposited in the surface layer only
        gas_rate = (gemit * gr[:, None] / (dz0 * n_air) * 1e9)[
            :, None, None, None, :] * zmask_g[None]     # [T, nz, 1, 1, G]
        emit_times = gt
    else:
        emit_times = np.zeros(1)
        gas_rate = np.zeros((1, grid.nz, 1, 1, gas_data.n_spec))
    if s["aero_emission"] is not None:
        at, ar, adists = sf.read_aero_emit_dat(s["aero_emission"][0],
                                               aero_data)
        if not np.array_equal(at, emit_times):
            # resample aerosol series onto the gas time grid (slab lookup)
            idx = np.clip(np.searchsorted(at, emit_times, side="right") - 1,
                          0, len(at) - 1)
            adists = [adists[i] for i in idx]
            ar = ar[idx]
        M = adists[0].n_mode
        zmask = np.zeros((grid.nz, 1, 1, 1), np.float32)
        zmask[0, 0, 0, 0] = 1.0
        # dist num_conc is a surface flux [# m-2 s-1]; /dz0 -> [# m-3 s-1]
        nc = jnp.stack([d.num_conc * float(r) / dz0
                        for d, r in zip(adists, ar)])       # [T, M]
        emit_dist = AeroDist(
            num_conc=nc[:, None, None, None, :] * zmask[None],
            geom_mean_diam=jnp.stack([d.geom_mean_diam for d in adists]
                                     )[:, None, None, None, :] + 0 * zmask[None],
            log_geom_std=jnp.stack([d.log_geom_std for d in adists]
                                   )[:, None, None, None, :] + 0 * zmask[None],
            vol_frac=jnp.stack([d.vol_frac for d in adists]
                               )[:, None, None, None, :, :]
            + 0 * zmask[None, ..., None],
            source=adists[0].source, w_class=adists[0].w_class)
    else:
        vf = jnp.ones((1, aero_data.n_spec), jnp.float32) / aero_data.n_spec
        emit_dist = AeroDist(
            num_conc=jnp.zeros((len(emit_times), 1), jnp.float32),
            geom_mean_diam=jnp.full((len(emit_times), 1), 1e-7, jnp.float32),
            log_geom_std=jnp.full((len(emit_times), 1), 0.5, jnp.float32),
            vol_frac=jnp.broadcast_to(vf, (len(emit_times), 1,
                                           aero_data.n_spec)),
            source=jnp.zeros(1, jnp.int32), w_class=jnp.zeros(1, jnp.int32))

    emit_times_j = jnp.asarray(emit_times, jnp.float32)
    gas_rate_j = jnp.asarray(gas_rate, jnp.float32)
    back_dist = jax.tree.map(lambda a: jnp.zeros_like(a[0]), emit_dist)
    back_gas = jnp.zeros(gas_data.n_spec, jnp.float32)

    def scenario_fn(t: float) -> Scenario:
        return Scenario(emit_times=emit_times_j, emit_dist=emit_dist,
                        gas_emit_rate=gas_rate_j,
                        dilution_rate=jnp.zeros((), jnp.float32),
                        back_dist=back_dist, back_gas=back_gas)

    return aero, gas0, scenario_fn
