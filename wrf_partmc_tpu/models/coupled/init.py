"""Coupled-model initialization — population builders.

Equivalent of the idealized branch of ``wrf_pmc_init.F90``
(``init_wrf_partmc_idealized`` :1505-1839: analytic tracer/particle ICs for
the uniform/rotational verification cases) plus the per-cell sampling used by
``init_read_in_ics`` (log-normal modes sampled into each cell's population).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import Config
from ...grid import Grid
from ..partmc.aero_data import AeroData, diam_to_vol
from ..partmc.aero_state import AeroState, add_particles, zero_state
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
    st = zero_state(aero_data, cfg.partmc.max_particles, cell_shape)
    V = jnp.broadcast_to(grid.cell_volume.reshape(-1, 1, 1), cell_shape)
    vol, num, src, wcl = sample_particles(key, dist, aero_data, n_per_cell,
                                          V, cell_shape)
    return add_particles(st, vol, num, src, wcl)
