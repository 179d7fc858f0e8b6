"""Lateral boundary conditions for the coupled model.

Equivalent of the reference's open-boundary machinery for PartMC runs:

* Gas tracers: flow-dependent lateral BCs (``flow_dep_bdy_chem``,
  ``solve_em.F:2668``) — inflow edge cells take the background value,
  outflow is zero-gradient (the clamp stencil already provides that).
  NUM_CONC tracers are deliberately excluded, as in the reference
  (``ic < p_NUM_CONC_a01`` guard, ``solve_em.F:2667``) — they are re-derived
  from the particle field each step.
* Particles: edge cells with face-normal inflow are resampled from the
  scenario background distribution; particles transported off the open
  domain are removed (``wrf_pmc_trans_aero.F90:811-955``: background
  resampling, outflow discard, population refresh on wind reversal —
  here refreshed every step, a strict superset of the reference's
  reversal/time-index triggers).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...config import Config
from ...grid import Grid
from ..dycore.state import DycoreState
from ..partmc.aero_data import AeroData
from ..partmc.aero_state import AeroState
from ..partmc.dist import dist_number_conc, sample_particles
from ..partmc.scenario import Scenario


def edge_inflow_masks(dyn: DycoreState, grid: Grid, cfg: Config):
    """[nz, ny, nx] bool: edge cells whose face-normal wind blows INTO the
    domain (u at west faces / owner convention, grid.py)."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    ii = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 2)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 1)
    m = jnp.zeros((nz, ny, nx), bool)
    b = cfg.boundary
    if not b.periodic_x:
        m = m | ((ii == 0) & (dyn.u > 0.0))                   # west edge, wind +x
        m = m | ((ii == nx - 1) & (jnp.roll(dyn.u, -1, -1) < 0.0))  # east edge
    if not b.periodic_y:
        m = m | ((jj == 0) & (dyn.v > 0.0))
        m = m | ((jj == ny - 1) & (jnp.roll(dyn.v, -1, -2) < 0.0))
    return m


def apply_gas_open_bc(gas, dyn: DycoreState, scn: Scenario, grid: Grid,
                      cfg: Config):
    """gas: [nz, ny, nx, G] ppb; inflow edge cells -> background values."""
    if cfg.boundary.periodic_x and cfg.boundary.periodic_y:
        return gas
    inflow = edge_inflow_masks(dyn, grid, cfg)
    return jnp.where(inflow[..., None], scn.back_gas, gas)


def resample_inflow_particles(aero: AeroState, dyn: DycoreState,
                              scn: Scenario, aero_data: AeroData, grid: Grid,
                              cfg: Config, key) -> AeroState:
    """Replace populations of inflow edge cells with a fresh background
    sample (aero_state_resample path)."""
    if cfg.boundary.periodic_x and cfg.boundary.periodic_y:
        return aero
    cell_shape = aero.cell_shape
    inflow = edge_inflow_masks(dyn, grid, cfg)                # [nz, ny, nx]
    V = jnp.broadcast_to(grid.cell_volume.reshape(-1, 1, 1), cell_shape)
    n_bc = cfg.partmc.num_particles
    vol, num, src, wcl = sample_particles(key, scn.back_dist, aero_data,
                                          n_bc, V, cell_shape)
    P = aero.capacity
    pad = lambda a, fill: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, P - n_bc)],
                                  constant_values=fill)
    m = inflow[..., None]
    new = dataclasses.replace(
        aero,
        vol=jnp.where(m[..., None, :], jnp.pad(
            vol, [(0, 0)] * 3 + [(0, 0), (0, P - n_bc)]), aero.vol),
        num=jnp.where(m, pad(num, 0.0), aero.num),
        source=jnp.where(m, pad(src, 0), aero.source),
        w_class=jnp.where(m, pad(wcl, 0), aero.w_class),
        pid=jnp.where(m, pad(
            aero.next_id[..., None] + jnp.arange(n_bc, dtype=jnp.int32), 0),
            aero.pid),
        t_create=jnp.where(m, 0.0, aero.t_create),
        next_id=aero.next_id + jnp.where(inflow, n_bc, 0),
    )
    return new
