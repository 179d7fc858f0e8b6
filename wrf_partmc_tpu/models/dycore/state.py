"""Dycore prognostic state.

The typed-pytree replacement for WRF's Registry-generated ``domain`` derived
type (``frame/module_domain.F``): every prognostic/diagnostic field is an
explicit member; tracer families carry a leading class axis instead of 40
duplicated ``*_a0NN`` fields (``registry.partmc_trans``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ... import constants as c
from ...config import Config
from ...grid import Grid


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DycoreState:
    """Prognostic fields on the C-grid (owner-face staggering, see grid.py).

    Perturbation thermodynamic variables are relative to the isentropic
    hydrostatic base state carried by :class:`Grid`.
    """

    u: jax.Array          # [nz, ny, nx] x-wind at west faces [m s-1]
    v: jax.Array          # [nz, ny, nx] y-wind at south faces
    w: jax.Array          # [nz+1, ny, nx] z-wind at full (w) levels
    theta_p: jax.Array    # [nz, ny, nx] potential-temp perturbation [K]
    p_p: jax.Array        # [nz, ny, nx] pressure perturbation [Pa]
    moist: jax.Array      # [n_moist, nz, ny, nx] mixing ratios [kg kg-1]
    chem: jax.Array       # [n_gas, nz, ny, nx] gas mix ratios [ppm-equiv]
    num_conc: jax.Array   # [n_class, nz, ny, nx] aerosol number conc tracers
                          # [# kg-1-air-equivalent] (the NUM_CONC_a## family)
    tke: jax.Array        # [nz, ny, nx] subgrid turbulent kinetic energy
                          # [m2 s-2] (prognostic when km_opt=2, the 1.5-order
                          # closure of module_diffusion_em)
    # mass-coordinate (ARW) core prognostics (dyn_opt="arw"; None under the
    # linearized core).  theta_p is then the perturbation from grid.t_base
    # and p_p the EOS-diagnosed pressure perturbation.
    mu: jax.Array | None = None   # [ny, nx] dry column-mass perturbation [Pa]
                                  # (advance_mu_t prognostic, solve_em.F:1441)
    ph: jax.Array | None = None   # [nz+1, ny, nx] geopotential perturbation
                                  # [m2 s-2] (the phi prognostic)

    @property
    def nz(self) -> int:
        return self.u.shape[-3]


def zero_dycore_state(cfg: Config, grid: Grid) -> DycoreState:
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    z = lambda *s: jnp.zeros(s, jnp.float32)
    arw = cfg.dynamics.dyn_opt == "arw"
    return DycoreState(
        u=z(nz, ny, nx), v=z(nz, ny, nx), w=z(nz + 1, ny, nx),
        theta_p=z(nz, ny, nx), p_p=z(nz, ny, nx),
        moist=z(cfg.n_moist, nz, ny, nx),
        chem=z(cfg.n_chem_gas, nz, ny, nx),
        num_conc=z(cfg.n_class, nz, ny, nx),
        tke=jnp.full((nz, ny, nx), cfg.dynamics.tke_seed, jnp.float32),
        mu=z(ny, nx) if arw else None,
        ph=z(nz + 1, ny, nx) if arw else None,
    )


def base_profiles(grid: Grid):
    """Base-state column profiles used by the solver: rho_b, theta_b, cs2."""
    rho_b = 1.0 / grid.alpha_base                     # [nz]
    theta_b = grid.t_base                             # [nz] (= T0)
    cs2 = c.GAMMA * grid.p_base * grid.alpha_base     # [nz] sound speed^2
    return rho_b, theta_b, cs2


def total_pressure(state: DycoreState, grid: Grid):
    return grid.p_base.reshape(-1, 1, 1) + state.p_p


def temperature(state: DycoreState, grid: Grid):
    th = grid.t_base.reshape(-1, 1, 1) + state.theta_p
    p = total_pressure(state, grid)
    return th * (p / c.P0) ** c.KAPPA


def air_density(state: DycoreState, grid: Grid):
    p = total_pressure(state, grid)
    t = temperature(state, grid)
    return p / (c.R_D * t)


def replace(state: DycoreState, **kw) -> DycoreState:
    return dataclasses.replace(state, **kw)
