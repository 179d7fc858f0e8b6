"""Arakawa C-grid geometry and hydrostatic base state.

TPU-native equivalent of the grid/base-state setup the reference spreads over
``WRFV3/frame/module_domain.F`` (coordinate arrays), ``dyn_em/module_initialize_*.F``
(base-state construction) and ``share/module_compute_geop.F``.

Conventions (everywhere in this package):

* Field arrays are ``[nz, ny, nx]`` — z leading so vertical column solves scan
  over the leading axis carrying ``[ny, nx]`` planes (well-tiled for the VPU),
  and so a 2-D device mesh shards the trailing ``(y, x)`` axes.
* C-grid staggering uses the *owner-face* convention: ``u[k, j, i]`` is the
  velocity on the **west** face of mass cell ``(k, j, i)`` (so u has the same
  shape as mass fields and periodic wrap is a plain roll); ``v[k, j, i]`` is on
  the **south** face; ``w[k, j, i]`` on the **bottom** face with an extra top
  level, shape ``[nz + 1, ny, nx]``.  This replaces WRF's ``ips:ipe+1``
  staggered memory dims — static shapes, no ragged staggers.
* Vertical coordinate is the ARW terrain-following dry-mass coordinate
  ``eta = (p_d - p_top) / mu`` with ``eta = 1`` at the surface, ``0`` at the
  model top (reference: ``dyn_em/module_initialize_*.F``, ``solve_em.F``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as c
from .config import Config


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Grid:
    """Static geometry + base state (all entries are constants of a run)."""

    # 1-D vertical coordinate arrays
    eta_full: jax.Array      # [nz+1] full (w) levels, eta_full[0]=1 surface
    eta_half: jax.Array      # [nz]   half (mass) levels
    deta: jax.Array          # [nz]   layer thickness in eta (positive)
    # base state (flat-terrain ideal: 1-D profiles in z)
    mu_base: jax.Array       # []     base dry column mass [Pa]
    p_base: jax.Array        # [nz]   base-state dry pressure at half levels [Pa]
    alpha_base: jax.Array    # [nz]   base-state specific volume [m3 kg-1]
    t_base: jax.Array        # [nz]   base potential temperature perturbation ref
    z_half: jax.Array        # [nz]   base height of mass levels [m]
    z_full: jax.Array        # [nz+1] base height of w levels [m]
    dz: jax.Array            # [nz]   base layer depth [m]
    # terrain-following 3-D base state for the mass-coordinate (ARW) core
    # (module_initialize_* base-state construction; columns differ over
    # terrain).  Always built by make_grid; equals broadcasts of the 1-D
    # profiles when the terrain is flat.
    hgt: jax.Array | None = None    # [ny, nx] terrain height [m]
    mub: jax.Array | None = None    # [ny, nx] base dry column mass [Pa]
    phb: jax.Array | None = None    # [nz+1, ny, nx] base geopotential [m2 s-2]
    pb3: jax.Array | None = None    # [nz, ny, nx] base dry pressure [Pa]
    alb: jax.Array | None = None    # [nz, ny, nx] base specific volume
    msft: jax.Array | None = None   # [ny, nx] map factor at mass points
                                    # (module_llxy projections; 1 for ideal)
    f_cor: jax.Array | None = None  # [ny, nx] Coriolis parameter [s-1]
    # horizontal metrics
    rdx: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    rdy: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    dx: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    dy: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    nx: int = dataclasses.field(metadata=dict(static=True), default=0)
    ny: int = dataclasses.field(metadata=dict(static=True), default=0)
    nz: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def cell_volume(self) -> jax.Array:
        """[nz] base-state grid-cell volume [m3]
        (reference: ``wrf_pmc_driver.F90:2002`` get_grid_cell_volume)."""
        return self.dx * self.dy * self.dz

    def x_centers(self) -> jax.Array:
        return (jnp.arange(self.nx) + 0.5) * self.dx

    def y_centers(self) -> jax.Array:
        return (jnp.arange(self.ny) + 0.5) * self.dy


def make_grid(cfg: Config, hgt=None, f_cor: float = 0.0,
              msft=None) -> Grid:
    """Build grid + isentropic (constant theta = T0) hydrostatic base state.

    The base state satisfies dp/deta = mu, p = p_top + mu*eta, with
    alpha = R_d * theta_m / p0 * (p/p0)^(-cv/cp) and dphi/deta = -mu*alpha
    (ARW tech note eqs; reference builds the same in module_initialize_*.F).

    ``hgt``: optional [ny, nx] terrain height [m].  The 3-D terrain-following
    base state (mub/phb/pb3/alb) is always built for the mass-coordinate
    core; for the isentropic profile the dry surface pressure over terrain is
    analytic: p_s(h) = p0 (1 - g h /(cp T0))^(cp/R).
    """
    d = cfg.domain
    nz = d.nz
    eta_full = np.linspace(1.0, 0.0, nz + 1)
    eta_half = 0.5 * (eta_full[:-1] + eta_full[1:])
    deta = eta_full[:-1] - eta_full[1:]          # positive

    # Isentropic column (theta = T0): T(z) = T0 - g z / cp,
    # p(z) = p0 (T/T0)^(cp/R).  Choose p_top so the model top sits at ztop.
    p_surf = 1.0e5
    t_top = c.T0 - c.GRAV * d.ztop / c.CP
    if t_top <= 0:
        raise ValueError(f"ztop={d.ztop} too deep for isentropic base state")
    p_top = c.P0 * (t_top / c.T0) ** (c.CP / c.R_D)
    mu = p_surf - p_top

    p_half = p_top + mu * eta_half               # [nz]
    alpha_of_p = lambda p: c.R_D * c.T0 / c.P0 * (p / c.P0) ** (-c.CV / c.CP)
    alpha = alpha_of_p(p_half)

    # hydrostatic heights: integrate dphi = -mu * alpha * deta upward
    phi_full = np.zeros(nz + 1)
    for k in range(nz):
        phi_full[k + 1] = phi_full[k] + mu * alpha[k] * deta[k]
    z_full = phi_full / c.GRAV
    z_half = 0.5 * (z_full[:-1] + z_full[1:])
    dz = np.diff(z_full)

    # --- terrain-following 3-D base state (flat when hgt is None) ---
    if hgt is None:
        h2 = np.zeros((d.ny, d.nx))
    else:
        h2 = np.asarray(hgt, dtype=np.float64)
        if h2.shape != (d.ny, d.nx):
            raise ValueError(f"hgt shape {h2.shape} != {(d.ny, d.nx)}")
    t_sfc = c.T0 - c.GRAV * h2 / c.CP
    if np.any(t_sfc <= 0):
        raise ValueError("terrain too high for isentropic base state")
    p_sfc = c.P0 * (t_sfc / c.T0) ** (c.CP / c.R_D)      # [ny, nx]
    mub = p_sfc - p_top
    pb3 = p_top + mub[None] * eta_half[:, None, None]    # [nz, ny, nx]
    alb = alpha_of_p(pb3)
    phb = np.zeros((nz + 1, d.ny, d.nx))
    phb[0] = c.GRAV * h2
    for k in range(nz):
        phb[k + 1] = phb[k] + mub * alb[k] * deta[k]

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return Grid(
        eta_full=f32(eta_full), eta_half=f32(eta_half), deta=f32(deta),
        mu_base=f32(mu), p_base=f32(p_half), alpha_base=f32(alpha),
        t_base=f32(np.full(nz, c.T0)), z_half=f32(z_half), z_full=f32(z_full),
        dz=f32(dz),
        hgt=f32(h2), mub=f32(mub), phb=f32(phb), pb3=f32(pb3), alb=f32(alb),
        msft=f32(np.ones((d.ny, d.nx)) if msft is None
                 else np.asarray(msft)),
        f_cor=f32(np.full((d.ny, d.nx), f_cor)),
        rdx=1.0 / d.dx, rdy=1.0 / d.dy, dx=d.dx, dy=d.dy,
        nx=d.nx, ny=d.ny, nz=nz,
    )
