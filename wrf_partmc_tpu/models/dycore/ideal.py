"""Idealized-case initializers.

Equivalent of ``dyn_em/module_initialize_uniform.F`` / ``_rotational.F`` (the
PartMC-added transport-verification cases, ``test/em_rotational/README``) and
the warm-bubble style thermal used to exercise the acoustic/buoyancy core
(em_quarter_ss analogue).  The idealized aerosol ICs mirror
``init_wrf_partmc_idealized`` (``wrf_pmc_init.F90:1505-1839``): smooth
blob/constant tracer fields whose Eulerian advection doubles as the ground
truth for the stochastic particle transport.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...config import Config
from ...grid import Grid
from .state import DycoreState, replace, zero_dycore_state


def _xy(grid: Grid):
    x = (jnp.arange(grid.nx, dtype=jnp.float32) + 0.5) * grid.dx
    y = (jnp.arange(grid.ny, dtype=jnp.float32) + 0.5) * grid.dy
    return jnp.meshgrid(x, y, indexing="xy")   # each [ny, nx]


def gaussian_blob(grid: Grid, x0_frac=0.5, y0_frac=0.5, radius_frac=0.1,
                  amplitude=1.0):
    """[ny, nx] Gaussian blob (the rotating-cone / uniform-advection IC)."""
    xx, yy = _xy(grid)
    lx, ly = grid.nx * grid.dx, grid.ny * grid.dy
    r2 = ((xx - x0_frac * lx) ** 2 + (yy - y0_frac * ly) ** 2)
    sig = radius_frac * min(lx, ly)
    return amplitude * jnp.exp(-0.5 * r2 / sig ** 2)


def init_uniform(cfg: Config, grid: Grid, u0=10.0, v0=5.0,
                 blob_conc=1.0e9) -> DycoreState:
    """em_uniform: constant horizontal wind, blob of aerosol number conc in
    every class (``module_initialize_uniform.F``; namelist
    ``test/em_uniform/namelist.input``)."""
    s = zero_dycore_state(cfg, grid)
    blob = gaussian_blob(grid, 0.35, 0.35, 0.08, blob_conc)
    num = jnp.broadcast_to(blob, (cfg.n_class, grid.nz, grid.ny, grid.nx))
    return replace(s, u=jnp.full_like(s.u, u0), v=jnp.full_like(s.v, v0),
                   num_conc=num.astype(jnp.float32))


def init_rotational(cfg: Config, grid: Grid, period_s=None,
                    blob_conc=1.0e9) -> DycoreState:
    """em_rotational: solid-body rotation about the domain center; each
    vertical level an independent realization (``module_initialize_rotational.F``,
    README.rotational).  Default period = one revolution per 100 dt."""
    s = zero_dycore_state(cfg, grid)
    if period_s is None:
        period_s = 100.0 * cfg.dynamics.dt
    omega = 2.0 * jnp.pi / period_s
    lx, ly = grid.nx * grid.dx, grid.ny * grid.dy
    xc, yc = 0.5 * lx, 0.5 * ly
    xx, yy = _xy(grid)
    # u depends only on y (same at x-faces as centers); v only on x
    u2 = -omega * (yy - yc)
    v2 = omega * (xx - xc)
    u = jnp.broadcast_to(u2, (grid.nz, grid.ny, grid.nx))
    v = jnp.broadcast_to(v2, (grid.nz, grid.ny, grid.nx))
    blob = gaussian_blob(grid, 0.5, 0.75, 0.06, blob_conc)
    num = jnp.broadcast_to(blob, (cfg.n_class, grid.nz, grid.ny, grid.nx))
    return replace(s, u=u.astype(jnp.float32), v=v.astype(jnp.float32),
                   num_conc=num.astype(jnp.float32))


def init_warm_bubble(cfg: Config, grid: Grid, d_theta=2.0,
                     radius_frac=0.15) -> DycoreState:
    """Warm bubble: +d_theta K thermal near the surface at domain center —
    exercises buoyancy + the implicit acoustic w solve (em_quarter_ss-class
    validation)."""
    s = zero_dycore_state(cfg, grid)
    xx, yy = _xy(grid)
    lx, ly = grid.nx * grid.dx, grid.ny * grid.dy
    sig_h = radius_frac * min(lx, ly)
    zc = 0.25 * grid.z_full[-1]
    sig_z = 0.15 * grid.z_full[-1]
    r2h = ((xx - 0.5 * lx) ** 2 + (yy - 0.5 * ly) ** 2) / sig_h ** 2
    z = grid.z_half.reshape(-1, 1, 1)
    r2 = r2h[None] + ((z - zc) / sig_z) ** 2
    theta_p = d_theta * jnp.exp(-0.5 * r2)
    return replace(s, theta_p=theta_p.astype(jnp.float32))


def init_scm(cfg: Config, grid: Grid, u0=5.0, exch_h0=50.0) -> DycoreState:
    """em_scm_xy analogue: horizontally homogeneous column state; vertical
    mixing supplied by a prescribed exch_h profile (GABLS-II style forcing
    arrives with the physics suite; ``test/em_scm_xy/README.scm``)."""
    s = zero_dycore_state(cfg, grid)
    return replace(s, u=jnp.full_like(s.u, u0))


# ---------------------------------------------------------------------------
# mass-coordinate (ARW, dyn_opt="arw") case initializers
# ---------------------------------------------------------------------------

def arw_rest_state(cfg: Config, grid: Grid) -> DycoreState:
    """State exactly at the (terrain-following) hydrostatic base state:
    mu' = 0, phi' = 0, theta' = 0, at rest.  The well-balancedness reference
    for the mass-coordinate core."""
    s = zero_dycore_state(cfg, grid)
    return replace(s, mu=jnp.zeros((grid.ny, grid.nx), jnp.float32),
                   ph=jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32))


def hill_terrain(cfg: Config, h0=400.0, half_width_frac=0.15,
                 x0_frac=0.5, y0_frac=0.5, ridge=False):
    """[ny, nx] Witch-of-Agnesi hill (or y-invariant ridge) — the terrain of
    the classic mountain-wave / hill test cases (module_initialize_hill2d
    analogue)."""
    import numpy as np

    d = cfg.domain
    x = (np.arange(d.nx) + 0.5) * d.dx
    y = (np.arange(d.ny) + 0.5) * d.dy
    lx, ly = d.nx * d.dx, d.ny * d.dy
    a = half_width_frac * lx
    dx2 = (x[None, :] - x0_frac * lx) ** 2
    if ridge:
        r2 = dx2 + 0.0 * y[:, None]
    else:
        r2 = dx2 + (y[:, None] - y0_frac * ly) ** 2
    return h0 / (1.0 + r2 / a ** 2)


def init_warm_bubble_arw(cfg: Config, grid: Grid, d_theta=2.0,
                         radius_frac=0.12, z_center=1500.0,
                         z_radius=1000.0) -> DycoreState:
    """Warm bubble on the mass-coordinate core (em_quarter_ss-class thermal).
    The initial mu'/phi' are left zero: the theta perturbation enters the EOS
    and the acoustic step adjusts within the first substeps (the reference's
    ideal init rebalances; the transient here is small and absorbed)."""
    s = arw_rest_state(cfg, grid)
    blob = gaussian_blob(grid, 0.5, 0.5, radius_frac, 1.0)
    zc = (0.5 * (grid.phb[1:] + grid.phb[:-1]) / 9.81)        # [nz, ny, nx]
    zfac = jnp.exp(-0.5 * ((zc - z_center) / z_radius) ** 2)
    return replace(s, theta_p=(d_theta * blob[None] * zfac).astype(jnp.float32))


def init_density_current_arw(cfg: Config, grid: Grid, d_theta=-6.0,
                             z_center=3000.0, z_radius=2000.0,
                             radius_frac=0.1) -> DycoreState:
    """Straka-style density current: a cold blob aloft collapses and spreads
    along the ground — the classic nonhydrostatic stability benchmark."""
    return init_warm_bubble_arw(cfg, grid, d_theta=d_theta,
                                radius_frac=radius_frac, z_center=z_center,
                                z_radius=z_radius)
