"""Boundary-layer vertical mixing — minimal K-profile closure.

Stand-in for the reference's YSU/MYJ PBL drivers whose job, for the aerosol
coupling, is to produce the vertical eddy diffusivity ``exch_h`` consumed by
the particle vertical-mixing operator (``wrf_pmc_trans.F90:472``) and the
surface friction velocity ``ustar`` consumed by dry deposition
(``wrf_pmc_dep.F90:31-101``).  A full YSU port is a later milestone; this
K-profile (Troen-Mahrt / YSU neutral limit: K = kappa u* z (1 - z/h)^2) gives
physically-shaped mixing for SCM and LES-class runs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import constants as c
from ...grid import Grid


def k_profile_exch_h(grid: Grid, ustar, pbl_height):
    """exch_h at w levels [nz+1, ny, nx].

    ustar, pbl_height: scalars or [ny, nx].
    """
    z = grid.z_full.reshape(-1, 1, 1)
    us = jnp.asarray(ustar, jnp.float32)
    h = jnp.asarray(pbl_height, jnp.float32)
    frac = jnp.clip(z / jnp.maximum(h, 1.0), 0.0, 1.0)
    k = c.KARMAN * us * z * (1.0 - frac) ** 2
    return jnp.broadcast_to(jnp.maximum(k, 0.0),
                            (grid.nz + 1, grid.ny, grid.nx)).astype(jnp.float32)
