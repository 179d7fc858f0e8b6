"""Surface layer (Monin-Obukhov similarity) + YSU-class PBL diagnosis.

Reference parity: ``phys/module_sf_sfclay.F`` (revised MM5 surface layer)
called from ``surface_driver`` (``module_first_rk_step_part1.F:431``) —
produces ``ustar``, ``rmol`` (1/L), ``znt`` consumed by the PartMC dry
deposition (``wrf_pmc_dep.F90:31-101``) — and the YSU PBL
(``phys/module_bl_ysu.F``, ``:840``) whose eddy diffusivity ``exch_h``
drives the particle vertical mixing (``wrf_pmc_trans.F90:472``).

TPU-native design: whole-domain [ny, nx] surface fields; the implicit
Obukhov-length closure is a short fixed-iteration loop (static shapes, no
convergence branches); Businger-Dyer stability functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import constants as c


def psi_m(zeta):
    """Businger-Dyer momentum stability function psi_m(z/L)."""
    zeta = jnp.clip(zeta, -10.0, 10.0)
    x = (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** 0.25
    unstable = (2.0 * jnp.log(0.5 * (1.0 + x))
                + jnp.log(0.5 * (1.0 + x * x))
                - 2.0 * jnp.arctan(x) + 0.5 * jnp.pi)
    stable = -5.0 * jnp.maximum(zeta, 0.0)
    return jnp.where(zeta < 0.0, unstable, stable)


def psi_h(zeta):
    """Businger-Dyer heat stability function psi_h(z/L)."""
    zeta = jnp.clip(zeta, -10.0, 10.0)
    y = jnp.sqrt(1.0 - 16.0 * jnp.minimum(zeta, 0.0))
    unstable = 2.0 * jnp.log(0.5 * (1.0 + y))
    stable = -5.0 * jnp.maximum(zeta, 0.0)
    return jnp.where(zeta < 0.0, unstable, stable)


def surface_layer(u1, v1, th1, thsfc, z1, z0=0.1, z0t=None, n_iter: int = 5):
    """Monin-Obukhov surface-layer solve (sfclay equivalent).

    u1/v1/th1: lowest-mass-level wind and potential temperature [ny, nx];
    thsfc: surface (skin) potential temperature; z1: height of the first
    level [m].  Returns dict(ustar, thstar, rmol, hfx_kin, ra) with
    ``rmol`` = 1/L and ``ra`` the heat/scalar aerodynamic resistance used by
    deposition (``wrf_pmc_dep.F90:188``).
    """
    if z0t is None:
        z0t = z0 * 0.1
    spd = jnp.maximum(jnp.sqrt(u1 * u1 + v1 * v1), 0.1)
    dth = th1 - thsfc
    ln_m = jnp.log(z1 / z0)
    ln_h = jnp.log(z1 / z0t)

    rmol = jnp.zeros_like(spd)                    # 1/L, start neutral
    ustar = c.KARMAN * spd / ln_m
    thstar = jnp.zeros_like(spd)
    for _ in range(n_iter):
        zeta1 = jnp.clip(z1 * rmol, -10.0, 2.0)
        zeta0 = jnp.clip(z0 * rmol, -10.0, 2.0)
        zeta0t = jnp.clip(z0t * rmol, -10.0, 2.0)
        ustar = c.KARMAN * spd / jnp.maximum(
            ln_m - psi_m(zeta1) + psi_m(zeta0), 1.0)
        ustar = jnp.maximum(ustar, 0.01)
        thstar = c.KARMAN * dth / jnp.maximum(
            ln_h - psi_h(zeta1) + psi_h(zeta0t), 1.0)
        th_mean = 0.5 * (th1 + thsfc)
        L_inv = c.KARMAN * c.GRAV * thstar / (ustar * ustar
                                              * jnp.maximum(th_mean, 200.0))
        rmol = jnp.clip(L_inv, -0.5, 0.5)

    zeta1 = jnp.clip(z1 * rmol, -10.0, 2.0)
    zeta0t = jnp.clip(z0t * rmol, -10.0, 2.0)
    ra = (ln_h - psi_h(zeta1) + psi_h(zeta0t)) / (c.KARMAN * ustar)
    return dict(ustar=ustar, thstar=thstar, rmol=rmol,
                hfx_kin=-ustar * thstar, ra=jnp.maximum(ra, 1.0))


def pbl_height(theta, z_half, th_sfc_excess=0.5):
    """Bulk PBL height [ny, nx]: first level where theta exceeds the
    near-surface value + excess (YSU's thermal method, simplified)."""
    th0 = theta[0] + th_sfc_excess
    above = theta > th0[None]                     # [nz, ny, nx]
    zc = z_half.reshape(-1, 1, 1)
    h = jnp.min(jnp.where(above, zc, 1e9), axis=0)
    return jnp.clip(h, z_half[0] * 2.0, 5000.0)


def ysu_exch_h(grid, ustar, rmol, h_pbl, z_full=None):
    """YSU-class eddy diffusivity at w levels [nz+1, ny, nx]:
    K_h = kappa (u*/phi_h) z (1 - z/h)^2 with a free-atmosphere floor."""
    z = (z_full if z_full is not None else grid.z_full).reshape(-1, 1, 1)
    zeta = jnp.clip(z * rmol[None], -10.0, 2.0)
    phi_h = jnp.where(zeta < 0.0,
                      (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** -0.5,
                      1.0 + 5.0 * jnp.maximum(zeta, 0.0))
    frac = jnp.clip(z / jnp.maximum(h_pbl[None], 1.0), 0.0, 1.0)
    k = c.KARMAN * (ustar[None] / phi_h) * z * (1.0 - frac) ** 2
    return jnp.maximum(k, 0.1).astype(jnp.float32)
