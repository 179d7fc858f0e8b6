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


def pbl_height(theta, z_half, th_sfc_excess=0.5, u=None, v=None,
               rib_crit=0.25):
    """PBL height [ny, nx].

    With winds given: bulk-Richardson method (YSU / Hong et al. 2006):
    h = first level where Rib(z) = g z (thv - thv_s)/(thv_s U^2) exceeds
    ``rib_crit``.  Without winds: the thermal-excess fallback."""
    zc = z_half.reshape(-1, 1, 1)
    if u is not None and v is not None:
        thv_s = theta[0] + th_sfc_excess
        spd2 = jnp.maximum(u * u + v * v, 0.25)
        rib = c.GRAV * zc * (theta - thv_s[None]) / (thv_s[None] * spd2)
        above = rib > rib_crit
    else:
        above = theta > (theta[0] + th_sfc_excess)[None]
    h = jnp.min(jnp.where(above, zc, 1e9), axis=0)
    return jnp.clip(h, z_half[0] * 2.0, 5000.0)


def _phi_m(zeta):
    return jnp.where(zeta < 0.0,
                     (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** -0.25,
                     1.0 + 5.0 * jnp.maximum(zeta, 0.0))


def _phi_h(zeta):
    return jnp.where(zeta < 0.0,
                     (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** -0.5,
                     1.0 + 5.0 * jnp.maximum(zeta, 0.0))


def ysu_exch_h(grid, ustar, rmol, h_pbl, z_full=None, hfx_kin=None,
               theta=None, u=None, v=None):
    """YSU eddy diffusivity for heat/scalars at w levels [nz+1, ny, nx]
    (Hong, Noh & Dudhia 2006; ``phys/module_bl_ysu.F``):

      K_m = kappa w_s z (1 - z/h)^2,  K_h = K_m / Pr

    with the convective velocity scale  w_s = (u*^3 + 7 kappa w*^3 z/h)^{1/3}
    (w*^3 = g/th0 <w'th'>_s h) under unstable conditions and the
    stability-suppressed  w_s = u*/phi_m(z/L) otherwise, and the YSU
    surface-layer Prandtl number  Pr = phi_h/phi_m |_{0.1h} + 0.68 kappa.
    Above the PBL a local Ri-dependent mixing-length K (the YSU
    free-atmosphere branch) takes over when ``theta``/winds are given.
    """
    z = (z_full if z_full is not None else grid.z_full).reshape(-1, 1, 1)
    h = jnp.maximum(h_pbl[None], 1.0)
    frac = jnp.clip(z / h, 0.0, 1.0)
    unstable = rmol[None] < 0.0

    if hfx_kin is not None:
        wstar3 = jnp.maximum(c.GRAV / 300.0 * hfx_kin[None] * h, 0.0)
    else:
        # diagnose w* from u*, L: w*^3 = u*^3 h/(kappa |L|)
        wstar3 = jnp.where(unstable,
                           ustar[None] ** 3 * h * jnp.abs(rmol[None])
                           / c.KARMAN, 0.0)
    ws_unst = (ustar[None] ** 3 + 7.0 * c.KARMAN * wstar3 * frac) ** (1.0 / 3.0)
    zeta = jnp.clip(z * rmol[None], -10.0, 2.0)
    ws_stab = ustar[None] / _phi_m(zeta)
    ws = jnp.where(unstable, ws_unst, ws_stab)

    zeta_sl = jnp.clip(0.1 * h_pbl * rmol, -10.0, 2.0)[None]
    pr = _phi_h(zeta_sl) / _phi_m(zeta_sl) + 0.68 * c.KARMAN
    k_pbl = c.KARMAN * ws * z * (1.0 - frac) ** 2 / jnp.maximum(pr, 0.25)

    k = k_pbl
    if theta is not None and u is not None and v is not None:
        # free-atmosphere local K at interior w faces: l^2 S sqrt(max(1 -
        # Ri/0.25, 0)), l = min(kappa z, 150 m) (YSU's local branch).
        # theta/u/v live at half levels; faces 1..nz-1 between them.
        zh = grid.z_half.reshape(-1, 1, 1)
        dzh = jnp.maximum(zh[1:] - zh[:-1], 1.0)          # [nz-1, 1, 1]
        dthdz = (theta[1:] - theta[:-1]) / dzh
        dudz = (u[1:] - u[:-1]) / dzh
        dvdz = (v[1:] - v[:-1]) / dzh
        s2 = jnp.maximum(dudz ** 2 + dvdz ** 2, 1e-8)
        th_m = 0.5 * (theta[1:] + theta[:-1])
        ri = c.GRAV / jnp.maximum(th_m, 200.0) * dthdz / s2
        lmix = jnp.minimum(c.KARMAN * z[1:-1], 150.0)
        k_loc = lmix ** 2 * jnp.sqrt(s2) * jnp.sqrt(
            jnp.clip(1.0 - ri / 0.25, 0.0, 1.0))          # [nz-1, ny, nx]
        k_free = jnp.concatenate([jnp.zeros_like(k_loc[:1]), k_loc,
                                  jnp.zeros_like(k_loc[:1])], axis=0)
        k = jnp.where(frac >= 1.0, k_free, k_pbl)

    return jnp.clip(jnp.maximum(k, 0.1), 0.0, 2000.0).astype(jnp.float32)
