"""Mellor-Yamada-Janjic surface layer + level-2.5 TKE PBL.

Reference parity: ``phys/module_bl_myjpbl.F`` (Janjic 2001, NCEP Office Note
437; Mellor & Yamada 1982 level 2.5) and ``phys/module_sf_myjsfc.F`` — the
``sf_sfclay_physics=2`` / ``bl_pbl_physics=2`` pair the CARES d01 domain
actually runs (``WRFV3/test/em_real/namelist.input.cares:81,83``).  Produces
``exch_h`` / ``ustar`` / ``rmol`` through the same interfaces the YSU pair
feeds (``surface.py``), so the particle vertical operator
(``wrf_pmc_trans.F90:472``) and dry deposition (``wrf_pmc_dep.F90:31``)
consume either family unchanged.

TPU-native design: the whole scheme is whole-domain [nz(+1), ny, nx] array
arithmetic — the level-2.5 stability functions are a closed-form 2x2 linear
solve per point (no iteration), the prognostic TKE update is
dissipation-implicit (unconditionally stable, no convergence branching), and
TKE vertical transport is one tridiagonal solve per column (``ops/tridiag``).
The master-length-scale integral is a pair of column sums.  State: one
``q2 = 2 TKE`` array at w levels carried in ``CoupledState.pbl_q2``.

Physics summary (Mellor & Yamada 1982 eqs. 34-35 with Janjic's refit
constants; Galperin et al. 1988 stable-limit):

  K_m = l q S_M,  K_h = l q S_H,   q = sqrt(q2)
  S_H [1 - 3 A2 G_H (6 A1 + B2)] = A2 (1 - 6 A1/B1)
  S_M [1 - 9 A1 A2 G_H] = A1 (1 - 3C1 - 6 A1/B1)
                          + S_H G_H (18 A1^2 + 9 A1 A2)
  G_H = -(l/q)^2 N^2          (Galperin et al. 1988 quasi-equilibrium)
  dq2/dt = 2 (K_m S^2 - K_h N^2) - 2 q^3/(B1 l)  + d/dz(K_q dq2/dz)
  l = Blackadar kappa z l0/(kappa z + l0),  l0 = alpha int(q z)/int(q),
  stable limit  l <= 0.53 q/N.

The qualitative MYJ-vs-YSU contract (tested in tests/test_myj.py): local TKE
closure -> shallower, less-diffusive stable boundary layers than YSU's
nonlocal K-profile (the published behavior, e.g. Hu et al. 2010 JAMC).
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import constants as c

# Mellor & Yamada (1982) closure constants (the canonical published set;
# Janjic 2001 uses a slight refit of the same closure)
A1 = 0.92
A2 = 0.74
B1 = 16.6
B2 = 10.1
C1 = 0.08
S_Q = 0.2                  # TKE-transport coefficient K_q = l q S_q (MY82)
Q2_MIN = 0.02              # TKE floor [m2 s-2] (EPSQ2-class)
L0_ALPHA = 0.1             # Blackadar asymptotic-length integral weight
L0_MIN, L0_MAX = 10.0, 500.0
GH_MAX = 0.0233            # realizability cap (MY82 unstable limit)
GALPERIN = 0.53            # stable length-scale limit l N / q <= 0.53


def level25_stability(gm, gh):
    """Quasi-equilibrium level-2.5 stability functions (S_M, S_H) as
    functions of G_H (Galperin et al. 1988 — the realizable closed form;
    neutral values S_M = 0.39, S_H = 0.49, MY82 Table 2).  ``gm`` enters
    only through the realizability clip (the quasi-equilibrium form absorbs
    the shear dependence into the prognostic q2)."""
    del gm
    gh = jnp.clip(gh, -0.28, GH_MAX)
    s_h = A2 * (1.0 - 6.0 * A1 / B1) / (1.0 - 3.0 * A2 * gh * (6.0 * A1 + B2))
    s_m = (A1 * (1.0 - 3.0 * C1 - 6.0 * A1 / B1)
           + s_h * gh * (18.0 * A1 * A1 + 9.0 * A1 * A2)) \
        / (1.0 - 9.0 * A1 * A2 * gh)
    return jnp.clip(s_m, 0.0, 2.0), jnp.clip(s_h, 0.0, 3.0)


def myj_surface_layer(u1, v1, th1, thsfc, z1, z0=0.1, n_iter: int = 5):
    """MYJ-class surface layer (``module_sf_myjsfc.F``): Monin-Obukhov
    similarity with Janjic's Paulson(unstable)/Holtslag-de Bruin(stable)
    stability functions and a viscous-sublayer scalar roughness.

    Returns the same dict contract as ``surface.surface_layer`` (ustar,
    thstar, rmol, hfx_kin, ra) so deposition/env plumbing is shared."""
    spd = jnp.maximum(jnp.sqrt(u1 * u1 + v1 * v1), 0.1)
    dth = th1 - thsfc
    # viscous-sublayer scalar roughness (Janjic 1994 eq. for z0t over land)
    z0t = jnp.maximum(z0 * jnp.exp(-c.KARMAN * 7.3), 1e-5)
    ln_m = jnp.log(z1 / z0)
    ln_h = jnp.log(z1 / z0t)

    def psi_m(zeta):
        zu = jnp.minimum(zeta, 0.0)
        x = (1.0 - 16.0 * zu) ** 0.25
        unstable = (2.0 * jnp.log(0.5 * (1.0 + x))
                    + jnp.log(0.5 * (1.0 + x * x))
                    - 2.0 * jnp.arctan(x) + 0.5 * jnp.pi)
        zs = jnp.maximum(zeta, 0.0)
        # Holtslag & de Bruin (1988); psi(0) = 0 by construction
        stable = -(0.7 * zs + 0.75 * (zs - 14.28) * jnp.exp(-0.35 * zs)
                   + 10.71)
        return jnp.where(zeta < 0.0, unstable, stable)

    def psi_h(zeta):
        zu = jnp.minimum(zeta, 0.0)
        y = jnp.sqrt(1.0 - 16.0 * zu)
        unstable = 2.0 * jnp.log(0.5 * (1.0 + y))
        zs = jnp.maximum(zeta, 0.0)
        # Beljaars & Holtslag (1991); psi(0) = 0 by construction
        stable = -((1.0 + 2.0 * zs / 3.0) ** 1.5
                   + 0.6667 * (zs - 14.28) * jnp.exp(-0.35 * zs)
                   + 9.52 - 1.0)
        return jnp.where(zeta < 0.0, unstable, stable)

    rmol = jnp.zeros_like(spd)
    ustar = c.KARMAN * spd / ln_m
    thstar = jnp.zeros_like(spd)
    for _ in range(n_iter):
        zeta1 = jnp.clip(z1 * rmol, -10.0, 5.0)
        zeta0 = jnp.clip(z0 * rmol, -10.0, 5.0)
        zeta0t = jnp.clip(z0t * rmol, -10.0, 5.0)
        ustar = c.KARMAN * spd / jnp.maximum(
            ln_m - psi_m(zeta1) + psi_m(zeta0), 1.0)
        ustar = jnp.maximum(ustar, 0.01)
        thstar = c.KARMAN * dth / jnp.maximum(
            ln_h - psi_h(zeta1) + psi_h(zeta0t), 1.0)
        th_mean = 0.5 * (th1 + thsfc)
        l_inv = c.KARMAN * c.GRAV * thstar / (ustar * ustar
                                              * jnp.maximum(th_mean, 200.0))
        rmol = jnp.clip(l_inv, -0.5, 0.5)

    zeta1 = jnp.clip(z1 * rmol, -10.0, 5.0)
    zeta0t = jnp.clip(z0t * rmol, -10.0, 5.0)
    ra = (ln_h - psi_h(zeta1) + psi_h(zeta0t)) / (c.KARMAN * ustar)
    return dict(ustar=ustar, thstar=thstar, rmol=rmol,
                hfx_kin=-ustar * thstar, ra=jnp.maximum(ra, 1.0))


def _face_gradients(theta, u, v, z_half):
    """Shear^2 and Brunt-Vaisala N^2 at interior w faces [nz-1, ny, nx]."""
    zh = z_half.reshape(-1, 1, 1)
    dzh = jnp.maximum(zh[1:] - zh[:-1], 1.0)
    dthdz = (theta[1:] - theta[:-1]) / dzh
    dudz = (u[1:] - u[:-1]) / dzh
    dvdz = (v[1:] - v[:-1]) / dzh
    s2 = jnp.maximum(dudz * dudz + dvdz * dvdz, 1e-9)
    th_m = jnp.maximum(0.5 * (theta[1:] + theta[:-1]), 200.0)
    n2 = c.GRAV / th_m * dthdz
    return s2, n2


def myj_tke_step(q2, theta, u, v, grid, ustar, dt, z_full=None, z_half=None):
    """One prognostic level-2.5 TKE step + exchange-coefficient diagnosis.

    q2: [nz+1, ny, nx] twice-TKE at w levels (faces); theta/u/v at half
    levels [nz, ny, nx]; ustar [ny, nx].  Returns (q2_new, exch_h, exch_m)
    with exch_* at w levels [nz+1, ny, nx] (face 0 and nz are boundary
    faces, K there is not used by the column operators).
    """
    from ...ops.tridiag import solve as tridiag_solve

    zf = (z_full if z_full is not None else grid.z_full).reshape(-1, 1, 1)
    zh = (z_half if z_half is not None else grid.z_half)
    s2, n2 = _face_gradients(theta, u, v, zh)       # [nz-1, ny, nx]

    q2i = jnp.maximum(q2[1:-1], Q2_MIN)             # interior faces
    q = jnp.sqrt(q2i)

    # Blackadar master length with the q-weighted asymptotic scale
    z_face = zf[1:-1]
    dz_c = (zh.reshape(-1, 1, 1)[1:] - zh.reshape(-1, 1, 1)[:-1])
    num = jnp.sum(q * z_face * dz_c, axis=0)
    den = jnp.maximum(jnp.sum(q * dz_c, axis=0), 1e-6)
    l0 = jnp.clip(L0_ALPHA * num / den, L0_MIN, L0_MAX)
    l_b = c.KARMAN * z_face * l0 / (c.KARMAN * z_face + l0)
    # Galperin stable limit
    n_pos = jnp.sqrt(jnp.maximum(n2, 1e-10))
    l_lim = GALPERIN * q / n_pos
    l = jnp.where(n2 > 0.0, jnp.minimum(l_b, l_lim), l_b)
    l = jnp.maximum(l, 1.0)

    gm = (l / q) ** 2 * s2
    gh = -((l / q) ** 2) * n2
    s_m, s_h = level25_stability(gm, gh)
    k_m = l * q * s_m
    k_h = l * q * s_h
    k_q = jnp.maximum(l * q * S_Q, 0.1)

    # dissipation-implicit TKE source update
    prod = 2.0 * (k_m * s2 - k_h * n2)
    q2_src = (q2i + dt * jnp.maximum(prod, -q2i / jnp.maximum(dt, 1e-6))) \
        / (1.0 + 2.0 * dt * q / (B1 * l))
    q2_src = jnp.clip(q2_src, Q2_MIN, 200.0)

    # implicit vertical transport of q2 between interior faces; K_q
    # interpolated to the between-face midpoints.  Face i (= w level i+1)
    # has control volume dz_c[i] (the half-level spacing containing it);
    # the surface face is a Dirichlet source at the level-2 similarity
    # value q2_sfc = B1^(2/3) u*^2, the top face is zero-flux.
    nz = theta.shape[0]
    q2_sfc = B1 ** (2.0 / 3.0) * jnp.maximum(ustar, 0.01) ** 2
    if nz > 2:
        k_mid = 0.5 * (k_q[1:] + k_q[:-1])          # [nz-2, ny, nx]
        dz_f = jnp.maximum(zf[2:-1] - zf[1:-2], 1.0)
        flux_coef = k_mid / dz_f                    # between faces i, i+1
        dz_cell = jnp.maximum(dz_c, 1.0)
        lo = jnp.pad(flux_coef, ((1, 0), (0, 0), (0, 0)))
        hi = jnp.pad(flux_coef, ((0, 1), (0, 0), (0, 0)))
        lo_sfc = k_q[0] / jnp.maximum(zf[1] - zf[0], 1.0)   # [ny, nx]
        lo = lo.at[0].set(lo_sfc)
        alpha = dt / dz_cell
        a = -alpha * lo
        b_d = 1.0 + alpha * (lo + hi)
        c_d = -alpha * hi
        d = q2_src.at[0].add(alpha[0] * lo_sfc * q2_sfc)
        a = a.at[0].set(0.0)
        q2_new_i = tridiag_solve(a, b_d, c_d, d)
    else:
        q2_new_i = q2_src

    q2_new = jnp.concatenate([
        q2_sfc[None], jnp.clip(q2_new_i, Q2_MIN, 200.0),
        jnp.full_like(q2[-1:], Q2_MIN)], axis=0)

    # exchange coefficients at w levels; face 0 from surface-layer scaling
    k_h_full = jnp.concatenate([k_h[:1], k_h, jnp.zeros_like(k_h[:1])],
                               axis=0)
    k_m_full = jnp.concatenate([k_m[:1], k_m, jnp.zeros_like(k_m[:1])],
                               axis=0)
    k_h_full = jnp.clip(jnp.maximum(k_h_full, 0.1), 0.0, 2000.0)
    k_m_full = jnp.clip(jnp.maximum(k_m_full, 0.1), 0.0, 2000.0)
    return (q2_new.astype(jnp.float32), k_h_full.astype(jnp.float32),
            k_m_full.astype(jnp.float32))


def tke_pbl_height(q2, grid, z_full=None, factor: float = 2.0):
    """Diagnostic PBL height: highest contiguous-from-surface w level where
    q2 exceeds ``factor x Q2_MIN`` (the MYJ TKE-based PBLH definition)."""
    zf = (z_full if z_full is not None else grid.z_full).reshape(-1, 1, 1)
    active = q2 > factor * Q2_MIN
    # mask must be contiguous from the surface: cumulative AND
    contig = jnp.cumprod(active.astype(jnp.int32), axis=0).astype(bool)
    h = jnp.max(jnp.where(contig, zf, 0.0), axis=0)
    return jnp.maximum(h, zf[1, 0, 0])


def init_q2(grid, ny=None, nx=None):
    """Near-neutral initial q2 field [nz+1, ny, nx]."""
    ny = ny or grid.ny
    nx = nx or grid.nx
    return jnp.full((grid.nz + 1, ny, nx), Q2_MIN, jnp.float32)
