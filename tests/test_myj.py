"""MYJ surface layer + level-2.5 TKE PBL (bl_physics=2, the CARES d01 pair;
module_sf_myjsfc.F + module_bl_myjpbl.F equivalents)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.config import (Config, DomainConfig, PartmcConfig,
                                   uniform_test_config, validate_config)
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.physics import myj


def test_level25_stability_neutral_and_limits():
    """Neutral values of the level-2.5 stability functions with the Janjic
    constants: S_M ~ 0.39, S_H ~ 0.49 (Mellor & Yamada 1982 Table 2 class),
    S_H > S_M (turbulent Pr < 1); stable stratification reduces both."""
    s_m0, s_h0 = myj.level25_stability(jnp.zeros(()), jnp.zeros(()))
    assert 0.25 < float(s_m0) < 0.6, float(s_m0)
    assert 0.35 < float(s_h0) < 0.8, float(s_h0)
    assert float(s_h0) > float(s_m0)

    s_m_st, s_h_st = myj.level25_stability(jnp.asarray(0.5),
                                           jnp.asarray(-0.15))
    assert float(s_m_st) < float(s_m0)
    assert float(s_h_st) < float(s_h0)
    # unstable enhancement
    s_m_un, s_h_un = myj.level25_stability(jnp.asarray(0.1),
                                           jnp.asarray(0.02))
    assert float(s_h_un) > float(s_h0)


def test_myj_surface_layer_contract():
    """Same contract as the YSU-pair surface layer: stable (th1 > thsfc)
    gives rmol > 0 and downward heat flux; stronger wind -> larger ustar."""
    shp = (4, 4)
    u1 = jnp.full(shp, 5.0)
    v1 = jnp.zeros(shp)
    th1 = jnp.full(shp, 266.0)
    thsfc = jnp.full(shp, 265.0)
    sfc = myj.myj_surface_layer(u1, v1, th1, thsfc, 12.5, z0=0.1)
    assert float(sfc["rmol"].mean()) > 0.0
    assert float(sfc["hfx_kin"].mean()) < 0.0
    assert float(sfc["ustar"].mean()) > 0.05
    sfc2 = myj.myj_surface_layer(2.0 * u1, v1, th1, thsfc, 12.5, z0=0.1)
    assert float(sfc2["ustar"].mean()) > float(sfc["ustar"].mean())
    # unstable branch
    sfc3 = myj.myj_surface_layer(u1, v1, thsfc, th1, 12.5, z0=0.1)
    assert float(sfc3["rmol"].mean()) < 0.0


def _gabls_column(n_steps=120, dt=60.0, nz=16, ztop=400.0):
    """GABLS1-class stable boundary layer: ug = 8 m/s, surface cooling
    0.25 K/h, initial theta 265 K below 100 m then +0.01 K/m (Cuxart et al.
    2006).  Integrates theta/u/v with the MYJ K and prognostic TKE."""
    from wrf_partmc_tpu.ops.vdiff import diffuse_column, vdiff_coeffs

    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=2, ny=2, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=ztop))
    grid = make_grid(cfg)
    zc = grid.z_half.reshape(-1, 1, 1)
    ny, nx = 2, 2
    theta = jnp.broadcast_to(
        jnp.where(zc < 100.0, 265.0, 265.0 + 0.01 * (zc - 100.0)),
        (nz, ny, nx))
    ug, f_cor = 8.0, 1.39e-4
    u = jnp.full((nz, ny, nx), ug)
    v = jnp.zeros((nz, ny, nx))
    q2 = myj.init_q2(grid, ny, nx)
    rho_b = jnp.ones((nz,))
    dz0 = float(grid.dz[0])

    def step(carry, i):
        theta, u, v, q2 = carry
        thsfc = 265.0 - 0.25 / 3600.0 * (i.astype(jnp.float32) * dt)
        sfc = myj.myj_surface_layer(u[0], v[0], theta[0], thsfc,
                                    grid.z_half[0], z0=0.1)
        q2, k_h, k_m = myj.myj_tke_step(q2, theta, u, v, grid, sfc["ustar"],
                                        dt)
        # surface fluxes into the lowest layer
        spd = jnp.maximum(jnp.sqrt(u[0] ** 2 + v[0] ** 2), 0.1)
        theta = theta.at[0].add(dt * sfc["hfx_kin"] / dz0)
        u = u.at[0].add(-dt * sfc["ustar"] ** 2 * u[0] / spd / dz0)
        v = v.at[0].add(-dt * sfc["ustar"] ** 2 * v[0] / spd / dz0)
        # Coriolis + geostrophic forcing
        u = u + dt * f_cor * v
        v = v + dt * f_cor * (ug - u)
        # implicit vertical mixing by the scheme's own K
        dl, d, du = vdiff_coeffs(k_h, grid, rho_b, dt)
        theta = diffuse_column(theta, dl, d, du)
        dlm, dm, dum = vdiff_coeffs(k_m, grid, rho_b, dt)
        u = diffuse_column(u, dlm, dm, dum)
        v = diffuse_column(v, dlm, dm, dum)
        return (theta, u, v, q2), None

    (theta, u, v, q2), _ = jax.lax.scan(
        step, (theta, u, v, q2), jnp.arange(n_steps))
    return grid, theta, u, v, q2


@pytest.mark.slow
def test_gabls_stable_column_myj_vs_ysu():
    """GABLS1-class run: TKE stays surface-confined (stable PBL of a few
    hundred meters), fields stay finite, and the MYJ diffusivity is smaller
    / shallower than YSU's nonlocal K-profile for the same state — the
    published qualitative MYJ-vs-YSU stable-PBL behavior (e.g. Hu et al.
    2010 JAMC: MYJ shallower, cooler stable PBL)."""
    from wrf_partmc_tpu.models.physics.surface import (pbl_height,
                                                       surface_layer,
                                                       ysu_exch_h)

    grid, theta, u, v, q2 = _gabls_column()
    assert np.isfinite(np.asarray(theta)).all()
    assert np.isfinite(np.asarray(q2)).all()

    # TKE-based PBL height: a stable BL of O(100 m), well under the domain
    h_myj = myj.tke_pbl_height(q2, grid)
    assert 25.0 <= float(h_myj.mean()) <= 350.0, float(h_myj.mean())
    # TKE decays with height: top-half column has (near-)floor TKE
    q2_np = np.asarray(q2)
    assert q2_np[q2_np.shape[0] // 2:].max() <= 2.5 * myj.Q2_MIN

    # same final state through the YSU pair
    sfc = surface_layer(u[0], v[0], theta[0],
                        theta[0] - 0.5, grid.z_half[0], z0=0.1)
    h_ysu = pbl_height(theta, grid.z_half, u=u, v=v)
    k_ysu = ysu_exch_h(grid, sfc["ustar"], sfc["rmol"], h_ysu,
                       hfx_kin=sfc["hfx_kin"], theta=theta, u=u, v=v)
    sfc_m = myj.myj_surface_layer(u[0], v[0], theta[0], theta[0] - 0.5,
                                  grid.z_half[0], z0=0.1)
    _, k_myj, _ = myj.myj_tke_step(q2, theta, u, v, grid, sfc_m["ustar"],
                                   60.0)
    # the MYJ stable PBL is shallower than YSU's bulk-Richardson depth
    assert float(h_myj.mean()) < float(h_ysu.mean())
    # and its mixing is confined: K above 150 m is (near-)background for
    # MYJ while YSU's K-profile still mixes there
    zf = np.asarray(grid.z_full)
    aloft = zf > 150.0
    assert float(np.asarray(k_myj)[aloft].mean()) < \
        float(np.asarray(k_ysu)[aloft].mean())


@pytest.mark.slow
def test_cares_pbl_options_validate_and_run_coupled():
    """The CARES d01 surface/PBL options (sf_sfclay_physics=2,
    bl_pbl_physics=2, namelist.input.cares:81,83) validate and run through
    coupled_step with finite fields and an evolving TKE state."""
    from wrf_partmc_tpu.models.coupled.driver import init_coupled, run_coupled
    from wrf_partmc_tpu.models.coupled.init import populate_from_number_field
    from wrf_partmc_tpu.models.dycore.state import zero_dycore_state
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.dist import make_mode
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
    from wrf_partmc_tpu.models.partmc.scenario import constant_scenario

    AD, GD = make_aero_data(), make_gas_data()
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=6, nz=8, dx=2000.0, dy=2000.0,
                            ztop=1600.0),
        partmc=PartmcConfig(num_particles=32, max_particles=96,
                            do_coagulation=False, do_emission=False,
                            do_deposition=True, do_transport=True),
    )
    cfg = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, constant_velocity=False, n_sound=2, bl_physics=2))
    validate_config(cfg)
    grid = make_grid(cfg)
    dyn = zero_dycore_state(cfg, grid)
    # a mean wind so the surface layer produces a real ustar
    dyn = dataclasses.replace(dyn, u=jnp.full_like(dyn.u, 5.0))
    conc = jnp.zeros((grid.nz, grid.ny, grid.nx)).at[0].set(1e9)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(3))
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    cs = dataclasses.replace(cs, aero=aero)
    assert cs.pbl_q2 is not None
    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, scn, exch,
                                        10))(cs)
    assert np.isfinite(np.asarray(out.dyn.theta_p)).all()
    assert np.isfinite(np.asarray(out.pbl_q2)).all()
    assert float(out.pbl_q2.max()) >= myj.Q2_MIN
    # the daytime-heated surface drives TKE above the floor near the ground
    assert float(out.pbl_q2[0].mean()) > myj.Q2_MIN
    assert float(out.aero.total_num().sum()) > 0.0
