"""Radiation driver tests (models/physics/radiation.py): Dudhia-class SW +
gray LW with the PartMC aerosol direct effect (reference:
``phys/module_radiation_driver.F`` + the do_optical coupling,
``wrf_pmc_driver.F90:2025-2097``)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.models.physics.radiation import (longwave,
                                                     radiation_driver,
                                                     shortwave)

NZ, NY, NX = 8, 4, 4
DZ = jnp.full((NZ,), 500.0, jnp.float32)


def _atmos(qv0=8e-3, t0=290.0):
    k = jnp.arange(NZ).reshape(-1, 1, 1).astype(jnp.float32)
    rho = jnp.broadcast_to(1.2 * jnp.exp(-k * 500.0 / 8000.0),
                           (NZ, NY, NX)).astype(jnp.float32)
    qv = jnp.broadcast_to(qv0 * jnp.exp(-k * 500.0 / 2500.0),
                          (NZ, NY, NX)).astype(jnp.float32)
    temp = jnp.broadcast_to(t0 - 6.5e-3 * (k * 500.0 + 250.0),
                            (NZ, NY, NX)).astype(jnp.float32)
    return temp, qv, rho


def test_sw_daytime_heats_and_reaches_surface():
    temp, qv, rho = _atmos()
    hr, sw_dn = shortwave(qv, rho, DZ, cosz=0.8, albedo=0.2)
    hr = np.asarray(hr)
    assert (hr >= 0.0).all()
    # water-vapor SW heating: order 1 K/day in the lower troposphere
    kday = hr * 86400.0
    assert 0.05 < kday[:4].mean() < 5.0
    # most of the beam reaches the surface in a clear aerosol-free sky
    assert 0.5 * 1361.0 * 0.8 < float(np.asarray(sw_dn).mean()) < 1361.0


def test_sw_night_zero():
    temp, qv, rho = _atmos()
    hr, sw_dn = shortwave(qv, rho, DZ, cosz=-0.3, albedo=0.2)
    np.testing.assert_allclose(np.asarray(hr), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sw_dn), 0.0, atol=1e-9)


def test_aerosol_direct_effect_dims_surface():
    """Aerosol layer (tau ~ 0.5) cuts surface SW and adds absorber heating."""
    temp, qv, rho = _atmos()
    tau = jnp.zeros((4, NZ, NY, NX), jnp.float32).at[:, 1, :, :].set(0.5)
    w0 = jnp.full((4, NZ, NY, NX), 0.85, jnp.float32)
    g = jnp.full((4, NZ, NY, NX), 0.65, jnp.float32)
    hr0, dn0 = shortwave(qv, rho, DZ, 0.8, 0.2)
    hr1, dn1 = shortwave(qv, rho, DZ, 0.8, 0.2, tau, w0, g)
    assert float(jnp.mean(dn1)) < float(jnp.mean(dn0)) * 0.95
    # the aerosol layer heats more than the same layer without aerosol
    assert float(hr1[1].mean()) > float(hr0[1].mean())


def test_lw_cools_troposphere_and_warms_surface():
    temp, qv, rho = _atmos()
    hr, lw_dn, olr = longwave(temp, qv, rho, DZ, t_sfc=temp[0])
    kday = np.asarray(hr) * 86400.0
    # net LW cooling of the moist troposphere, ~ -0.3..-5 K/day
    assert -10.0 < kday[:5].mean() < 0.0
    # downward LW at the surface: clear-sky ~ 200-400 W/m2
    assert 100.0 < float(np.asarray(lw_dn).mean()) < 450.0
    # OLR in the terrestrial range
    assert 150.0 < float(np.asarray(olr).mean()) < 350.0


def test_lw_energy_balance_dry_limit():
    """With qv->0 only the weak well-mixed (CO2-like) gray absorber remains:
    OLR approaches the surface emission (within the ~0.4 column tau) and
    heating rates collapse."""
    temp, _, rho = _atmos()
    qv = jnp.zeros((NZ, NY, NX), jnp.float32)
    hr, lw_dn, olr = longwave(temp, qv, rho, DZ, t_sfc=temp[0])
    sigma_t4 = 0.98 * 5.670374e-8 * np.asarray(temp[0]) ** 4
    np.testing.assert_allclose(np.asarray(olr), sigma_t4, rtol=0.15)
    assert float(np.asarray(olr).mean()) < float(sigma_t4.mean())
    assert abs(float(np.asarray(hr).mean())) * 86400.0 < 2.0


def test_radiation_driver_composes():
    temp, qv, rho = _atmos()
    hr, diag = radiation_driver(temp, qv, rho, DZ, cosz=0.6)
    assert hr.shape == (NZ, NY, NX)
    assert set(diag) == {"sw_sfc_down", "lw_sfc_down", "olr"}
    assert np.isfinite(np.asarray(hr)).all()


@pytest.mark.slow
def test_coupled_step_with_radiation_and_optics():
    """ra_physics=1 + do_optical end-to-end inside coupled_step."""
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
    from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h
    from wrf_partmc_tpu.utils import rng

    ad = make_aero_data()
    gd = make_gas_data()
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=6, nz=4, dx=2000.0, dy=2000.0,
                            ztop=2000.0),
        partmc=PartmcConfig(num_particles=8, max_particles=24,
                            n_emit_slots=4, do_optical=True,
                            do_coagulation=False, do_emission=False,
                            do_deposition=False, do_transport=True))
    cfg = cfg.replace(dynamics=dataclasses.replace(cfg.dynamics,
                                                   ra_physics=1))
    grid = make_grid(cfg)
    vf = np.zeros(ad.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(ad, gd.n_spec, make_mode(1e5, 5e-8, 1.8, vf))
    dyn = init_uniform(cfg, grid, 5.0, 2.0)
    cs = init_coupled(cfg, grid, ad, gd, dyn)
    aero = populate_from_dist(ad, cfg, grid, make_mode(1e9, 1e-7, 1.6, vf),
                              jax.random.key(0))
    cs = dataclasses.replace(cs, aero=aero)
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    step = jax.jit(lambda s: coupled_step(s, grid, cfg, ad, gd, scn, exch,
                                          rng.base_key(0)))
    out = cs
    for _ in range(3):
        out = step(out)
    assert bool(jnp.isfinite(out.dyn.theta_p).all())
    # radiation actually modified the thermodynamic state
    assert float(jnp.abs(out.dyn.theta_p - cs.dyn.theta_p).max()) > 0.0
