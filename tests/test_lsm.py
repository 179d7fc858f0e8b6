"""Slab LSM (sf_surface_physics=1): surface energy balance + diurnal skin
temperature inside the coupled step (``phys/module_sf_slab.F`` slot)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.config import (Config, DomainConfig, DynamicsConfig,
                                   PartmcConfig)
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.physics.lsm import init_land, slab_lsm_step


def test_slab_energy_balance_directions():
    """Strong sun warms the skin; no sun + cold sky cools it; fluxes react
    with the right signs."""
    land = init_land(4, 4, 288.0)
    args = dict(temp1=jnp.full((4, 4), 287.0), qv1=jnp.full((4, 4), 5e-3),
                rho1=jnp.full((4, 4), 1.1), ustar=jnp.full((4, 4), 0.3),
                exner_sfc=jnp.full((4, 4), 0.99),
                th1=jnp.full((4, 4), 290.0), dt=60.0)
    day, fx_day = slab_lsm_step(land, jnp.full((4, 4), 800.0),
                                jnp.full((4, 4), 350.0), **args)
    assert float(day.tsk.min()) > 288.0
    night, fx_night = slab_lsm_step(land, jnp.zeros((4, 4)),
                                    jnp.full((4, 4), 250.0), **args)
    assert float(night.tsk.max()) < 288.0
    # sustained sun drives a positive sensible flux
    warm = land
    for _ in range(30):
        warm, fx = slab_lsm_step(warm, jnp.full((4, 4), 800.0),
                                 jnp.full((4, 4), 350.0), **args)
    assert float(fx["hfx"].min()) > 0.0
    assert float(fx["qfx_w"].min()) > 0.0


@pytest.mark.slow
def test_coupled_diurnal_skin_temperature():
    """sf_surface_physics=1 + ra_physics=1 in coupled_step: TSK is
    prognostic, responds to the diurnal cycle, and the run stays stable."""
    from wrf_partmc_tpu.models.coupled.driver import (coupled_step,
                                                      init_coupled)
    from wrf_partmc_tpu.models.dycore.ideal import init_scm
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.dist import make_mode
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
    from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
    from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h
    from wrf_partmc_tpu.utils import rng

    cfg = Config(
        domain=DomainConfig(nx=4, ny=4, nz=8, dx=2000.0, dy=2000.0,
                            ztop=8000.0),
        dynamics=DynamicsConfig(dt=6.0, constant_velocity=False,
                                ra_physics=1, bl_physics=1,
                                sf_surface_physics=1),
        partmc=PartmcConfig(num_particles=4, max_particles=12,
                            n_emit_slots=2, do_coagulation=False,
                            do_emission=False, do_transport=False,
                            do_deposition=False, partmc_chem_dt=30.0),
    )
    grid = make_grid(cfg)
    ad, gd = make_aero_data(), make_gas_data()
    dyn = init_scm(cfg, grid)
    cs = init_coupled(cfg, grid, ad, gd, dyn)
    assert cs.land is not None
    vf = np.zeros(ad.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(ad, gd.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
    exch = k_profile_exch_h(grid, 0.3, 500.0)
    key = rng.base_key(0)

    step = jax.jit(lambda c: coupled_step(c, grid, cfg, ad, gd, scn, exch,
                                          key))
    tsk0 = float(cs.land.tsk.mean())
    out = cs
    for _ in range(60):                       # 6 model minutes
        out = step(out)
    tsk1 = float(out.land.tsk.mean())
    assert np.isfinite(tsk1) and abs(tsk1 - tsk0) > 0.01   # prognostic
    assert bool(jnp.isfinite(out.dyn.theta_p).all())
    assert 200.0 < tsk1 < 340.0
