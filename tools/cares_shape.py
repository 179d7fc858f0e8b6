"""CARES-shaped end-to-end coupled run (VERDICT r4 item 6).

Builds an em_real-style synthetic domain in the CARES configuration's image
(``WRFV3/test/em_real/namelist.input.cares``: dx=4 km, 100 particles/cell,
partmc_chem_dt=300 s, chem_opt=777 with the full physics option set —
MYJ surface/PBL, RRTMG-class correlated-k radiation, Grell cumulus,
Morrison+graupel microphysics, Noah LSM) at the largest grid that fits one
chip's HBM at 100 particles/cell, with specified+relaxation lateral BCs
from a generated wrfbdy (steady synthetic inflow) and CBM-Z/MOSAIC
chemistry on.

Used by ``bench.py --worker cares`` (records cares_shape_steps_per_s) and
by ``tests/test_cares_shape.py`` (a scaled-down copy of the same build).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def build_cares_shape(nx, ny, nz, n_part=100, cap=128, dt=30.0,
                      chem_on=True, n_class_sources=6, mesh=None):
    """Returns (step_fn(state) -> state, initial CoupledState, cfg, grid).

    The step closes over a steady wrfbdy built from the initial state (the
    CARES runs read 6-hourly boundary slabs; a steady slab exercises the
    same spec+relax code path)."""
    import jax
    import jax.numpy as jnp

    from wrf_partmc_tpu.config import (BoundaryConfig, Config, DomainConfig,
                                       DynamicsConfig, PartmcConfig,
                                       validate_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.bdy import make_bdy
    from wrf_partmc_tpu.models.coupled.driver import (coupled_step,
                                                      init_coupled)
    from wrf_partmc_tpu.models.coupled.init import populate_from_dist
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform
    from wrf_partmc_tpu.models.dycore.state import (temperature,
                                                    total_pressure)
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.dist import concat_dists, make_mode
    from wrf_partmc_tpu.models.partmc.gas_data import (make_gas_data,
                                                       make_gas_data_cbmz)
    from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
    from wrf_partmc_tpu.models.partmc.sources import (build_universe,
                                                      validate_universe)
    from wrf_partmc_tpu.models.physics.thermo import saturation_mixing_ratio
    from wrf_partmc_tpu.utils import rng

    cfg = Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=4000.0, dy=4000.0,
                            ztop=16000.0),
        dynamics=DynamicsConfig(
            dt=dt, n_sound=4, dyn_opt="arw", damp_opt=1, zdamp=4000.0,
            mp_physics=10, ra_physics=4, bl_physics=2, cu_physics=5,
            sf_surface_physics=2, diff_opt=2, km_opt=4),
        boundary=BoundaryConfig(periodic_x=False, periodic_y=False,
                                open_xs=True, open_xe=True,
                                open_ys=True, open_ye=True,
                                spec_zone=1, relax_zone=4),
        partmc=PartmcConfig(num_particles=n_part, max_particles=cap,
                            n_emit_slots=4, partmc_chem_dt=300.0,
                            do_coagulation=True, do_emission=True,
                            do_deposition=True, do_mosaic=chem_on,
                            do_transport=True, do_condensation=chem_on,
                            # aerosol-radiation (tauaer/waer/gaer direct
                            # effect) + aerosol-photolysis (TUV-role
                            # actinic attenuation) feedbacks on
                            do_optical=chem_on),
        n_moist=10, n_moist_mass=6,
        n_chem_gas=77 if chem_on else 32,
    )

    ad = make_aero_data()
    gd = make_gas_data_cbmz() if chem_on else make_gas_data()
    vf = np.zeros(ad.n_spec)
    vf[0] = 1.0
    em_named = [(name, make_mode(nc, gmd, gsd, vf)) for name, nc, gmd, gsd in
                (("traffic", 4e4, 5e-8, 1.8), ("industry", 2e4, 1e-7, 2.0),
                 ("biomass", 1e4, 8e-8, 1.7), ("dust", 5e3, 5e-7, 1.9),
                 ("cooking", 2e4, 6e-8, 1.6),
                 ("shipping", 1e4, 9e-8, 1.8))[:n_class_sources]]
    uni, (ic,), _, em_d = build_universe(
        ic=[("background", make_mode(3e8, 1e-7, 1.8, vf))],
        emissions=em_named)
    cfg = cfg.replace(n_class=max(8, uni.n_class))
    validate_universe(uni, cfg.n_class)
    validate_config(cfg)
    grid = make_grid(cfg)

    # synthetic "real-data" base flow: uniform westerly + moisture
    dyn = init_uniform(cfg, grid, 8.0, 1.0)
    qsat = saturation_mixing_ratio(temperature(dyn, grid),
                                   total_pressure(dyn, grid))
    dyn = dataclasses.replace(
        dyn, moist=dyn.moist.at[0].set(0.5 * jnp.minimum(qsat, 0.01)))
    cs = init_coupled(cfg, grid, ad, gd, dyn)
    aero = populate_from_dist(ad, cfg, grid, ic, jax.random.key(0))
    gas = cs.gas
    if chem_on:
        for name, ppb in dict(O3=40.0, NO2=8.0, NO=2.0, SO2=4.0, NH3=3.0,
                              HNO3=1.0, HCHO=2.0, CO=150.0,
                              CH4=1800.0).items():
            try:
                gas = gas.at[..., gd.spec_by_name(name)].set(ppb)
            except (KeyError, ValueError):
                pass
    cs = dataclasses.replace(cs, aero=aero, gas=gas)
    scn = constant_scenario(ad, gd.n_spec, concat_dists(em_d))

    # steady wrfbdy from the initial state (spec+relax path exercised)
    bdy = make_bdy(jnp.asarray([0.0, 6 * 3600.0]), [dyn, dyn],
                   width=cfg.boundary.spec_zone + cfg.boundary.relax_zone,
                   chem=True)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    key = rng.base_key(0)

    def step_fn(state):
        return coupled_step(state, grid, cfg, ad, gd, scn, exch, key,
                            bdy=bdy, mesh=mesh)

    return step_fn, cs, cfg, grid
