"""Per-step emission cadence (VERDICT r2 item 3): the reference applies
gas/aero/sea-salt emissions every WRF dt with ``grid%dt``
(``wrf_pmc_driver.F90:202-223``) while coagulation/MOSAIC run on
``partmc_chem_dt`` — emissions must arrive continuously, not in chem-dt
bursts."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import DomainConfig, PartmcConfig, uniform_test_config
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.coupled.driver import coupled_step, init_coupled
from wrf_partmc_tpu.models.dycore.ideal import init_uniform
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.dist import make_mode
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
from wrf_partmc_tpu.utils import rng

AD = make_aero_data()
GD = make_gas_data()


@pytest.mark.slow
def test_emissions_arrive_every_step_not_in_chem_bursts():
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=4, ny=4, nz=2, dx=2000.0, dy=2000.0,
                            ztop=2000.0),
        partmc=PartmcConfig(num_particles=64, max_particles=256,
                            n_emit_slots=8, partmc_chem_dt=60.0,
                            do_coagulation=False, do_emission=True,
                            do_deposition=False, do_transport=False,
                            allow_halving=False, allow_doubling=False),
    )
    grid = make_grid(cfg)
    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    emit = make_mode(2e3, 1e-7, 1.6, vf)     # emission rate dist [# m-3 s-1]
    scn = constant_scenario(AD, GD.n_spec, emit)
    dyn = init_uniform(cfg, grid, 0.0, 0.0)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    key = rng.base_key(7)
    step = jax.jit(lambda c: coupled_step(c, grid, cfg, AD, GD, scn, exch,
                                          key))

    totals = [float(cs.aero.total_num().sum())]
    for _ in range(12):
        cs = step(cs)
        totals.append(float(cs.aero.total_num().sum()))
    inc = np.diff(np.array(totals))
    # every step emits (no zero increments between chem macro-steps)
    assert (inc > 0).all(), inc
    # increments are uniform across steps (dt-cadence, not chem-dt bursts)
    assert inc.max() / inc.min() < 1.5, inc
    # totals match rate * dt * V * n_steps (dilution off in constant_scenario)
    from wrf_partmc_tpu.models.partmc.dist import dist_number_conc
    expect = (float(dist_number_conc(emit)) * cfg.dynamics.dt * 12
              * float(jnp.sum(grid.cell_volume)) * grid.ny * grid.nx)
    np.testing.assert_allclose(totals[-1] - totals[0], expect, rtol=1e-3)
