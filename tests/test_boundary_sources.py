"""Open lateral BCs, sea-salt source, nucleation, SCM forcing."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import (BoundaryConfig, DomainConfig, PartmcConfig,
                                   uniform_test_config)
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.coupled.driver import init_coupled, run_coupled
from wrf_partmc_tpu.models.coupled.init import populate_from_number_field
from wrf_partmc_tpu.models.dycore.ideal import init_uniform
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.dist import make_mode
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.models.partmc.scenario import constant_scenario

AD = make_aero_data()
GD = make_gas_data()


def _vf(spec="SO4"):
    vf = np.zeros(AD.n_spec)
    vf[AD.spec_by_name(spec)] = 1.0
    return vf


def _open_cfg(**pmc):
    cfg = uniform_test_config()
    return cfg.replace(
        domain=DomainConfig(nx=12, ny=8, nz=3, dx=2000.0, dy=2000.0),
        boundary=BoundaryConfig(periodic_x=False, periodic_y=False),
        partmc=PartmcConfig(num_particles=16, max_particles=48,
                            do_coagulation=False, do_emission=False,
                            do_deposition=False, do_transport=True, **pmc),
    )


@pytest.mark.slow
def test_open_bc_blob_exits_and_background_fills():
    cfg = _open_cfg()
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, u0=15.0, v0=0.0, blob_conc=1e9)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    aero = populate_from_number_field(AD, cfg, grid, dyn.num_conc[0],
                                      jax.random.key(0))
    cs = dataclasses.replace(cs, aero=aero)
    back_conc = 1e7
    back = make_mode(back_conc, 1e-7, 1.6, _vf())
    back_gas = np.zeros(GD.n_spec, np.float32)
    back_gas[GD.spec_by_name("O3")] = 40.0
    scn = constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, _vf()),
                            back_dist=back, back_gas=back_gas)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    # 15 m/s * 200 steps * 10 s = 30 km > 24 km domain: blob fully exits
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, scn, exch, 200))(cs)
    V = np.asarray(grid.cell_volume.reshape(-1, 1, 1))
    conc = np.asarray(out.aero.total_num()) / V
    # blob has left; concentrations relax toward the background scale
    assert conc.max() < 5e8, conc.max()
    assert conc.mean() < 5e7
    # particle field still tracks the Eulerian tracer through the open BC
    rho = 1.0 / np.asarray(grid.alpha_base).reshape(-1, 1, 1)
    tr = np.asarray(out.dyn.num_conc[0]) * rho
    corr = np.corrcoef(conc.ravel(), tr.ravel())[0, 1]
    assert corr > 0.8, corr
    # inflow (west) edge carries the background population
    west = conc[:, :, 0]
    assert np.all(west > 0.1 * back_conc), west.min()
    assert np.all(west < 10 * back_conc)
    # gas inflow BC applied
    o3 = np.asarray(out.gas[..., GD.spec_by_name("O3")])
    assert o3[:, :, 0].min() > 35.0


@pytest.mark.slow
def test_seasalt_source_adds_na_cl():
    cfg = _open_cfg(seasalt_param=1)
    cfg = cfg.replace(boundary=BoundaryConfig())   # periodic again
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, u0=10.0, v0=0.0, blob_conc=0.0)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    scn = constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, _vf()))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, scn, exch, 12))(cs)
    i_na = AD.spec_by_name("Na")
    na_mass = np.asarray(jnp.sum(out.aero.vol[..., i_na, :] * out.aero.num,
                                 axis=-1))
    # sea salt appears, and only in the surface layer (before any transport
    # it is injected at k=0; with no vertical mixing it stays there)
    assert na_mass[0].sum() > 0
    assert na_mass[1:].sum() <= na_mass[0].sum() * 0.2


def test_gong03_flux_shape_and_wind_dependence():
    from wrf_partmc_tpu.models.partmc.seasalt import seasalt_number_fluxes

    r, f5 = seasalt_number_fluxes(5.0)
    _, f10 = seasalt_number_fluxes(10.0)
    f5, f10 = np.asarray(f5), np.asarray(f10)
    assert f5.shape == r.shape
    assert np.all(f10 > f5)                      # stronger wind, more flux
    # u^3.41 scaling of the total
    ratio = f10.sum() / f5.sum()
    np.testing.assert_allclose(ratio, 2.0 ** 3.41, rtol=0.05)
    assert np.all(f5 > 0)


def test_nucleation_creates_particles_and_consumes_gas():
    from wrf_partmc_tpu.models.partmc.aero_state import zero_state
    from wrf_partmc_tpu.models.partmc.nucleate import nucleate_step

    aero = zero_state(AD, 16, ())
    gas = jnp.zeros(GD.n_spec).at[GD.spec_by_name("H2SO4")].set(10.0)
    aero2, gas2 = nucleate_step(aero, gas, GD, AD, 293.0, 1e5, 1.0, 600.0)
    assert float(aero2.total_num()) > 0
    assert float(gas2[GD.spec_by_name("H2SO4")]) <= 10.0
    i_so4 = AD.spec_by_name("SO4")
    assert float(aero2.vol[i_so4].sum()) > 0


def test_scm_forcing_relaxes():
    from wrf_partmc_tpu.models.dycore.state import zero_dycore_state
    from wrf_partmc_tpu.models.physics.scm_forcing import (apply_scm_forcing,
                                                           make_scm_forcing)

    cfg = uniform_test_config().replace(domain=DomainConfig(nx=4, ny=4, nz=5))
    grid = make_grid(cfg)
    dyn = zero_dycore_state(cfg, grid)
    f = make_scm_forcing(grid, u=10.0, theta_p=1.0, tau=600.0)
    d1 = apply_scm_forcing(dyn, f, grid, 600.0)
    w = 1 - np.exp(-1)
    np.testing.assert_allclose(np.asarray(d1.u), 10.0 * w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1.theta_p), 1.0 * w, rtol=1e-5)
    # repeated application converges to the target
    d = dyn
    for _ in range(10):
        d = apply_scm_forcing(d, f, grid, 600.0)
    np.testing.assert_allclose(np.asarray(d.u), 10.0, rtol=1e-3)
