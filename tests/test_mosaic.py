"""MOSAIC-equivalent aerosol chemistry tests (models/partmc/mosaic.py):
ASTEM dynamic gas-particle transfer + MESA-lite thermodynamics + SOA.

Pins the coupling behavior of the reference's ``mosaic_timestep``
(``interface/wrf_pmc_driver.F90:232-237``): per-particle composition change
(mixing state!), gas<->aerosol mass closure, and regime physics (sulfate
neutralization, sea-salt chloride displacement, NH4NO3 equilibrium, SOA
absorption into the organic phase).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
from wrf_partmc_tpu.models.partmc.cbmz import build_mechanism
from wrf_partmc_tpu.models.partmc.env_state import make_env_state
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data_cbmz
from wrf_partmc_tpu.models.partmc.mosaic import (astem_inorganic,
                                                 mosaic_timestep,
                                                 soa_partition)

AD = make_aero_data()
GD = make_gas_data_cbmz()
IDX = {n: i for i, n in enumerate(GD.names)}


def _population():
    """10 acidic sulfate + 5 sea-salt + 5 OC particles in 1 m3."""
    S = AD.n_spec
    st = zero_state(AD, 32)
    nv = np.zeros((S, 24), np.float32)
    num = np.zeros(24, np.float32)
    v = np.pi / 6 * (2e-7) ** 3
    for i in range(10):
        nv[AD.spec_by_name("SO4"), i] = v
        num[i] = 5e8
    for i in range(10, 15):
        nv[AD.spec_by_name("Na"), i] = 0.55 * v * 5
        nv[AD.spec_by_name("Cl"), i] = 0.45 * v * 5
        num[i] = 5e7
    for i in range(15, 20):
        nv[AD.spec_by_name("OC"), i] = v
        num[i] = 5e8
    return add_particles(st, jnp.asarray(nv), jnp.asarray(num),
                         jnp.zeros(24, jnp.int32), jnp.zeros(24, jnp.int32),
                         0.0)


def _gas(**ppb):
    g = np.zeros(GD.n_spec, np.float32)
    for n, v in ppb.items():
        g[IDX[n]] = v
    return jnp.asarray(g)


ENV = make_env_state(temp=285.0, pressure=1e5, rel_humid=0.7, cell_volume=1.0)


def _total_mol(aero, gas, gname, aname):
    ig, sa = GD.spec_by_name(gname), AD.spec_by_name(aname)
    gm = float(gas[ig]) * 1e-9 * 1e5 / (8.314 * 285.0)
    am = float((aero.vol[sa, :] * AD.density[sa] / AD.molec_weight[sa]
                * aero.num).sum())
    return gm + am


def _aer_mass(aero, name):
    s = AD.spec_by_name(name)
    return float((aero.vol[s, :] * AD.density[s] * aero.num).sum())


@pytest.mark.slow
def test_h2so4_condenses_irreversibly():
    aero, gas = _population(), _gas(H2SO4=2.0)
    s0 = _total_mol(aero, gas, "H2SO4", "SO4")
    # Fuchs-Sutugin uptake on this population gives a condensation sink of
    # ~5e-3 1/s; over 2 h essentially all H2SO4 must be on the particles
    step = jax.jit(lambda a, g: astem_inorganic(a, g, GD, AD, ENV, 600.0))
    a, g = aero, gas
    last = 2.0
    for _ in range(12):
        a, g = step(a, g)
        now = float(g[IDX["H2SO4"]])
        assert now <= last + 1e-6                 # monotone uptake
        last = now
    assert last < 0.05 * 2.0
    assert abs(_total_mol(a, g, "H2SO4", "SO4") - s0) / s0 < 0.01


def test_nh3_neutralizes_acidic_sulfate_only():
    aero, gas = _population(), _gas(NH3=5.0)
    a, g = astem_inorganic(aero, gas, GD, AD, ENV, 600.0)
    v = np.asarray(a.vol)
    nh4 = AD.spec_by_name("NH4")
    assert v[nh4, 0:10].sum() > 0                  # sulfate particles took NH4
    assert v[nh4, 10:15].sum() < 1e-3 * v[nh4, 0:10].sum()  # salt did not
    # uptake bounded by (2:1 NH4:SO4) electro-neutrality
    so4_mol = (v[AD.spec_by_name("SO4"), 0:10] * 1800.0 / 96e-3).sum()
    nh4_mol = (v[nh4, 0:10] * 1770.0 / 18e-3).sum()
    assert nh4_mol <= 2.0 * so4_mol * 1.05


def test_seasalt_takes_nitrate_displaces_chloride():
    aero = _population()
    gas = _gas(HNO3=10.0, NH3=10.0, HCl=0.5)
    step = jax.jit(lambda a, g: astem_inorganic(a, g, GD, AD, ENV, 300.0))
    a, g = aero, gas
    for _ in range(12):
        a, g = step(a, g)
    v = np.asarray(a.vol)
    no3 = AD.spec_by_name("NO3")
    assert v[no3, 10:15].sum() > 0                 # NaNO3 formed on salt
    # conservation across gas+aerosol
    n0 = _total_mol(aero, gas, "HNO3", "NO3")
    n1 = _total_mol(a, g, "HNO3", "NO3")
    assert abs(n1 - n0) / n0 < 0.03
    cl0 = _total_mol(aero, gas, "HCl", "Cl")
    cl1 = _total_mol(a, g, "HCl", "Cl")
    assert abs(cl1 - cl0) / cl0 < 0.05


def test_soa_partitions_into_organic_phase():
    aero = _population()
    gas = _gas(ARO1=2.0, API1=2.0, ARO2=2.0)
    a, g = soa_partition(aero, gas, GD, AD, ENV, 1800.0)
    # low-C* products condense appreciably; mass closes
    assert _aer_mass(a, "ARO1") > 0 and _aer_mass(a, "API1") > 0
    for name in ("ARO1", "API1", "ARO2"):
        t0 = _total_mol(aero, gas, name, name)
        t1 = _total_mol(a, g, name, name)
        assert abs(t1 - t0) / max(t0, 1e-30) < 0.02
    # high-C* ARO2 stays mostly in the gas
    assert float(g[IDX["ARO2"]]) > float(g[IDX["ARO1"]])


@pytest.mark.slow
def test_mosaic_timestep_changes_mixing_state():
    """The defining capability: initially externally-mixed population gains
    internally-mixed secondary coatings, per particle."""
    mech = build_mechanism()
    aero = _population()
    gas = _gas(HNO3=5.0, NH3=8.0, H2SO4=0.5, SO2=10.0, O3=40.0, ARO1=1.0,
               API1=1.0, NO2=10.0, HCHO=3.0, CO=200.0)
    step = jax.jit(lambda a, g: mosaic_timestep(
        mech, a, g, GD, AD, ENV, 300.0, 0.8))
    a, g = aero, gas
    for _ in range(6):
        a, g = step(a, g)
    v = np.asarray(a.vol)
    assert np.isfinite(v).all() and np.isfinite(np.asarray(g)).all()
    assert (np.asarray(g) >= 0).all()
    # every initially-pure class now carries secondary species
    nh4, no3 = AD.spec_by_name("NH4"), AD.spec_by_name("NO3")
    aro1 = AD.spec_by_name("ARO1")
    assert v[nh4, 0:10].sum() > 0        # sulfate aged by NH4
    assert v[no3, 10:15].sum() > 0       # salt aged by NO3
    assert v[aro1, 15:20].sum() > 0      # OC absorbed SOA
    # gas-phase photochemistry ran (O3 changed, H2SO4 from SO2 condensed)
    so4_total = v[AD.spec_by_name("SO4"), :].sum()
    assert so4_total > np.asarray(aero.vol)[AD.spec_by_name("SO4"), :].sum()


@pytest.mark.slow
def test_coupled_step_with_cbmz():
    """End-to-end coupled_step with do_mosaic + the full 77-species registry
    (the reference's chem_opt=777 + do_mosaic=.true. configuration)."""
    from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                       uniform_test_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.driver import coupled_step, init_coupled
    from wrf_partmc_tpu.models.coupled.init import populate_from_dist
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform
    from wrf_partmc_tpu.models.partmc.dist import make_mode
    from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
    from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h
    from wrf_partmc_tpu.utils import rng

    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=6, nz=3, dx=2000.0, dy=2000.0,
                            ztop=1500.0),
        partmc=PartmcConfig(num_particles=8, max_particles=24,
                            n_emit_slots=4, partmc_chem_dt=60.0,
                            do_mosaic=True, do_coagulation=True,
                            do_emission=True, do_deposition=True,
                            do_transport=True, n_sub_gas=4, n_sub_astem=2))
    grid = make_grid(cfg)
    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(AD, GD.n_spec, make_mode(1e5, 5e-8, 1.8, vf))
    dyn = init_uniform(cfg, grid, 5.0, 2.0)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    aero = populate_from_dist(AD, cfg, grid, make_mode(1e9, 1e-7, 1.6, vf),
                              jax.random.key(0))
    gas = cs.gas
    for n, v in dict(O3=40.0, NO2=10.0, SO2=5.0, NH3=3.0, HNO3=1.0,
                     CO=150.0).items():
        gas = gas.at[..., IDX[n]].set(v)
    cs = dataclasses.replace(cs, aero=aero, gas=gas)
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    key = rng.base_key(0)
    step = jax.jit(lambda s: coupled_step(s, grid, cfg, AD, GD, scn, exch,
                                          key))
    # paired twin with chemistry OFF and identical RNG streams: the MC
    # transport/rebalance noise (unbiased but several % per halving event)
    # cancels between the runs, isolating the chemistry signal
    cfg_off = cfg.replace(partmc=dataclasses.replace(cfg.partmc,
                                                     do_mosaic=False))
    step_off = jax.jit(lambda s: coupled_step(s, grid, cfg_off, AD, GD, scn,
                                              exch, key))
    out = cs
    out_off = cs
    for _ in range(7):
        out = step(out)
        out_off = step_off(out_off)
    assert bool(jnp.isfinite(out.gas).all())
    assert bool(jnp.isfinite(out.aero.vol).all())
    assert float(out.gas.min()) >= 0.0
    # chemistry actually ran: secondary ammonium condensed onto the (pure
    # sulfate) particles — zero in the chemistry-off twin; and gas-phase
    # photochemistry moved O3 away from the twin
    nh4 = AD.spec_by_name("NH4")
    m_on = float((out.aero.vol[..., nh4, :] * out.aero.num).sum())
    m_off = float((out_off.aero.vol[..., nh4, :] * out_off.aero.num).sum())
    assert m_on > m_off + 1e-6, (m_on, m_off)
    d_o3 = float(jnp.abs(out.gas[..., IDX["O3"]]
                         - out_off.gas[..., IDX["O3"]]).max())
    assert d_o3 > 0.1, d_o3


@pytest.mark.slow
def test_batched_cells():
    """All-cells-at-once execution (the TPU layout) matches physics."""
    mech = build_mechanism()
    base = _population()
    aero = jax.tree.map(lambda a: jnp.broadcast_to(a, (2, 3) + a.shape),
                        base)
    gas = jnp.broadcast_to(_gas(HNO3=5.0, NH3=8.0, O3=40.0),
                           (2, 3, GD.n_spec))
    env = make_env_state(temp=285.0, pressure=1e5, rel_humid=0.7,
                         cell_volume=1.0, cell_shape=(2, 3))
    a, g = mosaic_timestep(mech, aero, gas, GD, AD, env, 300.0, 0.8)
    assert g.shape == (2, 3, GD.n_spec)
    gn = np.asarray(g)
    np.testing.assert_allclose(gn[0, 0], gn[1, 2], rtol=1e-5, atol=1e-7)
    assert np.isfinite(np.asarray(a.vol)).all()
