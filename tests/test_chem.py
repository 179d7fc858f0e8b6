"""Simplified gas-aerosol chemistry (do_mosaic stand-in): sulfur budget,
condensational aging, mixing-state evolution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
from wrf_partmc_tpu.models.partmc.diagnostics import mixing_state_metrics
from wrf_partmc_tpu.models.partmc.dist import concat_dists, make_mode, sample_particles
from wrf_partmc_tpu.models.partmc.env_state import make_env_state
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data, zero_gas_state
from wrf_partmc_tpu.models.partmc.simple_chem import chem_step

AD = make_aero_data()
GD = make_gas_data()
ENV = make_env_state(temp=293.0, pressure=1e5, cell_volume=1.0)


def _mixed_population(n=64, cap=128, seed=0):
    """External mixture: BC mode + OC mode."""
    vf_bc = np.zeros(AD.n_spec); vf_bc[AD.spec_by_name("BC")] = 1.0
    vf_oc = np.zeros(AD.n_spec); vf_oc[AD.spec_by_name("OC")] = 1.0
    dist = concat_dists([make_mode(5e9, 8e-8, 1.6, vf_bc, source=0),
                         make_mode(5e9, 8e-8, 1.6, vf_oc, source=1)])
    st = zero_state(AD, cap, ())
    vol, num, src, wcl = sample_particles(jax.random.key(seed), dist, AD, n, 1.0)
    return add_particles(st, vol, num, src, wcl)


def test_sulfur_mass_budget():
    st = _mixed_population()
    gas = zero_gas_state(GD).at[GD.spec_by_name("SO2")].set(20.0)
    so4_0 = float(jnp.sum(st.vol[AD.spec_by_name("SO4")] * st.num)) * AD.density[AD.spec_by_name("SO4")]
    st2, gas2 = jax.jit(lambda s, g: chem_step(s, g, GD, AD, ENV, 600.0))(st, gas)
    i_so2, i_h2so4 = GD.spec_by_name("SO2"), GD.spec_by_name("H2SO4")
    # SO2 declined; products = gas H2SO4 + particulate SO4
    assert float(gas2[i_so2]) < 20.0
    d_so2_mol = (20.0 - float(gas2[i_so2]))      # ppb consumed
    # total S conserved: consumed SO2 (ppb) == produced H2SO4 (ppb-equiv)
    so4_mass = float(jnp.sum(st2.vol[AD.spec_by_name("SO4")] * st2.num) * AD.density[AD.spec_by_name("SO4")])
    # convert particulate SO4 mass back to ppb-equivalent of H2SO4
    import wrf_partmc_tpu.constants as c
    mol = (so4_mass - float(so4_0)) / 0.098
    n_air = float(ENV.pressure) / (c.BOLTZMANN * float(ENV.temp))
    ppb_part = mol * c.AVOGADRO / n_air * 1e9
    total_products = float(gas2[i_h2so4]) + ppb_part
    np.testing.assert_allclose(total_products, d_so2_mol, rtol=5e-2)


def test_condensation_ages_mixing_state():
    """H2SO4 condensation coats BC/OC particles -> chi increases."""
    st = _mixed_population()
    gas = zero_gas_state(GD).at[GD.spec_by_name("H2SO4")].set(5.0)
    chi0, _, _ = mixing_state_metrics(st, AD)
    st2, gas2 = st, gas
    step = jax.jit(lambda s, g: chem_step(s, g, GD, AD, ENV, 600.0))
    for _ in range(10):
        st2, gas2 = step(st2, gas2)
    chi1, _, _ = mixing_state_metrics(st2, AD)
    assert float(gas2[GD.spec_by_name("H2SO4")]) < 5.0
    assert float(chi1) > float(chi0) + 0.02, (float(chi0), float(chi1))
    # all alive particles received some sulfate
    so4 = np.asarray(st2.vol[AD.spec_by_name("SO4")])
    alive = np.asarray(st2.alive)
    assert np.all(so4[alive] > 0)


def test_nh3_neutralization_caps_at_2_to_1():
    st = _mixed_population()
    gas = (zero_gas_state(GD)
           .at[GD.spec_by_name("H2SO4")].set(5.0)
           .at[GD.spec_by_name("NH3")].set(100.0))   # NH3 in excess
    st2, gas2 = jax.jit(lambda s, g: chem_step(s, g, GD, AD, ENV, 3600.0))(st, gas)
    mol_so4 = float(jnp.sum(st2.vol[AD.spec_by_name("SO4")] * st2.num)
                    * AD.density[AD.spec_by_name("SO4")]) / 0.098
    mol_nh4 = float(jnp.sum(st2.vol[AD.spec_by_name("NH4")] * st2.num)
                    * AD.density[AD.spec_by_name("NH4")]) / 0.018
    assert mol_so4 > 0 and mol_nh4 > 0
    np.testing.assert_allclose(mol_nh4 / mol_so4, 2.0, rtol=0.05)
    assert float(gas2[GD.spec_by_name("NH3")]) < 100.0


def test_aerosol_photolysis_attenuation():
    """Aerosol-photochemistry feedback (the TUV-aerosol coupling of the
    reference's MOSAIC photolysis): an absorbing aerosol column attenuates
    the actinic flux below it, slowing NO2 photolysis and O3 production;
    a conservative forward-scattering aerosol barely does."""
    import jax.numpy as jnp
    import numpy as np

    from wrf_partmc_tpu.models.coupled.driver import _cbmz_mechanism
    from wrf_partmc_tpu.models.partmc.cbmz import cbmz_step
    from wrf_partmc_tpu.models.physics.radiation import (
        photolysis_aerosol_factor)

    nz, ny, nx = 6, 2, 2
    shp = (4, nz, ny, nx)
    tau_abs = jnp.zeros(shp).at[:, 3:].set(0.5)   # aerosol layer aloft
    f_abs = photolysis_aerosol_factor(tau_abs, jnp.full(shp, 0.6),
                                      jnp.full(shp, 0.6), 0.8)
    f_scat = photolysis_aerosol_factor(tau_abs, jnp.full(shp, 0.99),
                                       jnp.full(shp, 0.8), 0.8)
    f_clear = photolysis_aerosol_factor(jnp.zeros(shp), jnp.full(shp, 0.9),
                                        jnp.full(shp, 0.6), 0.8)
    # clear -> 1 everywhere; absorbing attenuates BELOW the layer;
    # conservative scattering attenuates much less
    assert np.allclose(np.asarray(f_clear), 1.0)
    assert float(f_abs[0, 0, 0]) < 0.6           # below the layer
    assert float(f_abs[-1, 0, 0]) > 0.8          # top barely touched
    assert float(f_scat[0, 0, 0]) > float(f_abs[0, 0, 0]) + 0.2

    # chemistry responds: attenuated J slows O3 photochemical production
    mech = _cbmz_mechanism()
    idx = {n: i for i, n in enumerate(mech.names)}
    g0 = np.zeros(mech.n_spec, np.float32)
    for n, v in (("NO2", 20.0), ("NO", 5.0), ("O3", 40.0), ("CO", 200.0),
                 ("HCHO", 5.0), ("PAR", 50.0), ("CH4", 1800.0)):
        g0[idx[n]] = v
    g = jnp.asarray(g0)
    for _ in range(12):
        g_full = cbmz_step(mech, g, 298.0, 1.0e5, 0.5, 0.8, 300.0)
        g_att = cbmz_step(mech, g, 298.0, 1.0e5, 0.5, 0.8, 300.0,
                          j_scale=jnp.float32(0.3))
        g = g_full
    o3_full = float(g_full[idx["O3"]])
    o3_att = float(g_att[idx["O3"]])
    assert o3_att < o3_full, (o3_att, o3_full)
