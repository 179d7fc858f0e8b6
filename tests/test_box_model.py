"""Standalone 0-D box model (models/partmc/box_model.py — the PartMC
``run_part`` loop equivalent).  The urban-plume trajectory test covers the
full-chemistry path; here the forcing balance is pinned analytically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import fill_fresh
from wrf_partmc_tpu.models.partmc.box_model import BoxEnv, run_box
from wrf_partmc_tpu.models.partmc.dist import make_mode, sample_particles
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.models.partmc.scenario import Scenario, constant_scenario


def _setup(emit_rate, lam):
    ad = make_aero_data()
    gd = make_gas_data()
    vf = np.zeros(ad.n_spec)
    vf[ad.spec_by_name("SO4")] = 1.0
    P = 256
    init = make_mode(1e9, 1e-7, 1.6, vf)
    vol, num, src, wcl = sample_particles(jax.random.key(0), init, ad,
                                          P // 2, 1.0, (1, 1, 1))
    aero = fill_fresh(ad, P, vol, num, src, wcl)
    scn = constant_scenario(ad, gd.n_spec,
                            make_mode(emit_rate, 8e-8, 1.7, vf),
                            dilution_rate=lam)
    gas = jnp.zeros((1, 1, 1, gd.n_spec), jnp.float32)
    benv = BoxEnv(temp=lambda t: 293.0, rel_humid=lambda t: 0.5,
                  pressure=lambda t: 1.0e5, height=lambda t: 400.0,
                  cosz=lambda t: 0.0)
    return aero, gas, scn, benv, ad, gd


@pytest.mark.slow
def test_box_emission_dilution_equilibrium():
    """With emission rate E [# m-3 s-1] and dilution lambda toward an empty
    background, number concentration relaxes toward E / lambda (the
    scenario ODE's fixed point) regardless of the starting population."""
    E, lam = 2.0e5, 1.0e-4                      # equilibrium 2e9 m-3
    aero, gas, scn, benv, ad, gd = _setup(E, lam)
    mech = None
    out, _ = run_box(aero, gas, scn, benv, ad, gd, mech,
                     t_end=12 * 3600.0, dt=300.0, do_coag=False,
                     do_chem=False, n_ideal=128)
    n_end = float(out.total_num()[0, 0, 0])
    assert abs(n_end - E / lam) / (E / lam) < 0.25, n_end


@pytest.mark.slow
def test_box_coag_reduces_number_conserves_mass():
    """Coagulation-only box: number falls, dry mass is exactly conserved."""
    from wrf_partmc_tpu.models.partmc.aero_data import particle_mass

    aero, gas, scn0, benv, ad, gd = _setup(0.0, 0.0)
    # dense population so Brownian coag acts within hours
    import dataclasses

    aero = dataclasses.replace(aero, num=aero.num * 100.0)
    scn = constant_scenario(ad, gd.n_spec,
                            make_mode(0.0, 8e-8, 1.7,
                                      np.eye(ad.n_spec)[0]))
    m0 = float((particle_mass(aero.vol, ad, dry=True)
                * aero.num).sum())
    n0 = float(aero.total_num()[0, 0, 0])
    out, _ = run_box(aero, gas, scn, benv, ad, gd, None,
                     t_end=6 * 3600.0, dt=300.0, do_coag=True,
                     do_chem=False, n_ideal=128)
    n1 = float(out.total_num()[0, 0, 0])
    m1 = float((particle_mass(out.vol, ad, dry=True) * out.num).sum())
    assert n1 < 0.95 * n0, (n0, n1)
    np.testing.assert_allclose(m1, m0, rtol=5e-3)
