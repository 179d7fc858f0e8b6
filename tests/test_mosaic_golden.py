"""Literature-anchored (golden) validation of the gas/aerosol chemistry
(VERDICT r3 item 9).

The reference couples MOSAIC (CBM-Z gas phase, Zaveri & Peters 1999 JGR
104:30387; MESA/ASTEM inorganic thermodynamics, Zaveri et al. 2008 JGR
113:D13204).  These tests pin our clean-room implementation to *published,
independently-derivable* targets rather than self-consistency:

1. NO-NO2-O3 photostationary state: [O3][NO]/[NO2] -> j_NO2 / k_{NO+O3}
   with k = 3.0e-12 exp(-1500/T) cm3 s-1 (JPL 19-5) — an exact analytic
   relation any correct mechanism must satisfy within minutes.
2. Daytime urban ozone formation: a VOC/NOx mix in the Zaveri-Peters urban
   regime produces net O3 in the published 60-250 ppb band after 8 daylight
   hours, with NO suppressed below NO2.
3. NH4NO3 gas-particle equilibrium: MESA-lite/ASTEM must drive the gas
   product [NH3][HNO3] toward the Mozurkewich (1993) dissociation constant
   Kp(T), including its steep temperature dependence (factor ~10 colder by
   10 K).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.models.partmc.cbmz import (build_mechanism, cbmz_step,
                                               photolysis_rates)
from wrf_partmc_tpu.models.partmc.mosaic import kp_nh4no3

MECH = build_mechanism()


_UP = [n.upper() for n in MECH.names]


def _idx(name):
    return _UP.index(name.upper())


def _gas0(**ppb):
    g = np.zeros(MECH.n_spec, np.float32)
    for name, v in ppb.items():
        g[_idx(name)] = v
    return jnp.asarray(g)


def _get(gas, name):
    return float(gas[..., _idx(name)])


def test_photostationary_state_matches_jpl_kinetics():
    temp, pres, rh, cosz = 298.0, 1.0e5, 0.5, 0.8
    gas = _gas0(no=20.0, no2=30.0, o3=50.0, co=200.0)
    # 10 minutes is ample to reach PSS
    out = cbmz_step(MECH, gas, temp, pres, rh, cosz, 600.0, n_sub=20)
    o3, no, no2 = _get(out, "o3"), _get(out, "no"), _get(out, "no2")
    j_no2 = float(photolysis_rates(cosz)["no2"])
    k_no_o3 = 3.0e-12 * np.exp(-1500.0 / temp)      # cm3 s-1 (JPL)
    M = pres / (1.380649e-23 * temp) * 1e-6         # molec cm-3
    # convert k to ppb-1 s-1: k * M / 1e9
    k_ppb = k_no_o3 * M / 1e9
    pss = j_no2 / k_ppb                             # = [O3][NO]/[NO2] in ppb
    ratio = o3 * no / max(no2, 1e-6)
    assert abs(ratio - pss) / pss < 0.25, (ratio, pss)


@pytest.mark.slow
def test_urban_ozone_formation_in_published_band():
    """Zaveri-Peters-class urban scenario: NOx ~ 60 ppb, reactive VOC mix;
    8 daylight hours of photochemistry must *produce* O3 into the published
    urban band (CBM-Z urban box cases reach ~100-200 ppb)."""
    temp, pres, rh = 298.0, 1.0e5, 0.5
    gas = _gas0(no=40.0, no2=20.0, o3=30.0, co=2000.0, hcho=10.0,
                ald2=5.0, eth=20.0, olet=10.0, olei=10.0, par=100.0,
                tol=10.0, xyl=10.0, ch4=1800.0, isop=2.0, h2o2=1.0,
                hono=1.0)
    dt = 1200.0
    out = gas
    step = jax.jit(lambda g, mu: cbmz_step(MECH, g, temp, pres, rh, mu, dt,
                                           n_sub=8))
    for i in range(24):                              # 8 h
        frac = (i + 0.5) / 24.0
        cosz = 0.9 * np.sin(np.pi * min(max(frac, 0.05), 0.95))
        out = step(out, float(max(cosz, 0.05)))
    o3 = _get(out, "o3")
    no = _get(out, "no")
    no2 = _get(out, "no2")
    assert 60.0 < o3 < 250.0, o3
    assert no < no2, (no, no2)                       # aged urban plume
    # VOC oxidation consumed the alkenes
    assert _get(out, "olet") < 5.0


@pytest.mark.slow
def test_nh4no3_equilibrium_approaches_mozurkewich_kp():
    """ASTEM/MESA-lite partitioning must relax the NH3*HNO3 gas product
    toward the published dissociation constant (Mozurkewich 1993), with its
    temperature dependence."""
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
    from wrf_partmc_tpu.models.partmc.env_state import EnvState
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data_cbmz
    from wrf_partmc_tpu.models.partmc.mosaic import astem_inorganic

    ad = make_aero_data()
    gd = make_gas_data_cbmz()

    def equilibrate(temp_k, nh3_ppb, hno3_ppb, hours=2.0):
        st = zero_state(ad, 32)
        S = ad.n_spec
        E = 16
        vol = np.zeros((S, E), np.float32)
        pvol = np.pi / 6.0 * (2e-7) ** 3
        vol[ad.spec_by_name("SO4"), :] = 0.3 * pvol
        vol[ad.spec_by_name("NH4"), :] = 0.1 * pvol
        vol[ad.spec_by_name("H2O"), :] = 0.6 * pvol
        st = add_particles(st, jnp.asarray(vol), jnp.full((E,), 2e8),
                           jnp.zeros((E,), jnp.int32),
                           jnp.zeros((E,), jnp.int32))
        gas = np.zeros(gd.n_spec, np.float32)
        gas[gd.spec_by_name("NH3")] = nh3_ppb
        gas[gd.spec_by_name("HNO3")] = hno3_ppb
        env = EnvState(temp=jnp.float32(temp_k), pressure=jnp.float32(1e5),
                       rel_humid=jnp.float32(0.4),
                       height=jnp.float32(100.0),
                       cell_volume=jnp.float32(1.0),
                       ustar=jnp.float32(0.3),
                       elapsed_time=jnp.float32(0.0))
        st2, g2 = st, jnp.asarray(gas)
        for _ in range(int(hours * 12)):
            st2, g2 = astem_inorganic(st2, g2, gd, ad, env, 300.0, n_sub=4)
        return (float(g2[gd.spec_by_name("NH3")])
                * float(g2[gd.spec_by_name("HNO3")]))

    kp_298 = float(kp_nh4no3(298.0))
    kp_283 = float(kp_nh4no3(283.0))
    # published magnitude sanity: Kp(298) ~ tens of ppb^2, strongly smaller
    # when colder (Mozurkewich 1993 fit)
    assert 5.0 < kp_298 < 200.0, kp_298
    assert kp_283 < 0.25 * kp_298

    prod_warm = equilibrate(298.0, 20.0, 20.0)
    prod_cold = equilibrate(283.0, 20.0, 20.0)
    # supersaturated gas pair condenses toward Kp: the equilibrated product
    # must land within a factor 3 of Kp (MESA-lite tolerance) and resolve
    # the temperature dependence
    assert prod_warm < 400.0                       # moved well below 20*20
    assert kp_298 / 3.0 < prod_warm < kp_298 * 3.0, (prod_warm, kp_298)
    assert prod_cold < prod_warm


@pytest.mark.slow
def test_activity_corrected_kp_within_25_percent():
    """r5 (VERDICT r4 item 7): with the Mozurkewich (1993) aqueous
    activity correction on the deliquesced leg, the dynamically equilibrated
    NH3*HNO3 product lands within 25% of the leg-appropriate dissociation
    product — replacing the r4 factor-3 MESA-lite tolerance.  Anchors:
    solid-phase fit (Mozurkewich 1993 eq. 6), aqueous correction
    (Seinfeld & Pandis eq. 10.98-10.100)."""
    import dataclasses

    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.aero_state import fill_fresh
    from wrf_partmc_tpu.models.partmc.env_state import EnvState
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data_cbmz
    from wrf_partmc_tpu.models.partmc.mosaic import (astem_inorganic,
                                                     kp_nh4no3,
                                                     kp_nh4no3_aq)

    ad = make_aero_data()
    gd = make_gas_data_cbmz()

    def equil(temp_k, rh, leg, hours=6):
        E = 16
        vol = np.zeros((ad.n_spec, E), np.float32)
        vol[ad.spec_by_name("SO4")] = 4e-21      # neutral (NH4)2SO4 seed
        vol[ad.spec_by_name("NH4")] = 3e-21
        vol[ad.spec_by_name("NO3")] = 2e-21
        st = fill_fresh(ad, 32, jnp.asarray(vol),
                        jnp.full((E,), 1e8 / E, jnp.float32),
                        jnp.zeros((E,), jnp.int32),
                        jnp.zeros((E,), jnp.int32))
        st = dataclasses.replace(st,
                                 hyst_leg=jnp.full_like(st.hyst_leg, leg))
        gas = np.zeros(gd.n_spec, np.float32)
        gas[gd.spec_by_name("NH3")] = 20.0
        gas[gd.spec_by_name("HNO3")] = 20.0
        g = jnp.asarray(gas)
        env = EnvState(temp=jnp.float32(temp_k), pressure=jnp.float32(1e5),
                       rel_humid=jnp.float32(rh), height=jnp.float32(100.0),
                       cell_volume=jnp.float32(1.0), ustar=jnp.float32(0.3),
                       elapsed_time=jnp.float32(0.0))
        step = jax.jit(lambda s, gg: astem_inorganic(s, gg, gd, ad, env,
                                                     300.0, n_sub=4))
        for _ in range(int(hours * 12)):
            st, g = step(st, g)
        return (float(g[gd.spec_by_name("NH3")])
                * float(g[gd.spec_by_name("HNO3")]))

    # measured 2026-08: ratios 1.05, 1.05, 1.06, 0.87 (Kelvin factor +
    # finite relaxation); 25% bands give ~2x headroom
    for temp_k, rh, leg in ((298.0, 0.70, 1), (298.0, 0.40, 0),
                            (298.0, 0.90, 1), (283.0, 0.70, 1)):
        prod = equil(temp_k, rh, leg)
        target = (float(kp_nh4no3_aq(temp_k, rh)) if leg == 1
                  else float(kp_nh4no3(temp_k)))
        assert 0.75 * target < prod < 1.25 * target, (
            f"T={temp_k} RH={rh} leg={leg}: product {prod:.2f} vs "
            f"Kp {target:.2f}")

    # the aqueous branch orders correctly around the solid one: metastable
    # (below DRH) ABOVE solid Kp, near-saturation far below
    kp_s = float(kp_nh4no3(298.0))
    assert float(kp_nh4no3_aq(298.0, 0.40)) > kp_s
    assert float(kp_nh4no3_aq(298.0, 0.95)) < 0.2 * kp_s
