"""MESA water hysteresis: per-particle deliquescence/efflorescence legs
(the hysteresis state the reference persists per particle through restart,
``wrf_pmc_init.F90:1111-1272``).  Validates the branch logic of
``equilib_water_hyst`` over an RH cycle, the no-hysteresis behavior of
organic particles, and restart persistence of the leg."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
from wrf_partmc_tpu.models.partmc.condense import (
    equilib_water_hyst, particle_drh_crh)
from wrf_partmc_tpu.models.partmc.env_state import make_env_state

AD = make_aero_data()
S = AD.n_spec


def _two_particle_state():
    """Particle 0: pure ammonium sulfate (hysteresis).  Particle 1: pure
    organic (continuous uptake, no hysteresis)."""
    st = zero_state(AD, 8)
    vol = np.zeros((S, 2), np.float32)
    d = 2.0e-7
    v = np.pi / 6.0 * d ** 3
    vol[AD.spec_by_name("SO4"), 0] = 0.7 * v
    vol[AD.spec_by_name("NH4"), 0] = 0.3 * v
    vol[AD.spec_by_name("OC"), 1] = v
    return add_particles(st, jnp.asarray(vol), jnp.asarray([1.0e6, 1.0e6]),
                         jnp.asarray([0, 0]), jnp.asarray([0, 0]))


def _env(rh):
    return make_env_state(temp=293.15, pressure=1.0e5, rel_humid=rh,
                          cell_volume=1.0)


def _water(st):
    return np.asarray(st.vol[AD.i_water])


def test_drh_crh_composition():
    st = _two_particle_state()
    drh, crh, el_frac = jax.jit(lambda s: particle_drh_crh(s, AD))(st)
    # AS particle: the (NH4)2SO4 mutual DRH/CRH
    assert abs(float(drh[0]) - 0.80) < 1e-3
    assert abs(float(crh[0]) - 0.35) < 1e-3
    assert float(el_frac[0]) > 0.99
    # organic particle: no electrolyte
    assert float(el_frac[1]) < 1e-6


def test_hysteresis_cycle():
    st = _two_particle_state()
    eq = jax.jit(lambda s, rh: equilib_water_hyst(s, AD, _env(rh)))

    # dry below CRH: AS effloresces (leg 0, ~no water)
    st = eq(st, 0.30)
    assert int(st.hyst_leg[0]) == 0
    w_dry = _water(st)[0]
    # rising through the hysteresis window: stays on the lower leg, dry
    st = eq(st, 0.60)
    assert int(st.hyst_leg[0]) == 0
    assert _water(st)[0] < 1e-24
    # past DRH: deliquesces
    st = eq(st, 0.85)
    assert int(st.hyst_leg[0]) == 1
    w_wet_085 = _water(st)[0]
    assert w_wet_085 > 1e-22
    # back into the window: stays on the upper leg, keeps water
    st = eq(st, 0.60)
    assert int(st.hyst_leg[0]) == 1
    w_wet_060 = _water(st)[0]
    assert w_wet_060 > 1e-23
    # below CRH again: effloresces
    st = eq(st, 0.30)
    assert int(st.hyst_leg[0]) == 0
    assert _water(st)[0] <= w_dry + 1e-26

    # the organic particle never effloresces and takes water continuously
    st2 = _two_particle_state()
    st2 = eq(st2, 0.30)
    assert int(st2.hyst_leg[1]) == 1
    assert _water(st2)[1] > 0.0
    w_lo = _water(st2)[1]
    st2 = eq(st2, 0.85)
    assert _water(st2)[1] > w_lo


def test_branch_water_differs_in_window():
    """Inside the hysteresis window the two legs give different water —
    the defining property of the hysteresis loop."""
    st = _two_particle_state()
    eq = jax.jit(lambda s, rh: equilib_water_hyst(s, AD, _env(rh)))
    up = eq(eq(st, 0.85), 0.60)      # upper leg at RH=0.60
    lo = eq(eq(st, 0.30), 0.60)      # lower leg at RH=0.60
    assert _water(up)[0] > 10.0 * max(_water(lo)[0], 1e-30)


def test_leg_persists_through_particle_netcdf(tmp_path):
    from wrf_partmc_tpu.utils.io import (read_particle_netcdf,
                                         write_particle_netcdf)

    st = _two_particle_state()
    st = equilib_water_hyst(st, AD, _env(0.30))  # AS on the lower leg
    assert int(st.hyst_leg[0]) == 0

    class _G:
        nz, ny, nx = 1, 1, 1

    class _CS:
        aero = jax.tree.map(lambda a: a[None, None, None], st)
        gas = jnp.zeros((1, 1, 1, 3))

    p = str(tmp_path / "part.nc")
    write_particle_netcdf(p, _CS, AD, _G)
    aero, _gas = read_particle_netcdf(p, _CS)
    assert int(aero.hyst_leg[0, 0, 0, 0]) == 0
    assert int(aero.hyst_leg[0, 0, 0, 1]) == 1
