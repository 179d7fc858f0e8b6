"""WSM5-class ice microphysics (mp_physics=2): phase physics and coupled
stability (the reference's ``phys/module_mp_wsm5.F`` slot,
``solve_em.F:3760``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu import constants as c
from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.state import (temperature,
                                                zero_dycore_state)
from wrf_partmc_tpu.models.physics.microphysics import (
    sat_mixing_ratio_ice, wsm5_step)
from wrf_partmc_tpu.models.physics.thermo import saturation_mixing_ratio


def _cfg(nz=12, ztop=10000.0):
    return Config(domain=DomainConfig(nx=4, ny=4, nz=nz, dx=2000.0,
                                      dy=2000.0, ztop=ztop),
                  dynamics=DynamicsConfig(dt=10.0, mp_physics=2),
                  n_moist=5)


def _state(cfg, grid, qv=None, theta_p=None, **q):
    s = zero_dycore_state(cfg, grid)
    m = s.moist
    if qv is not None:
        m = m.at[0].set(qv)
    for i, name in ((1, "qc"), (2, "qr"), (3, "qi"), (4, "qs")):
        if name in q:
            m = m.at[i].set(q[name])
    if theta_p is not None:
        s = dataclasses.replace(s, theta_p=jnp.asarray(theta_p, jnp.float32))
    return dataclasses.replace(s, moist=m)


def test_ice_saturation_below_water():
    """e_si < e_sw below freezing; equal at the triple point."""
    p = 8.0e4
    for t in (230.0, 250.0, 268.0):
        assert float(sat_mixing_ratio_ice(jnp.asarray(t), p)) < \
            float(saturation_mixing_ratio(jnp.asarray(t), p))
    t0 = 273.16
    r = (float(sat_mixing_ratio_ice(jnp.asarray(t0), p))
         / float(saturation_mixing_ratio(jnp.asarray(t0), p)))
    assert abs(r - 1.0) < 0.02


def test_warm_column_stays_ice_free():
    """T > 0 C everywhere: WSM5 reduces to warm-rain behavior — no ice or
    snow is created, supersaturation condenses to cloud water."""
    cfg = _cfg(nz=4, ztop=2000.0)
    grid = make_grid(cfg)
    temp0 = np.asarray(temperature(zero_dycore_state(cfg, grid), grid))
    assert temp0.min() > c.T_FREEZE
    qsw = np.asarray(saturation_mixing_ratio(jnp.asarray(temp0),
                                             np.asarray(grid.pb3)))
    s = _state(cfg, grid, qv=jnp.asarray(qsw * 1.1, jnp.float32))
    out = wsm5_step(s, grid, 10.0)
    m = np.asarray(out.moist)
    assert m[1].max() > 1e-5                  # cloud water formed
    assert m[3].max() == 0.0 and m[4].max() == 0.0
    assert float(out.theta_p.max()) > 0.0     # latent heating


def test_cold_column_forms_ice_with_heating():
    """A -40 C supersaturated column: condensate goes to ice (homogeneous
    regime), latent heating is the sublimation one."""
    cfg = _cfg(nz=4, ztop=2000.0)
    grid = make_grid(cfg)
    dth = -80.0                                # push T well below T_HOMOG
    s0 = _state(cfg, grid, theta_p=jnp.full((4, 4, 4), dth, jnp.float32))
    temp0 = np.asarray(temperature(s0, grid))
    assert temp0.max() < c.T_HOMOG
    qsi = np.asarray(sat_mixing_ratio_ice(jnp.asarray(temp0),
                                          np.asarray(grid.pb3)))
    s = _state(cfg, grid, qv=jnp.asarray(qsi * 1.5, jnp.float32),
               theta_p=jnp.full((4, 4, 4), dth, jnp.float32))
    out = wsm5_step(s, grid, 10.0)
    m = np.asarray(out.moist)
    assert m[3].max() > 1e-6                  # ice formed
    assert m[1].max() < 1e-8                  # not liquid
    assert float((out.theta_p - s.theta_p).max()) > 0.0


def test_snow_melts_to_rain_above_freezing():
    cfg = _cfg(nz=4, ztop=2000.0)
    grid = make_grid(cfg)
    temp0 = np.asarray(temperature(zero_dycore_state(cfg, grid), grid))
    assert temp0.min() > c.T_FREEZE
    qsw = np.asarray(saturation_mixing_ratio(jnp.asarray(temp0),
                                             np.asarray(grid.pb3)))
    # near-saturated air so the melt product doesn't instantly evaporate
    s = _state(cfg, grid, qv=jnp.asarray(0.99 * qsw, jnp.float32),
               qs=jnp.full((4, 4, 4), 1e-4, jnp.float32))
    out = wsm5_step(s, grid, 10.0)
    m = np.asarray(out.moist)
    assert m[4].max() < 1e-4                  # snow reduced
    assert m[2].max() > 0.0                   # rain appeared
    # melting cools
    assert float((out.theta_p - s.theta_p).min()) < 0.0


def test_total_water_conserved_without_sedimentation_loss():
    """Sum of all five species is conserved when nothing reaches the
    surface (condensate kept aloft and tiny fall distances)."""
    cfg = _cfg(nz=10, ztop=10000.0)
    grid = make_grid(cfg)
    rng = np.random.default_rng(0)
    qv = jnp.asarray(1e-3 * rng.random((10, 4, 4)), jnp.float32)
    qc = jnp.asarray(1e-5 * rng.random((10, 4, 4)), jnp.float32)
    s = _state(cfg, grid, qv=qv, qc=qc)
    # zero the lowest level so nothing sediments out
    m = s.moist.at[:, 0].set(0.0)
    s = dataclasses.replace(s, moist=m)
    out = wsm5_step(s, grid, 1.0)
    rho = 1.0 / np.asarray(grid.alpha_base)
    dzw = np.asarray(grid.dz) * rho
    tot = lambda st: float(np.sum(np.asarray(st.moist).sum(0)
                                  * dzw.reshape(-1, 1, 1)))
    np.testing.assert_allclose(tot(out), tot(s), rtol=2e-5)


@pytest.mark.slow
def test_wsm5_in_arw_warm_bubble():
    """mp_physics=2 inside the full ARW core: moist warm bubble runs stably
    with 5-class moisture."""
    from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble_arw
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    cfg = Config(
        domain=DomainConfig(nx=16, ny=16, nz=10, dx=2000.0, dy=2000.0,
                            ztop=10000.0),
        dynamics=DynamicsConfig(dt=8.0, n_sound=4, dyn_opt="arw",
                                damp_opt=1, zdamp=3000.0, mp_physics=2),
        n_moist=5)
    grid = make_grid(cfg)
    s = init_warm_bubble_arw(cfg, grid, d_theta=3.0)
    temp0 = temperature(s, grid)
    qsw = saturation_mixing_ratio(temp0, jnp.asarray(grid.pb3))
    s = dataclasses.replace(s, moist=s.moist.at[0].set(0.95 * qsw))

    def body(st, _):
        st2, _d = solve_step(st, grid, cfg)
        return st2, None

    out, _ = jax.jit(lambda st: jax.lax.scan(body, st, None, length=60))(s)
    for i in range(5):
        assert bool(jnp.isfinite(out.moist[i]).all()), i
        assert float(out.moist[i].min()) >= -1e-6
    assert bool(jnp.isfinite(out.theta_p).all())
    assert float(out.moist[1].max()) > 1e-6   # cloud formed in the updraft
