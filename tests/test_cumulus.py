"""BMJ-class convective adjustment (cumulus driver slot; Betts & Miller
1986 / Janjic 1994): consumes CAPE in deep unstable columns, conserves
column enthalpy, produces rainfall; leaves stable columns untouched."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble_arw
from wrf_partmc_tpu.models.dycore.state import temperature, total_pressure
from wrf_partmc_tpu.models.physics.cumulus import bmj_step, _parcel_profile
from wrf_partmc_tpu.models.physics.thermo import saturation_mixing_ratio


def _cfg(nz=20):
    return Config(domain=DomainConfig(nx=4, ny=4, nz=nz, dx=12000.0,
                                      dy=12000.0, ztop=12000.0),
                  dynamics=DynamicsConfig(dt=60.0, dyn_opt="arw"))


def _moist_unstable(cfg, grid, rh=0.95):
    s = init_warm_bubble_arw(cfg, grid, d_theta=0.0)
    temp = temperature(s, grid)
    pres = total_pressure(s, grid)
    qs = saturation_mixing_ratio(temp, pres)
    kk = jnp.arange(grid.nz).reshape(-1, 1, 1)
    qv = jnp.where(kk < 6, rh * qs, 0.1 * qs)
    # warm the boundary layer to build CAPE
    thp = s.theta_p + jnp.where(kk < 3, 4.0, 0.0)
    return dataclasses.replace(s, theta_p=thp,
                               moist=s.moist.at[0].set(qv))


@pytest.mark.slow
def test_bmj_consumes_cape_conserves_enthalpy_and_rains():
    cfg = _cfg()
    grid = make_grid(cfg)
    s = _moist_unstable(cfg, grid)
    from wrf_partmc_tpu import constants as c

    temp0 = temperature(s, grid)
    pres = total_pressure(s, grid)
    rho = pres / (287.0 * temp0)
    dz = jnp.broadcast_to(grid.dz.reshape(-1, 1, 1), temp0.shape)
    dm = rho * dz
    s2 = s
    rain_tot = 0.0
    for _ in range(20):
        s2, rain = bmj_step(s2, grid, cfg.dynamics.dt)
        rain_tot += float(rain.mean()) * cfg.dynamics.dt
    temp1 = temperature(s2, grid)
    # rained
    assert rain_tot > 1e-3, rain_tot          # kg/m2 over 20 min
    # column dried
    dq = float(jnp.sum((s2.moist[0] - s.moist[0]) * dm))
    assert dq < 0.0
    # moist static energy ~conserved: cp dT + Lv dq column sums cancel
    dh = float(jnp.sum((temp1 - temp0) * dm) * 1004.0
               + jnp.sum((s2.moist[0] - s.moist[0]) * dm) * 2.501e6)
    h0 = float(jnp.sum(temp0 * dm) * 1004.0)
    assert abs(dh) / h0 < 2e-3, (dh, h0)
    # CAPE consumed
    def cape_of(st):
        t = temperature(st, grid)
        tp = _parcel_profile(t, st.moist[0], total_pressure(st, grid))
        return float(jnp.sum(jnp.maximum((tp - t) / t, 0.0) * 9.81 * dz,
                             axis=0).mean())
    assert cape_of(s2) < 0.9 * cape_of(s)

    # a stable dry column is untouched
    s_st = init_warm_bubble_arw(cfg, grid, d_theta=0.0)
    s3, rain3 = bmj_step(s_st, grid, cfg.dynamics.dt)
    assert float(jnp.abs(s3.theta_p - s_st.theta_p).max()) < 1e-6
    assert float(rain3.max()) == 0.0
