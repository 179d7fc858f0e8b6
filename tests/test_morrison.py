"""Morrison-class two-moment microphysics (mp_physics=10, the CARES case's
scheme family — module_mp_morr_two_moment.F / Morrison et al. 2005, 2009)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble_arw
from wrf_partmc_tpu.models.dycore.solve import solve_step
from wrf_partmc_tpu.models.physics.morrison import morrison_step


def _cfg(nx=8, ny=8, nz=20, ztop=10000.0, dt=10.0):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=ztop),
        dynamics=DynamicsConfig(dt=dt, n_sound=4, dyn_opt="arw",
                                mp_physics=10, damp_opt=1, zdamp=3000.0),
        n_moist=8, n_moist_mass=5,
    )


def _supersat_state(cfg, grid, qv0=0.012, k_lo=2, k_hi=8):
    s = init_warm_bubble_arw(cfg, grid, d_theta=0.0)
    kk = jnp.arange(grid.nz).reshape(-1, 1, 1)
    qv = jnp.where((kk >= k_lo) & (kk <= k_hi), qv0, 1e-4)
    qv = jnp.broadcast_to(qv, s.theta_p.shape)
    return dataclasses.replace(s, moist=s.moist.at[0].set(qv))


def _total_water(s):
    return float(jnp.sum(s.moist[0:5]))


@pytest.mark.slow
def test_warm_rain_forms_and_conserves_water():
    cfg = _cfg()
    grid = make_grid(cfg)
    s = _supersat_state(cfg, grid)
    w0 = _total_water(s)
    for _ in range(30):
        s = jax.jit(lambda st: morrison_step(st, grid, cfg.dynamics.dt))(s)
    m = np.asarray(s.moist)
    assert np.isfinite(m).all()
    # cloud formed and autoconverted to rain with rain number online
    assert m[1].max() > 1e-5 or m[2].max() > 1e-6
    assert m[2].max() > 1e-7
    assert m[5].max() > 1.0            # nr > 0 where rain exists
    # water conserved up to sedimentation out of the column bottom
    w1 = _total_water(s)
    assert w1 <= w0 * 1.0001
    assert w1 > 0.3 * w0
    # latent heating warmed the condensation layers
    assert float(s.theta_p.max()) > 0.05


@pytest.mark.slow
def test_cold_cloud_forms_ice_and_snow():
    cfg = _cfg(ztop=12000.0, nz=24)
    grid = make_grid(cfg)
    # moisture placed high where T << 0 C
    s = _supersat_state(cfg, grid, qv0=0.003, k_lo=14, k_hi=20)
    for _ in range(40):
        s = jax.jit(lambda st: morrison_step(st, grid, cfg.dynamics.dt))(s)
    m = np.asarray(s.moist)
    assert np.isfinite(m).all()
    assert m[3].max() > 1e-8           # ice formed
    assert m[6].max() > 1.0            # with number
    assert m[4].max() > 1e-9           # some snow from autoconversion


@pytest.mark.slow
def test_morrison_in_full_solver_stable():
    """mp=10 wired into the ARW solver: a moist warm bubble runs stably and
    produces precipitation classes (the em_real-viability gate)."""
    from wrf_partmc_tpu.models.dycore.state import temperature, total_pressure
    from wrf_partmc_tpu.models.physics.thermo import saturation_mixing_ratio

    cfg = _cfg(nx=12, ny=12, nz=20, dt=8.0)
    grid = make_grid(cfg)
    s = init_warm_bubble_arw(cfg, grid, d_theta=3.0, z_center=1500.0,
                             z_radius=800.0)
    # 60% RH column, capped at 6 g/kg: the dry-base-state init is not
    # vapor-rebalanced, so heavy moisture loads excite a domain-wide
    # hydrostatic adjustment; a moderate column keeps that mild while the
    # rising bubble still saturates near its crest
    qsat = saturation_mixing_ratio(temperature(s, grid),
                                   total_pressure(s, grid))
    s = dataclasses.replace(
        s, moist=s.moist.at[0].set(0.6 * jnp.minimum(qsat, 0.006)))

    def body(st, _):
        s2, _d = solve_step(st, grid, cfg)
        return s2, None

    out, _ = jax.jit(lambda st: jax.lax.scan(body, st, None, length=120))(s)
    m = np.asarray(out.moist)
    assert np.isfinite(m).all()
    assert np.isfinite(np.asarray(out.w)).all()
    assert float(jnp.abs(out.w).max()) < 40.0
    assert m[1].max() + m[2].max() > 1e-6      # condensate appeared


def _cfg_g(nx=8, ny=8, nz=24, ztop=12000.0, dt=10.0):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=ztop),
        dynamics=DynamicsConfig(dt=dt, n_sound=4, dyn_opt="arw",
                                mp_physics=10, damp_opt=1, zdamp=3000.0),
        n_moist=10, n_moist_mass=6,
    )


def _total_water_g(s):
    return float(jnp.sum(s.moist[0:6]))


@pytest.mark.slow
def test_graupel_forms_from_rimed_snow_and_frozen_rain():
    """Deep-convective column (VERDICT r4 item 5): supercooled cloud water
    coexisting with snow/rain below -4 C partitions rime ice into graupel
    (riming-to-graupel conversion + Bigg-frozen rain routed to graupel);
    water conserved up to sedimentation; graupel melts into rain below the
    freezing level."""
    from wrf_partmc_tpu.config import validate_config

    cfg = _cfg_g()
    validate_config(cfg)
    grid = make_grid(cfg)
    # supercooled layer: abundant cloud water + rain + snow at T ~ -10 C
    s = init_warm_bubble_arw(cfg, grid, d_theta=0.0)
    kk = jnp.arange(grid.nz).reshape(-1, 1, 1)
    mid = (kk >= 8) & (kk <= 14)                  # ~4-7 km: below freezing
    z3 = s.theta_p.shape
    mlay = jnp.where(mid, 1.0, 0.0) * jnp.ones(z3)
    m = s.moist
    m = m.at[0].set(0.002 * mlay)                 # vapor
    m = m.at[1].set(1.5e-3 * mlay)                # cloud water (supercooled)
    m = m.at[2].set(5.0e-4 * mlay)                # rain
    m = m.at[4].set(5.0e-4 * mlay)                # snow
    m = m.at[6].set(5.0e4 * mlay)                 # nr
    m = m.at[8].set(1.0e5 * mlay)                 # ns
    s = dataclasses.replace(s, moist=m)
    w0 = _total_water_g(s)

    step = jax.jit(lambda st: morrison_step(st, grid, cfg.dynamics.dt))
    for _ in range(30):
        s = step(s)
    mo = np.asarray(s.moist)
    assert np.isfinite(mo).all()
    assert mo[5].max() > 1e-6, mo[5].max()        # graupel mass formed
    assert mo[9].max() > 1.0                      # with number online
    # graupel carries a substantial share of the precipitation ice
    assert mo[5].max() > 0.1 * mo[4].max()
    w1 = _total_water_g(s)
    assert w1 <= w0 * 1.0001 and w1 > 0.2 * w0
    # melting: below the supercooled layer (warm levels) graupel is absent
    # or converted to rain as it sediments through the melting level
    warm = np.asarray(jnp.arange(grid.nz) < 4)
    assert mo[5][warm].max() <= mo[5].max()


def test_morrison_no_graupel_layout_unchanged():
    """The 8-field layout (no graupel) still validates and runs: graupel
    terms must vanish identically when qg/ng are not carried."""
    cfg = _cfg()
    grid = make_grid(cfg)
    s = _supersat_state(cfg, grid)
    out = jax.jit(lambda st: morrison_step(st, grid, cfg.dynamics.dt))(s)
    assert out.moist.shape[0] == 8
    assert np.isfinite(np.asarray(out.moist)).all()


def test_cold_model_top_stays_finite():
    """Regression: a 155 K model top (16 km synthetic sounding) overflowed
    the unclamped Bigg freezing exponential into inf * lam^-6 = NaN; the
    supercooling clamp keeps every rate finite."""
    import numpy as np

    from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform
    from wrf_partmc_tpu.models.physics.morrison import morrison_step

    cfg = Config(domain=DomainConfig(nx=4, ny=4, nz=20, dx=4000.0, dy=4000.0,
                                     ztop=16000.0),
                 dynamics=DynamicsConfig(dt=30.0, mp_physics=10),
                 n_moist=10, n_moist_mass=6)
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, 8.0, 1.0)
    # moisture everywhere incl. the very cold top layers
    dyn = dataclasses.replace(dyn, moist=dyn.moist.at[0].set(1e-3)
                              .at[1].set(1e-4).at[2].set(1e-4))
    out = jax.jit(lambda d: morrison_step(d, grid, 30.0))(dyn)
    assert np.isfinite(np.asarray(out.theta_p)).all()
    assert np.isfinite(np.asarray(out.moist)).all()
