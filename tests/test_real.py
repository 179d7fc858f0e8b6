"""Real-data on-ramp: synthetic wrfinput -> init_real -> stable ARW run.

The VERDICT r1 missing-#3 gate (``main/real_em.F`` +
``module_initialize_real.F`` + ``share/module_llxy.F`` metadata): a
real-style case initializes from a wrfinput-like file, runs stably, and
restarts."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu import constants as c
from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.ideal import hill_terrain
from wrf_partmc_tpu.models.dycore.real import (hydrostatic_rebalance,
                                               init_real,
                                               init_real_from_arrays)
from wrf_partmc_tpu.models.dycore.solve import solve_step
from wrf_partmc_tpu.tools.make_inputs import write_wrfinput


def _cfg(nx=16, ny=16, nz=10, dx=4000.0, ztop=12000.0, dt=10.0):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, ztop=ztop),
        dynamics=DynamicsConfig(dt=dt, n_sound=4, dyn_opt="arw",
                                damp_opt=1, zdamp=3000.0),
    )


def _steps(state, grid, cfg, n):
    def body(s, _):
        s2, _ = solve_step(s, grid, cfg)
        return s2, None

    out, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(state)
    return out


@pytest.mark.slow
def test_hydrostatic_rebalance_exact_discrete():
    """The rebalanced phi' makes the discrete buoyancy residual (the w
    forcing of arw._slow_tendencies) vanish for a stratified moist sounding
    over terrain."""
    cfg = _cfg(nx=8, ny=8)
    grid = make_grid(cfg, hgt=hill_terrain(cfg, h0=400.0))
    z3 = np.asarray(0.5 * (grid.phb[1:] + grid.phb[:-1])) / c.GRAV
    theta_p = 4.0e-3 * z3
    qv = 0.008 * np.exp(-z3 / 3000.0)
    mu_p = 50.0 * np.ones((grid.ny, grid.nx))
    state = init_real_from_arrays(cfg, grid, np.zeros_like(theta_p),
                                  np.zeros_like(theta_p), theta_p, qv)
    state = dataclasses.replace(state,
                                mu=jnp.asarray(mu_p, jnp.float32),
                                ph=hydrostatic_rebalance(theta_p, qv, mu_p,
                                                         grid))
    from wrf_partmc_tpu.models.dycore.arw import _slow_tendencies

    tend = _slow_tendencies(state, grid, cfg)
    # residual w forcing ~ f32 roundoff of the G*mu-scale terms
    assert float(jnp.abs(tend.W).max()) < 2e-2 * c.GRAV * 50.0


def test_wrfinput_roundtrip_metadata():
    """Generator writes the wrfinput schema; init_real ingests terrain,
    projection map factors and Coriolis."""
    cfg = _cfg()
    path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "wrfinput_test.nc")
    write_wrfinput(path, cfg, cen_lat=45.0)
    grid, state, _sfc = init_real(cfg, path)
    assert grid.hgt is not None and float(grid.hgt.max()) > 100.0
    msft = np.asarray(grid.msft)
    assert msft.shape == (cfg.domain.ny, cfg.domain.nx)
    assert np.all(msft > 0.9) and np.all(msft < 1.2) and msft.std() > 0.0
    f = np.asarray(grid.f_cor)
    assert np.all(f > 5e-5) and np.all(f < 1.5e-4)      # mid-latitudes
    assert np.all(np.isfinite(np.asarray(state.ph)))
    # sounding arrives: stable stratification, sheared jet
    th = np.asarray(state.theta_p)
    assert th[-1].mean() > th[0].mean() + 10.0
    assert float(np.asarray(state.u).max()) > 5.0


@pytest.mark.slow
def test_real_case_runs_stably_and_restarts(tmp_path):
    """100 steps of the real-style case: finite fields, bounded w, and a
    bitwise restart round-trip (the real_em 'small case' gate)."""
    cfg = _cfg(nx=16, ny=16, nz=10, dt=10.0)
    path = str(tmp_path / "wrfinput.nc")
    write_wrfinput(path, cfg)
    grid, state, _sfc = init_real(cfg, path)
    out = _steps(state, grid, cfg, 100)
    for name in ("u", "v", "w", "theta_p", "mu", "ph"):
        a = np.asarray(getattr(out, name))
        assert np.all(np.isfinite(a)), name
    # hydrostatically rebalanced init: no violent adjustment
    assert float(jnp.abs(out.w).max()) < 5.0
    assert float(jnp.abs(out.mu).max()) < 0.1 * float(grid.mub.min())

    # restart: npz round trip through the generic pytree path
    from wrf_partmc_tpu.utils.io import read_restart, write_restart
    from wrf_partmc_tpu.models.coupled.driver import CoupledState

    cs = CoupledState(dyn=out, aero=None, gas=jnp.zeros((1,)),
                      step=jnp.asarray(100, jnp.int32))
    rp = str(tmp_path / "restart.npz")
    write_restart(rp, cs)
    cs2 = read_restart(rp, cs)
    np.testing.assert_array_equal(np.asarray(cs2.dyn.theta_p),
                                  np.asarray(out.theta_p))
    out2 = _steps(cs2.dyn, grid, cfg, 5)
    assert bool(jnp.isfinite(out2.theta_p).all())
