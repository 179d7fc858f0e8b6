"""Noah-class 4-layer LSM (sf_surface_physics=2; module_sf_noahdrv.F /
module_soil_pre.F equivalents): diurnal cycle, soil-column energy
consistency, amplitude decay + phase lag with depth, moisture stress."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.models.physics import lsm


def _diurnal(land, n_steps=576, dt=300.0, sw_peak=800.0, record=None):
    """48 h of idealized diurnal forcing over a quiescent atmosphere."""
    th1 = jnp.full_like(land.tsk, 288.0)
    temp1 = th1
    qv1 = jnp.full_like(land.tsk, 0.006)
    rho1 = jnp.full_like(land.tsk, 1.2)
    ustar = jnp.full_like(land.tsk, 0.3)
    exner = jnp.ones_like(land.tsk)
    hist = {"tsk": [], "t1": [], "t4": [], "imbal": [], "resid": []}
    store0 = None
    net_g = 0.0
    t_ref = 288.0
    for i in range(n_steps):
        t = i * dt
        sw = sw_peak * max(0.0, np.sin(2 * np.pi * (t / 86400.0 - 0.25)))
        lw = 320.0
        land, fx = lsm.noah_lsm_step(land, jnp.asarray(sw), jnp.asarray(lw),
                                     temp1, qv1, rho1, ustar, exner, th1, dt)
        # column heat storage referenced to t_ref (so evaporative moisture
        # loss does not masquerade as heat-storage change)
        dzs = jnp.asarray(lsm.DZS).reshape(-1, 1, 1)
        from wrf_partmc_tpu.models.physics.landuse import soil_params
        sp = soil_params(land.isltyp)
        c_soil = ((1.0 - sp["theta_sat"]) * sp["c_dry"]
                  + land.smois * lsm.C_WATER)
        store = float(jnp.sum(c_soil * (land.t_soil - t_ref) * dzs,
                              axis=0).mean())
        if store0 is None:
            store0 = store
        net_g += dt * float(fx["grf"].mean())
        resid = float(jnp.abs(fx["rnet"] - fx["hfx"]
                              - 2.5e6 * fx["qfx_w"] - fx["grf"]).max())
        hist["tsk"].append(float(land.tsk.mean()))
        hist["t1"].append(float(land.t_soil[0].mean()))
        hist["t4"].append(float(land.t_soil[3].mean()))
        hist["imbal"].append(net_g - (store - store0))
        hist["resid"].append(resid)
    return land, {k: np.asarray(v) for k, v in hist.items()}


@pytest.mark.slow
def test_noah_diurnal_cycle_energy_and_phase():
    """48 h diurnal run: finite, realistic skin-temperature amplitude, the
    surface energy input (Rnet - H - LE) matches the soil-column heat
    storage change (conservation through the implicit solve + TBOT leak),
    deep layers damped + lagged vs the top layer."""
    land = lsm.init_noah(2, 2, t0=288.0, tbot=285.0)
    land, h = _diurnal(land)
    assert np.isfinite(h["tsk"]).all()
    day2 = slice(288, 576)
    amp_skin = h["tsk"][day2].max() - h["tsk"][day2].min()
    assert 5.0 < amp_skin < 40.0, amp_skin
    # deep-layer damping: bottom layer amplitude a small fraction of top's
    amp1 = h["t1"][day2].max() - h["t1"][day2].min()
    amp4 = h["t4"][day2].max() - h["t4"][day2].min()
    assert amp4 < 0.2 * amp1, (amp1, amp4)
    # phase lag: top soil layer peaks after the skin
    lag1 = np.argmax(h["t1"][day2]) - np.argmax(h["tsk"][day2])
    assert lag1 > 0
    # surface energy balance closes at every step (Newton residual)
    assert h["resid"].max() < 5.0, h["resid"].max()
    # energy: integrated G into the soil equals the column heat-storage
    # change up to the TBOT boundary leak (a ~1 W/m2 steady flux)
    thru = 0.5 * 800.0 * 86400.0 / np.pi
    assert abs(h["imbal"][-1]) < 0.1 * thru, h["imbal"][-1]


@pytest.mark.slow
def test_noah_phase_lag_vs_slab():
    """Documented contrast: the Noah soil column (real heat capacity +
    conduction) delays and damps the skin temperature relative to the thin
    force-restore slab."""
    noah = lsm.init_noah(2, 2, t0=288.0, tbot=285.0)
    _, hn = _diurnal(noah)
    slab = lsm.init_land(2, 2, t0=288.0)
    th1 = jnp.full((2, 2), 288.0)
    qv1 = jnp.full((2, 2), 0.006)
    rho1 = jnp.full((2, 2), 1.2)
    ustar = jnp.full((2, 2), 0.3)
    exner = jnp.ones((2, 2))
    tsk_s = []
    dt = 300.0
    for i in range(576):
        t = i * dt
        sw = 800.0 * max(0.0, np.sin(2 * np.pi * (t / 86400.0 - 0.25)))
        slab, _ = lsm.slab_lsm_step(slab, jnp.asarray(sw),
                                    jnp.asarray(320.0), th1, qv1, rho1,
                                    ustar, exner, th1, dt)
        tsk_s.append(float(slab.tsk.mean()))
    tsk_s = np.asarray(tsk_s)
    day2 = slice(288, 576)
    # Noah peaks at/after the slab peak (soil conduction memory) and the
    # two schemes differ measurably
    pk_noah = np.argmax(hn["tsk"][day2])
    pk_slab = np.argmax(tsk_s[day2])
    assert pk_noah >= pk_slab - 3
    assert abs(hn["tsk"][day2].max() - tsk_s[day2].max()) > 0.2


@pytest.mark.slow
def test_noah_moisture_stress_reduces_evaporation():
    """Dry soil shuts down both direct evaporation (beta) and transpiration
    (Jarvis moisture stress)."""
    wet = lsm.init_noah(2, 2, t0=300.0, sm0=0.33)
    dry = dataclasses.replace(wet, smois=jnp.full((4, 2, 2), 0.05))
    args = (jnp.asarray(600.0), jnp.asarray(320.0),
            jnp.full((2, 2), 295.0), jnp.full((2, 2), 0.005),
            jnp.full((2, 2), 1.2), jnp.full((2, 2), 0.3),
            jnp.ones((2, 2)), jnp.full((2, 2), 295.0), 300.0)
    _, fw = lsm.noah_lsm_step(wet, *args)
    _, fd = lsm.noah_lsm_step(dry, *args)
    assert float(fd["qfx_w"].mean()) < 0.3 * float(fw["qfx_w"].mean())
    # the suppressed latent flux shows up as extra sensible heating
    assert float(fd["hfx"].mean()) > float(fw["hfx"].mean())


@pytest.mark.slow
def test_noah_in_coupled_step():
    """sf_surface_physics=2 + bl=2 + ra=4 (the CARES d02 combination)
    validates and runs through coupled_step; the soil state evolves."""
    from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                       uniform_test_config, validate_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.driver import init_coupled, run_coupled
    from wrf_partmc_tpu.models.coupled.init import populate_from_number_field
    from wrf_partmc_tpu.models.dycore.state import zero_dycore_state
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.dist import make_mode
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
    from wrf_partmc_tpu.models.partmc.scenario import constant_scenario

    AD, GD = make_aero_data(), make_gas_data()
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=6, nz=8, dx=2000.0, dy=2000.0,
                            ztop=1600.0),
        partmc=PartmcConfig(num_particles=16, max_particles=48,
                            do_coagulation=False, do_emission=False,
                            do_deposition=False, do_transport=True))
    cfg = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, constant_velocity=False, n_sound=2, bl_physics=2,
        ra_physics=4, sf_surface_physics=2))
    validate_config(cfg)
    grid = make_grid(cfg)
    dyn = zero_dycore_state(cfg, grid)
    dyn = dataclasses.replace(dyn, u=jnp.full_like(dyn.u, 5.0))
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e8)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(4))
    cs = dataclasses.replace(init_coupled(cfg, grid, AD, GD, dyn), aero=aero)
    assert isinstance(cs.land, lsm.NoahState)
    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, scn, exch,
                                        8))(cs)
    assert np.isfinite(np.asarray(out.dyn.theta_p)).all()
    assert np.isfinite(np.asarray(out.land.t_soil)).all()
    assert float(jnp.abs(out.land.tsk - cs.land.tsk).max()) > 0.0
