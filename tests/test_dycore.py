"""Dycore validation: frozen-wind transport cases (em_uniform/em_rotational
equivalents), acoustic core stability, warm-bubble buoyancy response."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig, uniform_test_config
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.ideal import (
    init_rotational, init_uniform, init_warm_bubble)
from wrf_partmc_tpu.models.dycore.solve import solve_step
from wrf_partmc_tpu.models.dycore.state import base_profiles


def _run(state, grid, cfg, n):
    def step(s, _):
        s2, diag = solve_step(s, grid, cfg)
        return s2, None
    out, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=n))(state)
    return out


@pytest.mark.slow
def test_uniform_case_translates_blob():
    cfg = uniform_test_config()
    cfg = cfg.replace(domain=DomainConfig(nx=40, ny=40, nz=4, dx=2000.0, dy=2000.0))
    grid = make_grid(cfg)
    u0, v0 = 10.0, 5.0
    s0 = init_uniform(cfg, grid, u0, v0)
    n = 40
    sf = _run(s0, grid, cfg, n)
    dt = cfg.dynamics.dt
    # winds frozen
    np.testing.assert_allclose(np.asarray(sf.u), u0, rtol=1e-6)
    # blob center of mass moved by (u0, v0) * t (periodic domain, no wrap yet)
    q0 = np.asarray(s0.num_conc[0, 0])
    qf = np.asarray(sf.num_conc[0, 0])
    yy, xx = np.meshgrid(np.arange(grid.ny), np.arange(grid.nx), indexing="ij")
    cx0 = (q0 * xx).sum() / q0.sum()
    cy0 = (q0 * yy).sum() / q0.sum()
    cxf = (qf * xx).sum() / qf.sum()
    cyf = (qf * yy).sum() / qf.sum()
    np.testing.assert_allclose(cxf - cx0, u0 * dt * n / grid.dx, atol=0.15)
    np.testing.assert_allclose(cyf - cy0, v0 * dt * n / grid.dy, atol=0.15)
    np.testing.assert_allclose(qf.sum(), q0.sum(), rtol=1e-5)
    assert qf.min() >= -1e-3


@pytest.mark.slow
def test_rotational_cone_returns_home():
    cfg = uniform_test_config()
    cfg = cfg.replace(domain=DomainConfig(nx=48, ny=48, nz=2, dx=2000.0, dy=2000.0))
    grid = make_grid(cfg)
    n_rev = 200
    s0 = init_rotational(cfg, grid, period_s=n_rev * cfg.dynamics.dt)
    sf = _run(s0, grid, cfg, n_rev)
    q0 = np.asarray(s0.num_conc[0, 0])
    qf = np.asarray(sf.num_conc[0, 0])
    np.testing.assert_allclose(qf.sum(), q0.sum(), rtol=1e-4)
    # cone back at start: high correlation and small center-of-mass shift
    corr = np.corrcoef(q0.ravel(), qf.ravel())[0, 1]
    assert corr > 0.97, corr
    assert qf.max() > 0.6 * q0.max()
    assert qf.min() >= -1e-3


@pytest.mark.slow
def test_half_rotation_moves_cone_opposite():
    cfg = uniform_test_config()
    cfg = cfg.replace(domain=DomainConfig(nx=48, ny=48, nz=2, dx=2000.0, dy=2000.0))
    grid = make_grid(cfg)
    n_rev = 200
    s0 = init_rotational(cfg, grid, period_s=n_rev * cfg.dynamics.dt)
    sh = _run(s0, grid, cfg, n_rev // 2)
    q0 = np.asarray(s0.num_conc[0, 0])
    qh = np.asarray(sh.num_conc[0, 0])
    # blob started at (0.5, 0.75) of the domain; after half a turn it should
    # be at (0.5, 0.25)
    jmax, imax = np.unravel_index(np.argmax(qh), qh.shape)
    assert abs(imax - 24) <= 2 and abs(jmax - 12) <= 2, (imax, jmax)


@pytest.mark.slow
def test_acoustic_core_stable_at_rest():
    """Atmosphere at rest stays at rest (no spurious modes)."""
    cfg = Config(domain=DomainConfig(nx=16, ny=16, nz=8, dx=2000.0, dy=2000.0),
                 dynamics=DynamicsConfig(dt=10.0, n_sound=4))
    grid = make_grid(cfg)
    from wrf_partmc_tpu.models.dycore.state import zero_dycore_state
    s0 = zero_dycore_state(cfg, grid)
    sf = _run(s0, grid, cfg, 50)
    assert float(jnp.max(jnp.abs(sf.u))) < 1e-4
    assert float(jnp.max(jnp.abs(sf.w))) < 1e-4
    assert float(jnp.max(jnp.abs(sf.p_p))) < 1.0


@pytest.mark.slow
def test_warm_bubble_rises():
    cfg = Config(domain=DomainConfig(nx=20, ny=20, nz=10, dx=1000.0, dy=1000.0,
                                     ztop=10000.0),
                 dynamics=DynamicsConfig(dt=5.0, n_sound=6))
    grid = make_grid(cfg)
    s0 = init_warm_bubble(cfg, grid, d_theta=2.0)
    sf = _run(s0, grid, cfg, 60)      # 5 minutes
    w = np.asarray(sf.w)
    # updraft formed over the bubble, fields stay bounded
    assert w.max() > 0.1, w.max()
    assert np.isfinite(w).all()
    assert np.abs(np.asarray(sf.theta_p)).max() < 5.0
    assert np.abs(w).max() < 30.0
    # theta perturbation rises: center of theta' mass above initial height
    th0 = np.asarray(s0.theta_p)
    thf = np.clip(np.asarray(sf.theta_p), 0, None)
    z = np.asarray(grid.z_half)[:, None, None]
    zc0 = (th0 * z).sum() / th0.sum()
    zcf = (thf * z).sum() / thf.sum()
    assert zcf > zc0 + 50.0, (zc0, zcf)


@pytest.mark.slow
def test_energy_bounded_with_random_noise():
    """Random initial noise does not blow up (acoustic damping working)."""
    cfg = Config(domain=DomainConfig(nx=16, ny=16, nz=8, dx=2000.0, dy=2000.0),
                 dynamics=DynamicsConfig(dt=10.0, n_sound=4, smdiv=0.1, epssm=0.1))
    grid = make_grid(cfg)
    from wrf_partmc_tpu.models.dycore.state import zero_dycore_state
    s0 = zero_dycore_state(cfg, grid)
    k = jax.random.key(0)
    import dataclasses
    s0 = dataclasses.replace(
        s0,
        u=0.5 * jax.random.normal(jax.random.fold_in(k, 0), s0.u.shape),
        theta_p=0.1 * jax.random.normal(jax.random.fold_in(k, 1), s0.theta_p.shape))
    sf = _run(s0, grid, cfg, 100)
    ke0 = float(jnp.sum(s0.u ** 2 + s0.v ** 2))
    kef = float(jnp.sum(sf.u ** 2 + sf.v ** 2 + sf.w[:-1] ** 2))
    assert np.isfinite(kef)
    assert kef < 10.0 * ke0


@pytest.mark.slow
def test_rayleigh_damping_suppresses_top_w():
    """damp_opt: upper-level implicit Rayleigh damping reduces |w| in the
    damping layer relative to the undamped run (module_damping_em)."""
    import dataclasses

    from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    def run(damp):
        cfg = Config(domain=DomainConfig(nx=16, ny=16, nz=12, dx=2000.0,
                                         dy=2000.0, ztop=12000.0),
                     dynamics=DynamicsConfig(dt=8.0, n_sound=4,
                                             damp_opt=3 if damp else 0,
                                             zdamp=4000.0, dampcoef=0.2))
        grid = make_grid(cfg)
        s = init_warm_bubble(cfg, grid)
        step = jax.jit(lambda x: solve_step(x, grid, cfg)[0])
        for _ in range(20):
            s = step(s)
        return np.asarray(s.w)

    w_free = run(False)
    w_damp = run(True)
    # top-third w amplitude reduced by the sponge
    assert np.abs(w_damp[-4:]).max() < np.abs(w_free[-4:]).max()
    assert np.isfinite(w_damp).all()

# ----------------------- 1.5-order TKE closure (km_opt=2) ------------------

@pytest.mark.slow
def test_tke_closure_shear_production_and_stability():
    """Sheared flow grows subgrid TKE; the derived K_h is positive and the
    dycore stays finite over several steps (module_diffusion_em km_opt=2)."""
    import dataclasses
    import numpy as np
    from wrf_partmc_tpu.config import DomainConfig, uniform_test_config
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform
    from wrf_partmc_tpu.models.dycore.solve import solve_step, tke_eddy_coeffs

    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=16, ny=16, nz=6, dx=2000.0, dy=2000.0,
                            ztop=3000.0))
    cfg = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, constant_velocity=False, diff_opt=2, km_opt=2))
    grid = make_grid(cfg)
    s = init_uniform(cfg, grid, 5.0, 0.0)
    # add horizontal shear: u varies with y
    shear = 8.0 * jnp.sin(2 * jnp.pi * jnp.arange(grid.ny) / grid.ny)
    s = dataclasses.replace(s, u=s.u + shear.reshape(1, -1, 1))
    e0 = float(s.tke.mean())
    step = jax.jit(lambda x: solve_step(x, grid, cfg))
    for _ in range(5):
        s, diag = step(s)
    assert np.all(np.isfinite(np.asarray(s.tke)))
    assert float(s.tke.mean()) > e0          # shear production
    km, kh, _, _ = tke_eddy_coeffs(s, grid, cfg)
    assert float(kh.min()) >= 0.0 and float(kh.max()) > float(km.mean()) * 0.5
    assert np.all(np.isfinite(np.asarray(diag.xkhh)))
    assert float(diag.xkhh.max()) > 0.0


@pytest.mark.slow
def test_tke_stable_stratification_suppresses_mixing():
    """With strong stable stratification and no shear, TKE decays toward the
    floor and the stability-limited length scale shrinks K."""
    import dataclasses
    import numpy as np
    from wrf_partmc_tpu.config import DomainConfig, uniform_test_config
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform
    from wrf_partmc_tpu.models.dycore.solve import tke_advance

    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=12, ny=12, nz=6, dx=2000.0, dy=2000.0,
                            ztop=3000.0))
    cfg = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, constant_velocity=False, diff_opt=2, km_opt=2))
    grid = make_grid(cfg)
    s = init_uniform(cfg, grid, 0.0, 0.0)
    # strongly stable: theta increases 10 K/km
    thp = 0.01 * grid.z_half.reshape(-1, 1, 1) * jnp.ones((1, grid.ny, grid.nx))
    s = dataclasses.replace(s, theta_p=thp.astype(jnp.float32),
                            tke=jnp.full_like(s.tke, 0.5))
    e1, kh = tke_advance(s, grid, cfg, cfg.dynamics.dt)
    assert float(e1.mean()) < 0.5            # buoyancy destruction + dissipation
    assert np.all(np.asarray(e1) >= cfg.dynamics.tke_seed - 1e-8)
