"""Mass-coordinate (ARW) dynamical core: well-balancedness over terrain,
buoyant convection, exact mass conservation, and scalar-continuity
consistency — the VERDICT r1 'full dynamics' gates (warm bubble + density
current over a terrain hill stay stable; uniform scalar stays uniform)."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu import constants as c
from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.arw import diagnose, solve_step_arw
from wrf_partmc_tpu.models.dycore.ideal import (arw_rest_state, hill_terrain,
                                                init_density_current_arw,
                                                init_warm_bubble_arw)
from wrf_partmc_tpu.models.dycore.solve import solve_step


def _cfg(nx=24, ny=24, nz=12, dx=2000.0, ztop=12000.0, dt=8.0, n_sound=4,
         **dyn):
    return Config(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, ztop=ztop),
        dynamics=DynamicsConfig(dt=dt, n_sound=n_sound, dyn_opt="arw",
                                damp_opt=1, zdamp=3000.0, **dyn),
    )


def _run(state, grid, cfg, n):
    def body(s, _):
        s2, _d = solve_step(s, grid, cfg)
        return s2, None

    out, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(state)
    return out


def test_base_state_eos_consistency():
    """The discrete base state is an exact EOS fixed point: at rest with
    mu'=phi'=theta'=0, the diagnosed p equals the stored base pressure."""
    cfg = _cfg(nx=8, ny=8)
    hgt = hill_terrain(cfg, h0=500.0)
    grid = make_grid(cfg, hgt=hgt)
    s = arw_rest_state(cfg, grid)
    _, _, alpha_d, p, _, _, _ = diagnose(s, grid)
    np.testing.assert_allclose(np.asarray(p), np.asarray(grid.pb3),
                               rtol=3e-5)
    np.testing.assert_allclose(np.asarray(alpha_d), np.asarray(grid.alb),
                               rtol=3e-5)


@pytest.mark.slow
def test_rest_over_hill_stays_balanced():
    """Atmosphere at rest over a 400 m hill: the terrain metric terms in the
    PGF must cancel the along-eta pressure gradient — spurious winds stay
    small over 60 steps (the well-balancedness gate for terrain dynamics)."""
    cfg = _cfg(nx=24, ny=24, nz=12, dt=8.0)
    hgt = hill_terrain(cfg, h0=400.0, half_width_frac=0.12)
    grid = make_grid(cfg, hgt=hgt)
    s = arw_rest_state(cfg, grid)
    out = _run(s, grid, cfg, 60)
    assert bool(jnp.isfinite(out.w).all())
    assert float(jnp.abs(out.w).max()) < 0.15, float(jnp.abs(out.w).max())
    assert float(jnp.abs(out.u).max()) < 0.5
    assert float(jnp.abs(out.theta_p).max()) < 0.1
    # column mass conserved globally (periodic)
    np.testing.assert_allclose(float(out.mu.sum()), 0.0,
                               atol=1e-2 * grid.ny * grid.nx)


@pytest.mark.slow
def test_warm_bubble_rises_arw():
    cfg = _cfg(nx=20, ny=20, nz=16, dx=1000.0, ztop=8000.0, dt=4.0,
               n_sound=6)
    grid = make_grid(cfg)
    s = init_warm_bubble_arw(cfg, grid, d_theta=3.0, z_center=1500.0,
                             z_radius=800.0)
    zc0 = _theta_height(s, grid)
    out = _run(s, grid, cfg, 80)
    assert bool(jnp.isfinite(out.w).all())
    assert float(out.w.max()) > 0.5          # updraft developed
    zc1 = _theta_height(out, grid)
    assert zc1 > zc0 + 150.0, (zc0, zc1)     # thermal rose


def _theta_height(s, grid):
    thp = jnp.maximum(s.theta_p, 0.0)
    zc = 0.5 * (grid.phb + s.ph)[0:-1] / c.GRAV if False else None
    z = (0.5 * ((grid.phb + s.ph)[1:] + (grid.phb + s.ph)[:-1]) / c.GRAV)
    w = thp / jnp.maximum(thp.sum(), 1e-6)
    return float((w * z).sum())


@pytest.mark.slow
def test_density_current_over_hill_stable():
    """Cold blob collapsing over a hill: stays finite, cold air reaches the
    surface layer and spreads horizontally (VERDICT gate: 'warm bubble +
    density current over a terrain hill stay stable')."""
    cfg = _cfg(nx=32, ny=8, nz=16, dx=1000.0, ztop=8000.0, dt=4.0, n_sound=6)
    hgt = hill_terrain(cfg, h0=300.0, half_width_frac=0.1, ridge=True)
    grid = make_grid(cfg, hgt=hgt)
    s = init_density_current_arw(cfg, grid, d_theta=-6.0, z_center=3000.0,
                                 z_radius=1200.0, radius_frac=0.08)
    out = _run(s, grid, cfg, 100)
    assert bool(jnp.isfinite(out.w).all())
    assert bool(jnp.isfinite(out.theta_p).all())
    assert float(jnp.abs(out.w).max()) < 50.0          # no blow-up
    thp = np.asarray(out.theta_p)
    # cold air arrived in the lowest quarter of the column
    assert thp[:4].min() < -0.5
    # and spread: cold surface area larger than the initial footprint
    cold0 = (np.asarray(s.theta_p) < -0.5).sum()
    cold1 = (thp < -0.5).sum()
    assert cold1 > 0.3 * cold0


@pytest.mark.slow
def test_uniform_scalar_stays_uniform_with_terrain():
    """Discrete scalar-continuity consistency: with live dynamics over
    terrain (mu evolving), a uniform mixing ratio advected with the
    acoustic-averaged fluxes stays uniform to near-roundoff."""
    cfg = _cfg(nx=16, ny=16, nz=10, dt=8.0)
    hgt = hill_terrain(cfg, h0=300.0)
    grid = make_grid(cfg, hgt=hgt)
    s = init_warm_bubble_arw(cfg, grid, d_theta=2.0)   # drives real motion
    s = dataclasses.replace(s, chem=jnp.ones_like(s.chem))
    out = _run(s, grid, cfg, 30)
    chem = np.asarray(out.chem)
    np.testing.assert_allclose(chem, 1.0, atol=5e-4)


@pytest.mark.slow
def test_mu_exactly_conserved():
    cfg = _cfg(nx=16, ny=16, nz=10)
    grid = make_grid(cfg)
    s = init_warm_bubble_arw(cfg, grid, d_theta=3.0)
    out = _run(s, grid, cfg, 40)
    # periodic domain: total dry mass conserved to f32 roundoff
    tot0 = float((grid.mub + s.mu).sum())
    tot1 = float((grid.mub + out.mu).sum())
    np.testing.assert_allclose(tot1, tot0, rtol=1e-6)


def _periodic_msft(cfg, amp=0.06):
    """Smooth periodic map-factor field (synthetic; real Lambert msft is not
    periodic, but this exercises every m code path under periodic BCs)."""
    j = np.arange(cfg.domain.ny)
    i = np.arange(cfg.domain.nx)
    return (1.0 + amp * np.cos(2 * np.pi * j / cfg.domain.ny)[:, None]
            * np.cos(2 * np.pi * i / cfg.domain.nx)[None, :])


@pytest.mark.slow
def test_rest_balanced_with_map_factors():
    """VERDICT r3 item 2: a projected (m != 1) domain with terrain holds a
    balanced rest state — the map-factor metric terms must not excite
    spurious winds."""
    cfg = _cfg(nx=24, ny=24, nz=12, dt=8.0)
    hgt = hill_terrain(cfg, h0=400.0, half_width_frac=0.12)
    grid = make_grid(cfg, hgt=hgt, msft=_periodic_msft(cfg))
    s = arw_rest_state(cfg, grid)
    out = _run(s, grid, cfg, 60)
    assert bool(jnp.isfinite(out.w).all())
    assert float(jnp.abs(out.w).max()) < 0.15
    assert float(jnp.abs(out.u).max()) < 0.5
    assert float(jnp.abs(out.theta_p).max()) < 0.1


@pytest.mark.slow
def test_uniform_scalar_and_dry_mass_with_map_factors():
    """Scalar-continuity consistency on a projection: with live dynamics and
    m != 1, a uniform mixing ratio stays uniform (the m^2 factors on scalar
    divergence and continuity must agree exactly) and total dry mass
    sum(mu / m^2) is conserved."""
    cfg = _cfg(nx=16, ny=16, nz=10, dt=8.0)
    hgt = hill_terrain(cfg, h0=300.0)
    msft = _periodic_msft(cfg)
    grid = make_grid(cfg, hgt=hgt, msft=msft)
    s = init_warm_bubble_arw(cfg, grid, d_theta=2.0)
    s = dataclasses.replace(s, chem=jnp.ones_like(s.chem))
    out = _run(s, grid, cfg, 30)
    np.testing.assert_allclose(np.asarray(out.chem), 1.0, atol=5e-4)
    w = 1.0 / msft ** 2
    tot0 = float((np.asarray(grid.mub + s.mu) * w).sum())
    tot1 = float((np.asarray(grid.mub + out.mu) * w).sum())
    np.testing.assert_allclose(tot1, tot0, rtol=1e-6)


@pytest.mark.slow
def test_constant_map_factor_scales_advection_speed():
    """With m = 2 everywhere, grid spacing represents half the true
    distance, so a blob advected by the captured fluxes crosses cells twice
    as fast as with m = 1 (frozen uniform wind)."""
    from wrf_partmc_tpu.models.dycore.ideal import init_uniform

    def com_x(f):
        w = f.sum(axis=(0, 1))
        return float((w * np.arange(f.shape[2])).sum() / w.sum())

    shifts = {}
    for mval in (1.0, 2.0):
        cfg = _cfg(nx=32, ny=8, nz=4, dx=2000.0, ztop=4000.0, dt=10.0,
                   constant_velocity=True)
        grid = make_grid(cfg, msft=np.full((8, 32), mval))
        s = init_uniform(cfg, grid, u0=10.0, v0=0.0, blob_conc=1e9)
        out = _run(s, grid, cfg, 20)
        shifts[mval] = (com_x(np.asarray(out.num_conc[0]))
                        - com_x(np.asarray(s.num_conc[0])))
    # m=1: 20 steps * 10 m/s * 10 s / 2000 m = 1 cell; m=2: 2 cells
    np.testing.assert_allclose(shifts[1.0], 1.0, atol=0.2)
    np.testing.assert_allclose(shifts[2.0], 2.0, atol=0.3)
