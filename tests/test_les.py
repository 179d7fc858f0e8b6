"""em_les-grade LES: NBA1 nonlinear subfilter stress (module_sfs_nba.F /
Kosovic 1997 equivalent, sfs_opt=1) + a convective LES mini-case
(VERDICT r3 missing #6 / BASELINE config 3)."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.physics.sfs_nba import nba_stress_tendencies


def _cfg(nx=16, ny=16, nz=16, dx=50.0, ztop=800.0, dt=0.5, **dyn):
    return Config(domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx,
                                      ztop=ztop),
                  dynamics=DynamicsConfig(dt=dt, n_sound=4, dyn_opt="arw",
                                          damp_opt=1, zdamp=200.0, **dyn))


def test_nba_normal_stress_anisotropy_under_pure_shear():
    """Under pure vertical shear the linear (Smagorinsky) stress has zero
    normal components; NBA's quadratic terms produce the normal-stress
    anisotropy tau_11 != 0 that defines the model (Kosovic 1997)."""
    cfg = _cfg()
    grid = make_grid(cfg)
    shear = 0.01                      # du/dz [1/s]
    z = np.asarray(grid.z_half)
    u = jnp.broadcast_to((shear * z).reshape(-1, 1, 1),
                         (grid.nz, grid.ny, grid.nx))
    v = jnp.zeros_like(u)
    w = jnp.zeros_like(u)
    (_du, _dv, _dw), (t11, t12, t13, t22, t23, t33) = nba_stress_tendencies(
        u, v, w, grid, "periodic", "periodic", return_stress=True)
    mid = slice(4, -4)
    t11m = float(jnp.mean(t11[mid]))
    t13m = float(jnp.mean(t13[mid]))
    # eddy-viscosity part: downgradient momentum flux tau_13 < 0
    assert t13m < 0.0
    # nonlinear part: nonzero normal stress (zero in any linear closure)
    assert abs(t11m) > 1e-12
    # magnitude ordering: |tau_11| < |tau_13| for weak shear
    assert abs(t11m) < abs(t13m)
    # homogeneous shear -> zero stress divergence in the interior
    assert float(jnp.abs(_du[mid, 4:-4, 4:-4]).max()) < 1e-8


@pytest.mark.slow
def test_les_convective_case_stable_with_nba():
    """em_les-style convective mini-LES at dx=50 m: resolved convection
    develops from a heated surface layer and the run stays finite with the
    NBA closure + TKE diffusion."""
    from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble_arw
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    # dx=50 m needs dt <= ~0.25 s for the explicit horizontal
    # acoustic substeps (c dtau/dx < 0.7)
    cfg = _cfg(sfs_opt=1, diff_opt=2, km_opt=2, dt=0.25)
    grid = make_grid(cfg)
    s = init_warm_bubble_arw(cfg, grid, d_theta=1.0, z_center=150.0,
                             z_radius=120.0)
    # random near-surface theta perturbations seed resolved convection
    kk = jax.random.normal(jax.random.key(0),
                           (2, grid.ny, grid.nx)) * 0.2
    thp = s.theta_p.at[:2].add(kk)
    s = dataclasses.replace(s, theta_p=thp)

    def body(st, _):
        s2, _d = solve_step(st, grid, cfg)
        return s2, None

    out, _ = jax.jit(lambda st: jax.lax.scan(body, st, None, length=200))(s)
    assert bool(jnp.isfinite(out.w).all())
    assert bool(jnp.isfinite(out.theta_p).all())
    w = np.asarray(out.w)
    assert np.abs(w).max() < 20.0
    # resolved convection developed (nonzero vertical velocity variance)
    assert w.std() > 0.05, w.std()
