"""Optics and Kessler microphysics validation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble
from wrf_partmc_tpu.models.dycore.solve import solve_step
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
from wrf_partmc_tpu.models.partmc.dist import make_mode, sample_particles
from wrf_partmc_tpu.models.partmc.optics import (adt_efficiencies,
                                                 bulk_optical_props,
                                                 particle_refractive_index)

AD = make_aero_data()


def _pop(spec="SO4", n=64, conc=1e10, gmd=2e-7, cell_shape=(2, 3, 3)):
    vf = np.zeros(AD.n_spec)
    vf[AD.spec_by_name(spec)] = 1.0
    st = zero_state(AD, 96, cell_shape)
    vol, num, src, wcl = sample_particles(
        jax.random.key(0), make_mode(conc, gmd, 1.6, vf), AD, n, 1.0, cell_shape)
    return add_particles(st, vol, num, src, wcl)


def test_adt_limits():
    # large absorbing particle -> Q_ext ~ 2 (extinction paradox)
    q_ext, q_abs = adt_efficiencies(jnp.asarray(2e-5), 1.5, 0.1, 5.5e-7)
    assert 1.6 < float(q_ext) < 2.6
    assert float(q_abs) > 0.8
    # tiny particle -> Q_ext ~ 0
    q_ext_s, _ = adt_efficiencies(jnp.asarray(5e-9), 1.45, 0.0, 5.5e-7)
    assert float(q_ext_s) < 0.05


def test_refractive_index_mixing():
    st_bc = _pop("BC", cell_shape=())
    n, k = particle_refractive_index(st_bc, AD)
    alive = np.asarray(st_bc.alive)
    np.testing.assert_allclose(np.asarray(n)[alive], 1.82, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(k)[alive], 0.74, rtol=1e-3)
    st_so4 = _pop("SO4", cell_shape=())
    n2, k2 = particle_refractive_index(st_so4, AD)
    np.testing.assert_allclose(np.asarray(k2)[np.asarray(st_so4.alive)], 0.0,
                               atol=1e-6)


def test_bulk_optics_physical():
    st = _pop("SO4")
    dz = jnp.full((2,), 500.0)
    bo = bulk_optical_props(st, AD, dz, 1.0)
    tau = np.asarray(bo.tauaer)
    w0 = np.asarray(bo.waer)
    g = np.asarray(bo.gaer)
    assert tau.shape[0] == 4 and np.all(tau >= 0)
    assert np.all((w0 >= 0) & (w0 <= 1.0 + 1e-6))
    assert np.all((g >= 0) & (g <= 0.95))
    # pure sulfate scatters (ssa ~ 1); BC absorbs (ssa < 0.7)
    assert w0.mean() > 0.9
    st_bc = _pop("BC")
    w_bc = np.asarray(bulk_optical_props(st_bc, AD, dz, 1.0).waer)
    assert w_bc.mean() < 0.75


def test_kessler_conserves_water_and_heats():
    cfg = Config(domain=DomainConfig(nx=8, ny=8, nz=8, dx=1000.0, ztop=8000.0),
                 dynamics=DynamicsConfig(dt=5.0, n_sound=4, mp_physics=1))
    grid = make_grid(cfg)
    s0 = init_warm_bubble(cfg, grid, d_theta=3.0)
    # moisten the lower levels near saturation
    qv = jnp.zeros((grid.nz, grid.ny, grid.nx)).at[:4].set(0.015)
    s0 = dataclasses.replace(s0, moist=s0.moist.at[0].set(qv))

    def step(s, _):
        s2, _d = solve_step(s, grid, cfg)
        return s2, None

    sf, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=60))(s0)
    qv1, qc1, qr1 = (np.asarray(sf.moist[i]) for i in range(3))
    assert qc1.min() >= -1e-7 and qr1.min() >= -1e-7 and qv1.min() >= -1e-6
    # condensation happened somewhere and released heat
    assert qc1.max() + qr1.max() > 1e-5
    assert np.isfinite(np.asarray(sf.theta_p)).all()
    # total water only decreases via rain reaching the ground
    tw0 = float((s0.moist.sum(axis=0) / np.asarray(grid.dz).reshape(-1, 1, 1)[0]).sum())
    dzc = np.asarray(grid.dz).reshape(-1, 1, 1)
    tw0 = float((np.asarray(s0.moist).sum(axis=0) * dzc).sum())
    tw1 = float((np.asarray(sf.moist).sum(axis=0) * dzc).sum())
    assert tw1 <= tw0 * 1.02
