"""Input tooling roundtrips (make_ics / make_bcs / make_emissions equiv)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import DomainConfig, uniform_test_config
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.coupled.init import populate_from_dist
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.dist import AeroDist, dist_number_conc
from wrf_partmc_tpu.tools.make_inputs import (read_bcs, read_emissions,
                                              read_ics, write_bcs,
                                              write_emissions, write_ics)

AD = make_aero_data()
S = AD.n_spec


def _per_level_dist(nz, M=2):
    rng = np.random.default_rng(0)
    vf = rng.random((nz, M, S)).astype(np.float32)
    vf /= vf.sum(-1, keepdims=True)
    return AeroDist(
        num_conc=jnp.asarray(1e9 * rng.random((nz, M)), jnp.float32),
        geom_mean_diam=jnp.asarray(1e-7 * (1 + rng.random((nz, M))), jnp.float32),
        log_geom_std=jnp.asarray(0.5 * rng.random((nz, M)), jnp.float32),
        vol_frac=jnp.asarray(vf),
        source=jnp.arange(M, dtype=jnp.int32),
        w_class=jnp.zeros(M, jnp.int32))


@pytest.mark.slow
def test_ics_roundtrip_and_sampling(tmp_path):
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=5, nz=4))
    grid = make_grid(cfg)
    dist = _per_level_dist(grid.nz)
    p = str(tmp_path / "ics.nc")
    write_ics(p, dist, grid)
    d2 = read_ics(p)
    for a, b in zip(jax.tree.leaves(dist), jax.tree.leaves(d2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # per-level dist broadcasts into a full-domain population
    dist3d = jax.tree.map(
        lambda a: (jnp.broadcast_to(a[:, None, None], (grid.nz, grid.ny, grid.nx) + a.shape[1:])
                   if a.ndim >= 2 and a.shape[0] == grid.nz else a), d2)
    st = populate_from_dist(AD, cfg, grid, dist3d, jax.random.key(0), n_per_cell=16)
    want = np.broadcast_to(
        np.asarray(dist_number_conc(dist))[:, None, None]
        * np.asarray(grid.cell_volume)[:, None, None],
        (grid.nz, grid.ny, grid.nx))
    np.testing.assert_allclose(np.asarray(st.total_num()), want, rtol=1e-3)


def test_emissions_roundtrip(tmp_path):
    times = np.array([0.0, 3600.0, 7200.0])
    M, G = 2, 8
    dist = AeroDist(
        num_conc=jnp.ones((3, M)) * 1e5,
        geom_mean_diam=jnp.full((3, M), 5e-8),
        log_geom_std=jnp.full((3, M), 0.5),
        vol_frac=jnp.ones((3, M, S)) / S,
        source=jnp.zeros(M, jnp.int32), w_class=jnp.zeros(M, jnp.int32))
    gas = np.ones((3, G), np.float32) * 0.01
    p = str(tmp_path / "emit.nc")
    write_emissions(p, times, dist, gas)
    t2, d2, g2 = read_emissions(p)
    np.testing.assert_allclose(np.asarray(t2), times)
    np.testing.assert_allclose(np.asarray(d2.num_conc), 1e5, rtol=1e-6)
    assert g2.shape == (3, G)


def test_bcs_roundtrip(tmp_path):
    times = np.array([0.0, 21600.0])
    M, G, nz = 1, 8, 5
    dist = AeroDist(
        num_conc=jnp.ones((2, nz, M)) * 1e8,
        geom_mean_diam=jnp.full((2, nz, M), 1e-7),
        log_geom_std=jnp.full((2, nz, M), 0.47),
        vol_frac=jnp.ones((2, nz, M, S)) / S,
        source=jnp.zeros(M, jnp.int32), w_class=jnp.zeros(M, jnp.int32))
    gas = np.zeros((2, nz, G), np.float32)
    p = str(tmp_path / "bcs.nc")
    write_bcs(p, times, dist, gas, np.array([1e-4, 2e-4]))
    t2, d2, g2, dil = read_bcs(p)
    np.testing.assert_allclose(np.asarray(dil), [1e-4, 2e-4], rtol=1e-6)
    assert d2.num_conc.shape == (2, nz, M)


@pytest.mark.slow
def test_file_driven_init_end_to_end(tmp_path):
    """init_from_files + runner: the real-data init branch of
    init_wrf_partmc (ICs sampled, emission series live, BC background by
    time slab) drives a short coupled run."""
    import dataclasses

    import wrf_partmc_tpu.run as R
    from wrf_partmc_tpu.config import PartmcConfig, TimeControlConfig
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data

    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=5, nz=4, dx=2000.0, dy=2000.0),
        partmc=PartmcConfig(num_particles=8, max_particles=32,
                            n_emit_slots=4, do_coagulation=False,
                            do_emission=True, do_deposition=False,
                            do_transport=True),
        time_control=TimeControlConfig(run_seconds=30.0,
                                       history_interval_s=1e9,
                                       auxhist2_interval_s=1e9,
                                       restart_interval_s=1e9))
    grid = make_grid(cfg)
    G = make_gas_data().n_spec

    ic = _per_level_dist(grid.nz)
    p_ic = str(tmp_path / "ics.nc")
    write_ics(p_ic, ic, grid)

    times = np.array([0.0, 3600.0])
    M = 2
    edist = AeroDist(num_conc=jnp.ones((2, M)) * 1e4,
                     geom_mean_diam=jnp.full((2, M), 5e-8),
                     log_geom_std=jnp.full((2, M), 0.5),
                     vol_frac=jnp.ones((2, M, S)) / S,
                     source=jnp.zeros(M, jnp.int32),
                     w_class=jnp.zeros(M, jnp.int32))
    p_em = str(tmp_path / "emit.nc")
    write_emissions(p_em, times, edist, np.full((2, G), 1e-3, np.float32))

    bdist = AeroDist(num_conc=jnp.ones((2, grid.nz, 1)) * 1e7,
                     geom_mean_diam=jnp.full((2, grid.nz, 1), 1e-7),
                     log_geom_std=jnp.full((2, grid.nz, 1), 0.47),
                     vol_frac=jnp.ones((2, grid.nz, 1, S)) / S,
                     source=jnp.zeros(1, jnp.int32),
                     w_class=jnp.zeros(1, jnp.int32))
    p_bc = str(tmp_path / "bcs.nc")
    write_bcs(p_bc, np.array([0.0, 21600.0]), bdist,
              np.zeros((2, grid.nz, G), np.float32), np.array([1e-5, 1e-5]))

    cs, _ = R.run(cfg, "uniform", str(tmp_path / "out"), verbose=False,
                  input_files={"ics": p_ic, "emissions": p_em, "bcs": p_bc})
    tot = np.asarray(cs.aero.total_num())
    assert np.all(np.isfinite(tot)) and tot.sum() > 0
    # IC sampling: initial represented number matches the per-level dist
    want0 = (np.asarray(dist_number_conc(ic))[:, None, None]
             * np.asarray(grid.cell_volume)[:, None, None])
    assert 0.2 < tot.mean() / want0.mean() < 5.0
