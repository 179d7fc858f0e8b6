"""Removal bookkeeping (record_removals / aero_info_array equivalent,
``Registry/registry.partmc``, ``wrf_pmc_driver.F90:251``): per-cell
represented-number removal counters by cause, surfaced in history output."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import DomainConfig, PartmcConfig, uniform_test_config
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.coupled.driver import coupled_step, init_coupled
from wrf_partmc_tpu.models.coupled.init import populate_from_number_field
from wrf_partmc_tpu.models.dycore.ideal import init_uniform
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.models.partmc.dist import make_mode
from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
from wrf_partmc_tpu.utils import rng

AD = make_aero_data()
GD = make_gas_data()


@pytest.mark.slow
def test_removal_counters_accumulate_and_written(tmp_path):
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=4, ny=4, nz=3, dx=2000.0, dy=2000.0,
                            ztop=300.0),
        partmc=PartmcConfig(num_particles=32, max_particles=96,
                            partmc_chem_dt=20.0, do_coagulation=True,
                            do_emission=False, do_deposition=True,
                            do_transport=False, allow_doubling=False,
                            record_removals=True),
    )
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, 5.0, 0.0)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 5e9)   # dense -> coag active
    # 50-um particles settle at ~7 cm/s: the per-step surface removal
    # probability is large enough that the stochastic counter is
    # deterministic-ish over 6 steps
    aero = populate_from_number_field(AD, cfg, grid, conc,
                                      jax.random.key(0), diam=5e-5)
    cs = dataclasses.replace(cs, aero=aero)
    assert cs.removals is not None

    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    key = rng.base_key(3)
    step = jax.jit(lambda c: coupled_step(c, grid, cfg, AD, GD, scn, exch,
                                          key))
    n0 = float(cs.aero.total_num().sum())
    for _ in range(6):
        cs = step(cs)
    dep = np.asarray(cs.removals["deposition"])
    coag = np.asarray(cs.removals["coag"])
    # deposition removes only from the surface layer, every step
    assert dep[0].sum() > 0.0
    assert (dep[1:] == 0.0).all()
    # coagulation number loss recorded on chem steps
    assert coag.sum() > 0.0
    # number balance: removals account for the population decrease
    n1 = float(cs.aero.total_num().sum())
    removed = sum(float(np.asarray(v).sum()) for v in cs.removals.values())
    np.testing.assert_allclose(n0 - n1, removed, rtol=0.2)

    # counters land in the history file
    from wrf_partmc_tpu.utils.io import write_history
    p = str(tmp_path / "hist.nc")
    write_history(p, cs, grid, cfg)
    from scipy.io import netcdf_file
    with netcdf_file(p, "r") as f:
        assert "removed_num_deposition" in f.variables
        assert float(np.asarray(f.variables["removed_num_coag"][:]).sum()) > 0


def test_per_particle_coag_removal_records(tmp_path):
    """aero_info_array equivalent: (removed_id, action=coag, other_id)
    per coagulation removal, with ids consistent against the before/after
    populations (partner tracing, ``wrf_pmc_driver.F90:251``)."""
    from wrf_partmc_tpu.models.partmc import coag
    from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
    from wrf_partmc_tpu.models.partmc.env_state import make_env_state

    env = make_env_state(temp=293.15, pressure=1.0e5, rel_humid=0.5,
                         cell_volume=1.0e-12)         # tiny cell -> fast coag
    st = zero_state(AD, 64)
    n = 48
    vol = np.zeros((AD.n_spec, n), np.float32)
    vol[0] = 4.2e-21 * (1.0 + np.arange(n))
    st = add_particles(st, jnp.asarray(vol), jnp.full((n,), 7.0),
                       jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))

    before_ids = set(np.asarray(st.pid)[np.asarray(st.num) > 0].tolist())
    out, ev = jax.jit(lambda s: coag.coag_step(
        s, AD, env, 1.0e5, jax.random.key(5), kernel=coag.KERNEL_CONSTANT,
        return_events=True))(st)
    rid = np.asarray(ev["removed_id"])
    oid = np.asarray(ev["other_id"])
    sel = rid >= 0
    assert sel.sum() > 0, "constant kernel in a 1e-9 m3 cell must coagulate"
    after_alive = set(np.asarray(out.pid)[np.asarray(out.num) > 0].tolist())
    for r, o in zip(rid[sel], oid[sel]):
        assert r in before_ids          # removed particle existed
        assert o in before_ids          # partner existed
        assert r not in after_alive     # and the removed one is gone
        assert o in after_alive         # while the partner survives
    # every id that died this step is accounted for by a record
    died = before_ids - after_alive
    assert died == set(rid[sel].tolist())

    # the runner-side stream write round-trips
    from wrf_partmc_tpu.utils.io import write_aero_removed
    rows = np.stack([np.zeros(sel.sum(), int), np.zeros(sel.sum(), int),
                     rid[sel], oid[sel]], axis=1)
    p = str(tmp_path / "aero_removed.nc")
    write_aero_removed(p, [rows])
    from scipy.io import netcdf_file
    with netcdf_file(p, "r", mmap=False) as f:
        assert int(f.n_events) == int(sel.sum())
        np.testing.assert_array_equal(
            np.asarray(f.variables["aero_removed_removed_id"][:]), rid[sel])


@pytest.mark.slow
def test_record_aero_info_through_coupled_step():
    """cfg.partmc.record_aero_info surfaces the per-particle records via
    coupled_step(diag_out=True) on chem steps."""
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=4, ny=4, nz=3, dx=2000.0, dy=2000.0,
                            ztop=300.0),
        partmc=PartmcConfig(num_particles=32, max_particles=96,
                            partmc_chem_dt=20.0, do_coagulation=True,
                            do_emission=False, do_deposition=False,
                            do_transport=False, allow_doubling=False,
                            record_aero_info=True),
    )
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, 5.0, 0.0)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 5e11)
    aero = populate_from_number_field(AD, cfg, grid, conc,
                                      jax.random.key(0), diam=5e-5)
    cs = dataclasses.replace(cs, aero=aero)
    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    scn = constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    key = rng.base_key(3)
    step = jax.jit(lambda c: coupled_step(c, grid, cfg, AD, GD, scn, exch,
                                          key, diag_out=True))
    total = 0
    for _ in range(4):
        cs, td = step(cs)
        assert "coag_removed_id" in td
        rid = np.asarray(td["coag_removed_id"])
        assert rid.shape == (grid.nz, grid.ny, grid.nx,
                             cfg.partmc.max_particles // 2)
        total += int((rid >= 0).sum())
    assert total > 0
