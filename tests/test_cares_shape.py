"""CARES-shaped end-to-end integration (VERDICT r4 item 6): a scaled copy
of the bench's synthetic em_real domain with the full CARES physics option
set — MYJ surface/PBL (2/2), RRTMG-class correlated-k SW+LW (4), Grell
cumulus (5), Morrison+graupel (10), Noah LSM (2), chem_opt=777 CBM-Z/MOSAIC
chemistry, spec+relax wrfbdy — running coupled steps with finite fields."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.slow
def test_cares_shape_scaled_runs_with_full_physics():
    from cares_shape import build_cares_shape

    step_fn, cs, cfg, grid = build_cares_shape(16, 14, 10, n_part=16,
                                               cap=32, dt=30.0,
                                               chem_on=True)
    # the CARES option set is actually selected
    d = cfg.dynamics
    assert (d.bl_physics, d.ra_physics, d.cu_physics, d.mp_physics,
            d.sf_surface_physics) == (2, 4, 5, 10, 2)
    assert cfg.partmc.partmc_chem_dt == 300.0
    assert cfg.n_moist == 10            # graupel family
    assert not cfg.boundary.periodic_x  # specified/relax lateral BCs

    step = jax.jit(step_fn)
    out = cs
    for _ in range(3):
        out = step(out)
    assert np.isfinite(np.asarray(out.dyn.theta_p)).all()
    assert np.isfinite(np.asarray(out.dyn.moist)).all()
    assert np.isfinite(np.asarray(out.gas)).all()
    assert float(out.aero.total_num().sum()) > 0.0
    assert out.pbl_q2 is not None       # MYJ TKE carried
    assert out.land.t_soil.shape[0] == 4    # Noah soil column


@pytest.mark.slow
def test_cares_restart_roundtrip_reproduces_direct_run(tmp_path):
    """Portable NetCDF restart for the CARES configuration (VERDICT r4
    item 4): NoahState (tsk/t_soil/smois/tbot/ivgtyp/isltyp), MYJ pbl_q2
    and the removal accumulators all round-trip, and a resumed step equals
    the direct continuation bitwise (same counter-based RNG stream).
    Reference: ``share/wrf_restartin.F``, ``wrf_pmc_init.F90:1084-1286``."""
    import dataclasses

    from cares_shape import build_cares_shape
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.utils.io import (read_restart_netcdf,
                                         write_restart_netcdf)

    step_fn, cs, cfg, grid = build_cares_shape(12, 10, 8, n_part=12,
                                               cap=24, dt=30.0,
                                               chem_on=True)
    ad = make_aero_data()
    step = jax.jit(step_fn)
    out = step(step(cs))

    path = str(tmp_path / "cares_restart.nc")
    write_restart_netcdf(path, out, ad, grid)

    # read into a fresh template shaped like the initial state
    back = read_restart_netcdf(path, cs, ad)

    # full physics state round-trips (the r4 portable restart crashed on
    # NoahState and silently dropped pbl_q2 / removals)
    np.testing.assert_allclose(np.asarray(back.land.tsk),
                               np.asarray(out.land.tsk), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.land.t_soil),
                               np.asarray(out.land.t_soil), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.land.smois),
                               np.asarray(out.land.smois), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.land.ivgtyp),
                                  np.asarray(out.land.ivgtyp))
    np.testing.assert_array_equal(np.asarray(back.land.isltyp),
                                  np.asarray(out.land.isltyp))
    np.testing.assert_allclose(np.asarray(back.pbl_q2),
                               np.asarray(out.pbl_q2), rtol=1e-6)
    assert int(back.step) == int(out.step)
    np.testing.assert_array_equal(np.asarray(back.aero.num),
                                  np.asarray(out.aero.num))

    # resumed step == direct continuation (f32 state round-trips bitwise
    # through the f32 NetCDF, RNG keyed on the step counter)
    direct = step(out)
    resumed = step(back)
    np.testing.assert_allclose(np.asarray(resumed.dyn.theta_p),
                               np.asarray(direct.dyn.theta_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(resumed.aero.total_num()),
                               np.asarray(direct.aero.total_num()),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(resumed.land.tsk),
                               np.asarray(direct.land.tsk), atol=1e-5)


@pytest.mark.slow
def test_cares_open_boundary_stability_long_run():
    """Regression (r5): without MU/PH boundary forcing, mass reflected at
    the open lateral boundaries e-folded every ~2 steps and the CARES
    configuration went NaN by step 16 — the 5-step smoke runs never saw it.
    With the full wrfbdy variable set (U/V/T/MU/PH/QVAPOR/chem, the
    reference's share/wrf_bdyin.F contract) the run must stay finite with
    bounded surface-pressure perturbation over 40 steps."""
    from cares_shape import build_cares_shape

    step_fn, cs, cfg, grid = build_cares_shape(14, 12, 10, n_part=10,
                                               cap=24, dt=30.0,
                                               chem_on=False)
    step = jax.jit(step_fn, donate_argnums=0)
    out = cs
    for _ in range(40):
        out = step(out)
    out = jax.block_until_ready(out)
    assert bool(jnp.isfinite(out.dyn.theta_p).all())
    assert bool(jnp.isfinite(out.dyn.w).all())
    mu = np.asarray(out.dyn.mu)
    assert np.abs(mu).max() < 3000.0, np.abs(mu).max()   # < 30 hPa
    assert float(out.aero.total_num().sum()) > 0.0
