"""LANDUSE/VEGPARM/SOILPARM-class physics tables (the ``WRFV3/run/`` table
role) and their consumption by the Noah-class LSM: category maps change
surface energy balance and soil hydrology in the physically expected
directions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.models.physics import lsm
from wrf_partmc_tpu.models.physics.landuse import (
    STAS_SOIL, USGS_LANDUSE, landuse_params, noah_params, soil_params)


def test_table_shapes_and_lookup():
    assert len(USGS_LANDUSE) == 24
    assert len(STAS_SOIL) == 12
    iv = jnp.asarray([[1, 16], [19, 24]], jnp.int32)   # urban, water, barren, snow
    p = landuse_params(iv)
    assert abs(float(p["albedo"][0, 0]) - 0.15) < 1e-6   # urban
    assert abs(float(p["albedo"][1, 1]) - 0.55) < 1e-6   # snow (summer col)
    assert abs(float(p["z0"][0, 1]) - 1e-4) < 1e-9       # water roughness
    # winter column differs where the table says so
    pw = landuse_params(iv, season="winter")
    assert float(pw["albedo"][1, 1]) > float(p["albedo"][1, 1])
    sp = soil_params(jnp.asarray([[1, 12]], jnp.int32))  # sand, clay
    assert float(sp["k_sat"][0, 0]) > 50 * float(sp["k_sat"][0, 1])
    assert float(sp["b_ch"][0, 1]) > float(sp["b_ch"][0, 0])


def _force(sw=600.0):
    temp1 = jnp.full((2, 2), 293.0)
    qv1 = jnp.full((2, 2), 0.008)
    rho1 = jnp.full((2, 2), 1.1)
    ustar = jnp.full((2, 2), 0.3)
    exner = jnp.full((2, 2), 0.99)
    th1 = temp1 / exner
    return (jnp.full((2, 2), sw), jnp.full((2, 2), 330.0), temp1, qv1,
            rho1, ustar, exner, th1)


def test_albedo_category_changes_skin_temperature():
    """Snow/ice (albedo 0.55) must stay cooler than barren desert (0.25)
    under the same strong insolation."""
    desert = lsm.init_noah(2, 2, t0=295.0, ivgtyp=19)
    snow = lsm.init_noah(2, 2, t0=295.0, ivgtyp=24)
    args = _force()
    step = jax.jit(lambda l: lsm.noah_lsm_step(l, *args, 60.0))
    for _ in range(30):
        desert, _ = step(desert)
    step2 = jax.jit(lambda l: lsm.noah_lsm_step(l, *args, 60.0))
    for _ in range(30):
        snow, _ = step2(snow)
    assert float(desert.tsk.mean()) > float(snow.tsk.mean()) + 1.0


def test_soil_texture_changes_drainage():
    """Sand drains toward dryness much faster than clay from the same
    initial moisture (k_sat ratio > 100x)."""
    sand = lsm.init_noah(2, 2, t0=290.0, sm0=0.35, isltyp=1)
    clay = lsm.init_noah(2, 2, t0=290.0, sm0=0.35, isltyp=12)
    args = _force(sw=0.0)
    step = jax.jit(lambda l: lsm.noah_lsm_step(l, *args, 600.0))
    for _ in range(50):
        sand, _ = step(sand)
    step2 = jax.jit(lambda l: lsm.noah_lsm_step(l, *args, 600.0))
    for _ in range(50):
        clay, _ = step2(clay)
    lost_sand = 0.35 - float(sand.smois[3].mean())
    lost_clay = 0.35 - float(clay.smois[3].mean())
    # compare bottom-layer gravity drainage (both start saturated-ish)
    assert float(sand.smois.mean()) < float(clay.smois.mean()) - 0.01


def test_stomatal_resistance_partitions_latent_heat():
    """Low-rsmin cropland (40 s/m) transpires much more than high-rsmin
    shrubland (300 s/m) under identical moist, sunlit conditions."""
    crop = lsm.init_noah(2, 2, t0=295.0, sm0=0.30, ivgtyp=2)
    shrub = lsm.init_noah(2, 2, t0=295.0, sm0=0.30, ivgtyp=8)
    args = _force()
    _, fc_ = jax.jit(lambda l: lsm.noah_lsm_step(l, *args, 60.0))(crop)
    _, fs = jax.jit(lambda l: lsm.noah_lsm_step(l, *args, 60.0))(shrub)
    # the skin-temperature solve partially compensates (hotter shrub skin
    # raises qsat), so the robust signatures are a clear latent-flux edge
    # for cropland and a much larger sensible share for shrubland
    assert float(fc_["qfx_w"].mean()) > 1.3 * float(fs["qfx_w"].mean())
    assert float(fs["hfx"].mean()) > 3.0 * float(fc_["hfx"].mean())


def test_noah_params_combined_keys():
    p = noah_params(jnp.full((3, 3), 2, jnp.int32),
                    jnp.full((3, 3), 6, jnp.int32))
    for k in ("albedo", "z0", "emiss", "veg_frac", "rsmin", "lai",
              "theta_sat", "theta_fc", "theta_wilt", "b_ch", "k_sat",
              "psi_sat", "c_dry"):
        assert p[k].shape == (3, 3), k
        assert np.isfinite(np.asarray(p[k])).all()


@pytest.mark.slow
def test_wrfinput_category_roundtrip(tmp_path):
    """IVGTYP/ISLTYP written into a wrfinput flow through init_real into
    the Noah state built by build_model (the real_em -> Noah chain)."""
    import dataclasses

    from wrf_partmc_tpu.config import DomainConfig, uniform_test_config
    from wrf_partmc_tpu.run import build_model
    from wrf_partmc_tpu.tools.make_inputs import write_wrfinput

    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=4, nz=4, dx=2000.0, dy=2000.0,
                            ztop=400.0))
    cfg = cfg.replace(dynamics=dataclasses.replace(cfg.dynamics,
                                                   sf_surface_physics=2))
    iv = np.arange(24, dtype=np.int32).reshape(4, 6) % 24 + 1
    isl = np.arange(24, dtype=np.int32).reshape(4, 6) % 12 + 1
    p = str(tmp_path / "wrfinput.nc")
    write_wrfinput(p, cfg, ivgtyp=iv, isltyp=isl)
    _, _, _, _, cs, _, _ = build_model(cfg, input_files={"wrfinput": p})
    np.testing.assert_array_equal(np.asarray(cs.land.ivgtyp), iv)
    np.testing.assert_array_equal(np.asarray(cs.land.isltyp), isl)
