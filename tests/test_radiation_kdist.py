"""RRTMG-class correlated-k LW (ra_physics=4): clear-sky fluxes and heating
rates for a midlatitude-summer-like column must sit within the documented
tolerance of standard published clear-sky values (OLR ~ 281 W m-2,
surface DLR ~ 345 W m-2, tropospheric cooling ~ 2 K/day; RRTMG/ICRCCM
clear-sky range).  VERDICT r3 item 7."""

import numpy as np
import jax.numpy as jnp

from wrf_partmc_tpu.models.physics.radiation import (longwave,
                                                     longwave_kdist,
                                                     radiation_driver)


def _mls_column(nz=40, dz0=625.0, t_sfc=294.0, qv0=0.014):
    z = (np.arange(nz) + 0.5) * dz0
    dz = np.full(nz, dz0)
    T = np.where(z < 13000, t_sfc - 0.0065 * z, t_sfc - 0.0065 * 13000)
    p = 101325.0 * np.exp(-z / 7500.0)
    rho = p / (287.0 * T)
    qv = qv0 * np.exp(-z / 2000.0)
    f = lambda a: jnp.asarray(a.reshape(nz, 1, 1), jnp.float32)
    return (f(T), f(qv), f(rho), jnp.asarray(dz, jnp.float32),
            jnp.asarray([[t_sfc]], jnp.float32), z)


def test_clear_sky_fluxes_within_published_tolerance():
    T, qv, rho, dz, tsfc, z = _mls_column()
    hr, dlr, olr = longwave_kdist(T, qv, rho, dz, tsfc)
    olr = float(olr[0, 0])
    dlr = float(dlr[0, 0])
    # documented calibration tolerance: 5% of the standard clear-sky values
    assert abs(olr - 281.0) / 281.0 < 0.05, olr
    assert abs(dlr - 345.0) / 345.0 < 0.05, dlr
    # tropospheric cooling in the 1-3 K/day clear-sky range
    hr_day = np.asarray(hr)[:, 0, 0] * 86400.0
    trop = hr_day[(z > 1000) & (z < 8000)]
    assert (trop < -0.5).all() and (trop > -4.5).all(), trop
    # above the tropopause of this idealized isothermal cap (no ozone
    # heating, no realistic inversion) the CO2-core cooling stays bounded
    assert np.abs(hr_day[z > 15000]).max() < 8.0


def test_co2_greenhouse_sensitivity():
    import wrf_partmc_tpu.models.physics.radiation as R

    T, qv, rho, dz, tsfc, z = _mls_column()
    _, _, olr1 = longwave_kdist(T, qv, rho, dz, tsfc)
    old = R._CO2_PPM
    try:
        R._CO2_PPM = 2 * old
        _, _, olr2 = longwave_kdist(T, qv, rho, dz, tsfc)
    finally:
        R._CO2_PPM = old
    d_olr = float(olr1[0, 0] - olr2[0, 0])
    # doubling CO2 reduces OLR (greenhouse direction), order-of-magnitude
    # consistent with the canonical ~2-4 W m-2 clear-sky forcing
    assert 0.3 < d_olr < 12.0, d_olr


def test_kdist_vs_gray_both_plausible_and_driver_dispatch():
    T, qv, rho, dz, tsfc, z = _mls_column()
    _, dlr_g, olr_g = longwave(T, qv, rho, dz, tsfc)
    _, dlr_k, olr_k = longwave_kdist(T, qv, rho, dz, tsfc)
    assert 200.0 < float(olr_g[0, 0]) < 320.0
    assert 200.0 < float(olr_k[0, 0]) < 320.0
    hr, diag = radiation_driver(T, qv, rho, dz, 0.5, t_sfc=tsfc,
                                lw_scheme="kdist")
    assert np.isfinite(np.asarray(hr)).all()
    assert float(diag["sw_sfc_down"][0, 0]) > 200.0
