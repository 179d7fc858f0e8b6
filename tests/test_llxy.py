"""Map projections (module_llxy equivalent): round-trip consistency,
map-factor correctness at true latitudes, Coriolis sanity."""

import numpy as np
import pytest

from wrf_partmc_tpu.utils.llxy import (PROJ_LATLON, PROJ_LC, PROJ_MERC,
                                       PROJ_PS, grid_geography, ij_to_latlon,
                                       latlon_to_ij, make_projection,
                                       map_factor)


@pytest.mark.parametrize("kind,kw", [
    (PROJ_LC, dict(stdlon=-97.0, truelat1=30.0, truelat2=60.0)),
    (PROJ_LC, dict(stdlon=-97.0, truelat1=45.0, truelat2=45.0)),
    (PROJ_PS, dict(stdlon=-97.0, truelat1=60.0)),
    (PROJ_MERC, dict(truelat1=20.0)),
    (PROJ_LATLON, dict()),
])
def test_roundtrip_ij_latlon(kind, kw):
    p = make_projection(kind, lat1=34.0, lon1=-105.0, dx=12000.0, **kw)
    ii, jj = np.meshgrid(np.arange(1.0, 61.0, 7.0), np.arange(1.0, 51.0, 6.0))
    lat, lon = ij_to_latlon(p, ii, jj)
    i2, j2 = latlon_to_ij(p, lat, lon)
    np.testing.assert_allclose(i2, ii, atol=1e-6)
    np.testing.assert_allclose(j2, jj, atol=1e-6)


def test_map_factor_unity_at_truelat():
    for kind, kw in [(PROJ_LC, dict(stdlon=-97.0, truelat1=30.0,
                                    truelat2=60.0)),
                     (PROJ_PS, dict(stdlon=-97.0, truelat1=60.0)),
                     (PROJ_MERC, dict(truelat1=20.0))]:
        p = make_projection(kind, lat1=34.0, lon1=-105.0, dx=12000.0, **kw)
        for tl in {p.truelat1, p.truelat2}:
            np.testing.assert_allclose(map_factor(p, tl), 1.0, rtol=1e-6)


def test_lc_lon_at_stdlon_column():
    """Along the standard meridian, LC grid columns run due north."""
    p = make_projection(PROJ_LC, lat1=30.0, lon1=-97.0, dx=12000.0,
                        stdlon=-97.0, truelat1=30.0, truelat2=60.0)
    lat, lon = ij_to_latlon(p, np.ones(5), np.arange(1.0, 6.0))
    np.testing.assert_allclose(lon, -97.0, atol=1e-6)
    assert np.all(np.diff(lat) > 0)


def test_grid_geography_fields():
    p = make_projection(PROJ_LC, lat1=30.0, lon1=-105.0, dx=12000.0,
                        stdlon=-97.0, truelat1=30.0, truelat2=60.0)
    lat, lon, msft, f = grid_geography(p, nx=40, ny=30)
    assert lat.shape == lon.shape == msft.shape == f.shape == (30, 40)
    assert np.all(msft > 0.8) and np.all(msft < 1.3)
    # northern-hemisphere grid: f positive, increasing northward
    assert np.all(f > 0)
    assert f[-1].mean() > f[0].mean()
