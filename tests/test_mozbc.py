"""mozbc equivalent: spc_map dialect, hybrid-level interpolation, and the
BC/IC contract hand-off (``mozart_to_wrf/main_bc_wrfchem.f90:1-307``)."""

import numpy as np
import pytest

from wrf_partmc_tpu.config import Config, DomainConfig
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.tools import mozbc

AD = make_aero_data()
GD = make_gas_data()


def test_parse_spc_map_dialect():
    """The .inp expression dialect of mozart_to_wrf/CBMZ.inp."""
    m = mozbc.parse_spc_map([
        "co -> CO",
        "par -> C3H6+3*C3H8+2*BIGENE+5*BIGALK",
        "oc_a01->2.03507e-2*OC1+2.03507e-2*OC2+.244208*SOA;1.e9",
        "tol -> .75*TOLUENE",
    ])
    assert m[0] == ("co", [(1.0, "CO")], 1.0)
    assert m[1][1] == [(1.0, "C3H6"), (3.0, "C3H8"), (2.0, "BIGENE"),
                       (5.0, "BIGALK")]
    assert m[2][0] == "oc_a01" and m[2][2] == pytest.approx(1e9)
    assert m[2][1][2] == (0.244208, "SOA")
    assert m[3][1] == [(0.75, "TOLUENE")]


@pytest.fixture
def setup(tmp_path):
    cfg = Config(domain=DomainConfig(nx=6, ny=5, nz=8, dx=4000.0, dy=4000.0,
                                     ztop=12000.0))
    grid = make_grid(cfg)
    gpath = str(tmp_path / "mozart.nc")
    mozbc.write_synthetic_mozart(gpath)
    ny, nx = cfg.domain.ny, cfg.domain.nx
    xlat = np.broadcast_to(np.linspace(38.0, 42.0, ny)[:, None], (ny, nx))
    xlong = np.broadcast_to(np.linspace(-100.0, -96.0, nx)[None], (ny, nx))
    return cfg, grid, gpath, xlat, xlong, tmp_path


SPC_MAP = ["co -> CO", "o3 -> O3", "so2 -> SO2",
           "oc_a01 -> .02*OC1+.02*OC2+.24*SOA;1e9",
           "oc_a02 -> .07*OC1+.07*OC2+.9*SOA;1e9",
           "bc_a01 -> CB1+CB2;.11e9",
           "so4_a03 -> .13*SO4;3.3e9"]


def test_mozbc_gas_and_binned_aerosol(setup):
    cfg, grid, gpath, xlat, xlong, tmp = setup
    times, back_gas, binned = mozbc.run_mozbc(
        gpath, SPC_MAP, GD, AD, grid, xlat, xlong)
    assert back_gas.shape == (2, grid.nz, GD.n_spec)
    i_o3 = [n.upper() for n in GD.names].index("O3")
    assert back_gas[:, :, i_o3].min() > 0.0
    # vertical structure arrives (hybrid -> eta interpolation is not flat)
    prof = back_gas[0, :, i_o3]
    assert prof.std() / prof.mean() > 1e-3
    # binned aerosol collected into the 8-bin sectional shape
    assert binned is not None and binned.shape == (2, 8)
    assert binned[:, 0].min() > 0.0 and binned[:, 2].min() > 0.0
    assert binned[0, 4] == 0.0           # unmapped bins empty


def test_mozbc_writes_bc_contract(setup):
    """The written BC file round-trips through the standard reader and
    feeds init_from_files' scenario machinery."""
    cfg, grid, gpath, xlat, xlong, tmp = setup
    out_bcs = str(tmp / "bcs.nc")
    out_ics = str(tmp / "gas_ics.nc")
    mozbc.run_mozbc(gpath, SPC_MAP, GD, AD, grid, xlat, xlong,
                    out_bcs=out_bcs, out_ics=out_ics)
    from wrf_partmc_tpu.tools.make_inputs import read_bcs

    times, dist, gas, dil = read_bcs(out_bcs)
    assert gas.shape[0] == 2 and gas.shape[-1] == GD.n_spec
    assert float(np.asarray(dist.num_conc).sum()) > 0.0
    assert np.asarray(dil).shape == (2,)

    from scipy.io import netcdf_file

    f = netcdf_file(out_ics, "r", mmap=False)
    gi = np.array(f.variables["gas_init"][:])
    f.close()
    assert gi.shape == (grid.nz, GD.n_spec) and gi.max() > 0.0
