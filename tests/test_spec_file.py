"""PartMC .spec / .dat dialect parsers (``partmc/src/spec_file.F90`` via
``wrf_pmc_init.F90``; fixtures mirror ``WRFV3/test/em_scm_xy/*``)."""

import os
import textwrap

import numpy as np
import pytest

from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.utils import spec_file as sf

AD = make_aero_data()
GD = make_gas_data()


def _write(p, text):
    with open(p, "w") as f:
        f.write(textwrap.dedent(text))
    return str(p)


@pytest.fixture
def scenario_dir(tmp_path):
    _write(tmp_path / "aero_init_comp.dat", """\
        # composition
        OC               1.375
        SO4              1
        NH4              0.375
        """)
    _write(tmp_path / "aero_init_dist.dat", """\
        # remote continental
        mode_name init_small
        mass_frac aero_init_comp.dat
        mode_type log_normal
        num_conc 3.2e9
        geom_mean_diam 2e-8
        log10_geom_std_dev 0.161

        mode_name init_large
        mass_frac aero_init_comp.dat
        mode_type log_normal
        num_conc 2.9e9
        geom_mean_diam 1.16e-7
        log10_geom_std_dev 0.217
        """)
    _write(tmp_path / "gas_init.dat", """\
        # species    initial concentration (ppb)
        NO           0.2E+00
        NO2          1.0E+00
        O3           5.0E+01
        """)
    _write(tmp_path / "gas_emit.dat", """\
        time     0       3600
        rate     0.5     0.5
        SO2      4.2E-09 5.5E-09
        NO2      1.5e-9  1.7e-9
        """)
    _write(tmp_path / "aero_emit.dat", """\
        time 0 3600
        rate 1.0 1.0
        dist aero_init_dist.dat aero_init_dist.dat
        """)
    _write(tmp_path / "test.spec", """\
        z                 0.0          3500.0
        gas_data          gas_data.dat gas_data.dat
        gas_init          gas_init.dat gas_init.dat
        aero_data         aero_data.dat aero_data.dat
        aero_init         aero_init_dist.dat aero_init_dist.dat
        gas_emission      gas_emit.dat gas_emit.dat
        aero_emission     aero_emit.dat aero_emit.dat
        """)
    return tmp_path


def test_aero_dist_dat(scenario_dir):
    d = sf.read_aero_dist_dat(str(scenario_dir / "aero_init_dist.dat"), AD)
    assert d.n_mode == 2
    np.testing.assert_allclose(np.asarray(d.num_conc), [3.2e9, 2.9e9])
    np.testing.assert_allclose(np.asarray(d.geom_mean_diam), [2e-8, 1.16e-7])
    # log10 -> natural log conversion
    np.testing.assert_allclose(np.asarray(d.log_geom_std),
                               np.log(10.0 ** np.array([0.161, 0.217])),
                               rtol=1e-5)
    vf = np.asarray(d.vol_frac)[0]
    assert abs(vf.sum() - 1.0) < 1e-6
    # volume fractions: mass/density renormalized — OC lighter than SO4
    i_oc, i_so4 = AD.names.index("OC"), AD.names.index("SO4")
    assert vf[i_oc] > vf[i_so4] > 0.0


def test_gas_init_and_emit(scenario_dir):
    g0 = sf.read_gas_init_dat(str(scenario_dir / "gas_init.dat"), GD)
    assert g0[GD.names.index("O3")] == 50.0
    assert g0[GD.names.index("NO")] == 0.2
    times, rates, emit = sf.read_gas_emit_dat(
        str(scenario_dir / "gas_emit.dat"), GD)
    np.testing.assert_allclose(times, [0.0, 3600.0])
    np.testing.assert_allclose(rates, [0.5, 0.5])
    assert emit.shape == (2, GD.n_spec)
    assert emit[1, GD.names.index("SO2")] == pytest.approx(5.5e-9)


def test_aero_emit_dat(scenario_dir):
    times, rates, dists = sf.read_aero_emit_dat(
        str(scenario_dir / "aero_emit.dat"), AD)
    assert len(dists) == 2 and dists[0].n_mode == 2


def test_scenario_spec_per_height(scenario_dir):
    s = sf.load_scenario_spec(str(scenario_dir / "test.spec"))
    np.testing.assert_allclose(s["z"], [0.0, 3500.0])
    assert len(s["aero_init"]) == 2
    assert all(os.path.isabs(p) for p in s["aero_init"])
    d = sf.read_aero_dist_dat(s["aero_init"][0], AD)
    assert d.n_mode == 2


def test_scenario_spec_flat_variant(tmp_path):
    p = _write(tmp_path / "ideal.spec", """\
        aerosol_data aero_data.dat
        gas_data gas_data.dat
        aerosol_init aero_init_dist.dat
        gas_init gas_init.dat
        nz 64
        """)
    s = sf.load_scenario_spec(p)
    np.testing.assert_allclose(s["z"], [0.0])
    assert s["aero_init"][0].endswith("aero_init_dist.dat")
    assert s["nz"] == "64"


REF_SPEC = "/root/reference/WRFV3/test/em_scm_xy/test.spec"


@pytest.mark.skipif(not os.path.exists(REF_SPEC),
                    reason="reference tree not mounted")
def test_reference_em_scm_xy_spec_parses():
    """The actual reference scenario (spec + every .dat leaf it names)."""
    s = sf.load_scenario_spec(REF_SPEC)
    np.testing.assert_allclose(s["z"], [0.0, 3500.0, 15000.0])
    for key in ("gas_data", "gas_init", "aero_data", "aero_init",
                "gas_emission", "aero_emission"):
        assert s[key] is not None and len(s[key]) == 3

    d = sf.read_aero_dist_dat(s["aero_init"][0], AD)
    assert d.n_mode >= 2
    assert float(np.sum(np.asarray(d.num_conc))) > 1e9

    g0 = sf.read_gas_init_dat(s["gas_init"][0], GD)
    assert g0[GD.names.index("O3")] > 10.0

    times, rates, emit = sf.read_gas_emit_dat(s["gas_emission"][0], GD)
    assert len(times) >= 24 and emit.max() > 0.0

    # the per-time dist leaf files aren't shipped in the reference tree;
    # parse the times/rates rows directly
    d = sf.read_spec(s["aero_emission"][0])
    assert len(d["time"]) == len(d["rate"]) == len(d["dist"]) >= 24


@pytest.mark.slow
def test_init_from_spec_populates_per_level(scenario_dir):
    """init_from_spec: per-height slabs land on model levels; the scenario
    injects gas emissions in the surface layer only."""
    import jax.numpy as jnp

    from wrf_partmc_tpu.config import (Config, DomainConfig, PartmcConfig)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.init import init_from_spec
    from wrf_partmc_tpu.models.partmc.scenario import update_gas_state
    from wrf_partmc_tpu.utils import rng

    cfg = Config(
        domain=DomainConfig(nx=4, ny=4, nz=6, dx=2000.0, dy=2000.0,
                            ztop=8000.0),
        partmc=PartmcConfig(num_particles=16, max_particles=48,
                            n_emit_slots=4),
    )
    grid = make_grid(cfg)
    aero, gas0, scenario_fn = init_from_spec(
        AD, GD, cfg, grid, rng.base_key(0),
        str(scenario_dir / "test.spec"))
    # population exists at all levels (both slabs use the same dist here)
    n_alive = np.asarray(aero.n_alive())
    assert n_alive.min() > 0
    assert gas0.shape == (6, 4, 4, GD.n_spec)
    assert float(gas0[0, 0, 0, GD.names.index("O3")]) == 50.0

    scn = scenario_fn(0.0)
    g1 = update_gas_state(scn, gas0, 0.0, 60.0)
    d_so2 = np.asarray(g1 - gas0)[..., GD.names.index("SO2")]
    assert d_so2[0].min() > 0.0            # surface layer emitted into
    assert abs(d_so2[1:]).max() < 1e-12    # nothing above

    # emission dist present at the surface only
    assert float(jnp.sum(scn.emit_dist.num_conc[0, 0])) > 0.0
    assert float(jnp.sum(jnp.abs(scn.emit_dist.num_conc[0, 1:]))) == 0.0
