"""Mie optics: exact series, lookup table, and the Mie-vs-ADT delta.

Fidelity target: the reference's per-particle MOSAIC Mie optics consumed by
``do_optical`` (``interface/wrf_pmc_driver.F90:1180-1252``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.models.partmc import mie
from wrf_partmc_tpu.models.partmc.optics import (WAVELENGTHS,
                                                 adt_efficiencies,
                                                 bulk_optical_props,
                                                 per_particle_optics)


def test_mie_series_canonical():
    """Bohren & Huffman's standard test case and physical limits."""
    q_ext, q_sca, g = mie.mie_series(10.0, 1.5 + 0j)
    assert abs(q_ext[0] - 2.8820) < 2e-3      # BH 1983 benchmark value
    assert abs(q_sca[0] - q_ext[0]) < 1e-10   # non-absorbing: Qsca == Qext
    # Rayleigh limit: Qsca -> (8/3) x^4 |(m^2-1)/(m^2+2)|^2, g -> 0
    x, m = 0.01, 1.5
    _, q_sca, g = mie.mie_series(x, m + 0j)
    ray = 8.0 / 3.0 * x ** 4 * abs((m * m - 1) / (m * m + 2)) ** 2
    assert abs(q_sca[0] / ray - 1.0) < 1e-3
    assert abs(g[0]) < 1e-3
    # geometric-optics limit: Qext -> 2
    q_ext, _, g = mie.mie_series(400.0, 1.33 + 1e-3j)
    assert abs(q_ext[0] - 2.0) < 0.15
    assert g[0] > 0.7
    # absorbing sphere: Qabs positive, bounded by Qext
    q_ext, q_sca, _ = mie.mie_series(3.0, 1.82 + 0.74j)
    assert 0.0 < q_ext[0] - q_sca[0] < q_ext[0]


def test_mie_table_accuracy():
    """Trilinear table lookup vs the exact series at off-grid points."""
    tab = mie.make_mie_table()
    rng = np.random.default_rng(7)
    n_pt = 250
    x = 10.0 ** rng.uniform(-2.0, 2.5, n_pt)
    n = rng.uniform(1.3, 1.9, n_pt)
    k = 10.0 ** rng.uniform(-3.5, -0.1, n_pt)
    qe_t, qs_t, g_t = jax.jit(mie.table_lookup)(
        tab, jnp.asarray(x), jnp.asarray(n), jnp.asarray(k))
    qe_e, qs_e, g_e = mie.mie_series(x, n + 1j * k)
    for got, want in [(qe_t, qe_e), (qs_t, qs_e), (g_t, g_e)]:
        rel = np.abs(np.asarray(got) - want) / np.maximum(np.abs(want), 0.1)
        assert np.median(rel) < 0.01
        assert np.percentile(rel, 95) < 0.08   # resonance-ripple tail


def _population(n_bc_frac=0.0):
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.aero_state import zero_state

    ad = make_aero_data()
    P = 64
    st = zero_state(ad, P)
    rng = np.random.default_rng(3)
    diam = 10.0 ** rng.uniform(-7.3, -5.7, P)          # 50 nm - 2 um
    vol = np.pi / 6.0 * diam ** 3
    vols = np.zeros((ad.n_spec, P), np.float32)
    i_so4 = ad.names.index("SO4")
    i_bc = ad.names.index("BC")
    vols[i_so4] = vol * (1.0 - n_bc_frac)
    vols[i_bc] = vol * n_bc_frac
    import dataclasses

    st = dataclasses.replace(st, vol=jnp.asarray(vols),
                             num=jnp.full((P,), 1e6, jnp.float32))
    return ad, st


def test_bulk_optics_mie_physical():
    """Mie-backed tauaer/waer/gaer: scattering-only population has waer ~ 1,
    BC mixture absorbs, asymmetry is forward-peaked for the coarse sizes."""
    ad, st = _population(0.0)
    dz = jnp.ones((1,))
    bo = bulk_optical_props(st, ad, dz, 1.0)
    assert np.all(np.asarray(bo.tauaer) > 0.0)
    assert np.all(np.asarray(bo.waer) > 0.98)          # no absorbers
    assert np.all(np.asarray(bo.gaer) > 0.3)           # forward scattering

    ad, st_bc = _population(0.3)
    bo_bc = bulk_optical_props(st_bc, ad, dz, 1.0)
    assert np.all(np.asarray(bo_bc.waer) < np.asarray(bo.waer))


def test_mie_vs_adt_delta_documented():
    """The documented Mie-vs-ADT delta: both backends agree on optical depth
    to within ADT's accuracy class (tens of percent), and Mie is the more
    physical single-scattering albedo (ADT's absorption closure biases low
    for weakly absorbing mixtures)."""
    ad, st = _population(0.05)
    dz = jnp.ones((1,))
    bo_mie = bulk_optical_props(st, ad, dz, 1.0, method="mie")
    bo_adt = bulk_optical_props(st, ad, dz, 1.0, method="adt")
    tau_m = np.asarray(bo_mie.tauaer)
    tau_a = np.asarray(bo_adt.tauaer)
    rel = np.abs(tau_m - tau_a) / np.maximum(tau_m, 1e-30)
    assert np.all(rel < 0.6), f"ADT delta out of its accuracy class: {rel}"
    assert np.any(rel > 0.02), "backends identical — dispatch broken?"


def test_per_particle_optics_shapes():
    """Per-particle cross-sections: [W, P] bands-major, non-negative, and
    consistent with the bulk aggregation."""
    ad, st = _population(0.1)
    c_sca, c_abs, g = per_particle_optics(st, ad)
    W, P = len(WAVELENGTHS), st.capacity
    assert c_sca.shape == (W, P) and c_abs.shape == (W, P) and g.shape == (W, P)
    assert np.all(np.asarray(c_sca) >= 0.0) and np.all(np.asarray(c_abs) >= 0.0)
    # bulk aggregation consistency on the SAME backend (bulk defaults to
    # the fitted surrogate for the every-step radiation path, r5)
    bo = bulk_optical_props(st, ad, jnp.ones((1,)), 1.0, method="mie")
    b_ext = np.sum(np.asarray(c_sca + c_abs) * np.asarray(st.num), axis=-1)
    np.testing.assert_allclose(np.asarray(bo.tauaer).reshape(W, -1)[:, 0],
                               b_ext, rtol=1e-4)
    # and the default fitted backend agrees in bulk to a few percent
    bo_f = bulk_optical_props(st, ad, jnp.ones((1,)), 1.0)
    np.testing.assert_allclose(np.asarray(bo_f.tauaer), np.asarray(bo.tauaer),
                               rtol=0.08)


def test_particle_netcdf_optics_schema(tmp_path):
    """with_optics=True writes the reference restart's per-particle optical
    state (absorb/scatter cross-sections, asymmetry, refractive index —
    ``wrf_pmc_init.F90:1111-1272``)."""
    from scipy.io import netcdf_file

    from wrf_partmc_tpu.config import Config, DomainConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.driver import CoupledState
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.aero_state import zero_state
    from wrf_partmc_tpu.utils.io import write_particle_netcdf

    cfg = Config().replace(domain=DomainConfig(nx=3, ny=3, nz=2))
    grid = make_grid(cfg)
    ad = make_aero_data()
    cshape = (grid.nz, grid.ny, grid.nx)
    st = zero_state(ad, 8, cell_shape=cshape)
    import dataclasses

    st = dataclasses.replace(
        st, vol=st.vol.at[..., 0, :4].set(1e-20),
        num=st.num.at[..., :4].set(1e5))
    cs = CoupledState(dyn=None, aero=st,
                      gas=jnp.zeros((*cshape, 3)),
                      step=jnp.zeros((), jnp.int32))
    path = str(tmp_path / "p.nc")
    write_particle_netcdf(path, cs, ad, grid, with_optics=True)
    f = netcdf_file(path, "r")
    for name in ("aero_scatter_xsec", "aero_absorb_xsec", "aero_asymmetry",
                 "aero_refract_real", "aero_refract_imag"):
        assert name in f.variables, name
    xs = f.variables["aero_scatter_xsec"][:]
    assert xs.shape == (4, *cshape, 8)
    assert np.all(xs[..., :4] > 0.0)
    f.close()


def test_fit_lookup_matches_table_in_bulk():
    """The gather-free fitted surrogate (mie.fit_lookup) vs the exact
    trilinear table, per particle and in the bulk sums the radiation
    coupling consumes.  Bands: per-particle log-efficiency rms <= ~0.05 dec
    in the relevant regime; BULK tau / w0 / g of a realistic polydisperse
    population within a few percent (per-particle fit noise averages
    down)."""
    import numpy as np

    from wrf_partmc_tpu.models.partmc.mie import (fit_lookup, make_mie_table,
                                                  table_lookup)

    rng = np.random.default_rng(7)
    N = 4000
    x = 10.0 ** rng.uniform(-1.5, 1.8, N)            # 60 nm - 20 um at 550 nm
    n = rng.uniform(1.33, 1.82, N)
    k = 10.0 ** rng.uniform(-4.0, -0.2, N)
    table = make_mie_table()
    qe_t, qs_t, g_t = (np.asarray(v) for v in
                       table_lookup(table, jnp.asarray(x), jnp.asarray(n),
                                    jnp.asarray(k)))
    qe_f, qs_f, g_f = (np.asarray(v) for v in
                       fit_lookup(jnp.asarray(x), jnp.asarray(n),
                                  jnp.asarray(k)))
    dlog = np.log10(np.maximum(qe_f, 1e-12)) - np.log10(
        np.maximum(qe_t, 1e-12))
    assert np.sqrt((dlog ** 2).mean()) < 0.06, dlog.std()
    assert np.abs(g_f - g_t).mean() < 0.04

    # bulk sums over a lognormal-weighted population (what tauaer sees)
    w = np.exp(-0.5 * ((np.log(x) - np.log(3.0)) / 0.8) ** 2)
    area = x * x                                      # proportional weights
    for ft, tt, name, tol in (
            (qe_f, qe_t, "ext", 0.05),
            (qs_f, qs_t, "sca", 0.05),
            ((qe_f - qs_f), (qe_t - qs_t), "abs", 0.12)):
        bf = float((ft * area * w).sum())
        bt = float((tt * area * w).sum())
        assert abs(bf - bt) / bt < tol, (name, bf, bt)


def test_maxwell_garnett_bc_inclusion_option():
    """The Maxwell-Garnett BC-inclusion mixing (MOSAIC shell-core stand-in,
    wrf_pmc_driver.F90:1205): for a BC-containing particle the effective k
    sits between the host's and volume mixing's (volume mixing is known to
    overestimate BC absorption); BC-free particles are unchanged."""
    import dataclasses

    from wrf_partmc_tpu.models.partmc.optics import particle_refractive_index

    ad, st = _population(0.1)
    i_bc = ad.spec_by_name("BC")
    # give half the particles a 20% BC volume fraction
    vtot = np.asarray(st.vol).sum(-2)
    vol = np.array(st.vol)                       # writable copy
    vol[..., i_bc, ::2] = 0.25 * vtot[::2]
    st2 = dataclasses.replace(st, vol=jnp.asarray(vol))

    n_v, k_v = particle_refractive_index(st2, ad)
    n_mg, k_mg = particle_refractive_index(st2, ad, maxwell_garnett=True)
    k_v, k_mg = np.asarray(k_v), np.asarray(k_mg)
    alive = np.asarray(st2.num) > 0
    bc_rows = alive & (vol[..., i_bc, :] > 0)
    assert bc_rows.any()
    # MG absorbs less than volume mixing but more than the BC-free host
    assert (k_mg[bc_rows] < k_v[bc_rows] + 1e-6).all()
    assert (k_mg[bc_rows] > 0.01).all()
    # BC-free particles identical under both rules
    free = alive & ~bc_rows
    if free.any():
        np.testing.assert_allclose(k_mg[free], k_v[free], atol=1e-5)
        np.testing.assert_allclose(np.asarray(n_mg)[free],
                                   np.asarray(n_v)[free], rtol=1e-5)
