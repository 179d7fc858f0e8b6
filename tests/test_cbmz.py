"""CBM-Z gas-phase mechanism tests (models/partmc/cbmz.py).

Mirrors the validation role of MOSAIC's gas-phase tests (the reference's
mechanism is private upstream; SURVEY 4 prescribes creating the missing unit
pyramid): mechanism integrity (NOy conservation, no orphan species), box
photochemistry realism, and dark-chemistry titration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.models.partmc.cbmz import (
    CBMZ_GASES, N_ATOMS, build_mechanism, cbmz_step, cos_zenith,
    photolysis_rates)

# gases whose only sink is aerosol partitioning (handled in mosaic.py)
AEROSOL_SINK = {"H2SO4", "MSA", "SULFHOX", "ARO1", "ARO2", "ALK1", "OLE1",
                "API1", "API2", "LIM1", "LIM2"}
# gases with no in-mechanism source (primary emissions only)
PRIMARY = {"CH4", "C2H6", "ETH", "OLET", "OLEI", "TOL", "XYL", "PAR", "ISOP",
           "API", "LIM", "DMS", "ANOL", "CH3OH", "AONE", "CO", "SO2", "NO",
           "NH3", "HCl", "DMSO2"}


@pytest.fixture(scope="module")
def mech():
    return build_mechanism()


def test_registry_is_exactly_77_species(mech):
    assert mech.n_spec == 77
    assert len(CBMZ_GASES) == 77
    assert mech.names[0] == "H2SO4" and mech.names[-1] == "SULFHOX"


def test_noy_conserved_in_every_reaction(mech):
    nvec = np.array([N_ATOMS.get(n, 0) for n in mech.names], float)
    imbal = np.asarray(mech.net) @ nvec
    # NH3+OH (NHx, not NOy) is the one sanctioned N sink
    bad = np.nonzero(np.abs(imbal) > 1e-5)[0]
    allowed = [r for r in bad
               if mech.names[int(np.asarray(mech.i1)[r])] == "NH3"
               or (bool(np.asarray(mech.has2)[r])
                   and mech.names[int(np.asarray(mech.i2)[r])] == "NH3")]
    assert list(bad) == allowed, f"NOy-imbalanced reactions: {list(bad)}"


def test_no_orphan_species(mech):
    net = np.asarray(mech.net)
    for s, name in enumerate(mech.names):
        consumed = (net[:, s] < 0).any()
        produced = (net[:, s] > 0).any()
        assert consumed or name in AEROSOL_SINK, f"{name} has no sink"
        assert produced or name in PRIMARY, f"{name} has no source"


def _box(mech, hours, cosz, init, temp=298.0, dt=300.0):
    idx = {n: i for i, n in enumerate(mech.names)}
    c0 = np.zeros(mech.n_spec, np.float32)
    for n, v in init.items():
        c0[idx[n]] = v
    step = jax.jit(lambda g: cbmz_step(mech, g, temp, 1.0e5, 0.5, cosz, dt))
    g = jnp.asarray(c0)
    for _ in range(int(hours * 3600 / dt)):
        g = step(g)
    return np.asarray(g), idx


URBAN = dict(NO2=20.0, NO=10.0, O3=30.0, CO=200.0, HCHO=5.0, PAR=50.0,
             OLET=5.0, TOL=5.0, XYL=3.0, ISOP=2.0, SO2=10.0, CH4=1800.0,
             C2H6=2.0, NH3=5.0, ALD2=2.0, ETH=3.0, AONE=1.0, DMS=0.2)


def test_daytime_urban_ozone_formation(mech):
    g, idx = _box(mech, 4.0, 0.8, URBAN)
    assert np.isfinite(g).all() and (g >= 0).all()
    # NOx+VOC photochemistry must produce ozone in a realistic range
    assert 40.0 < g[idx["O3"]] < 200.0
    # daytime OH ~ 1e6-1e7 molec/cm3 ~ 4e-5..4e-4 ppb at 1 atm
    assert 1e-5 < g[idx["OH"]] < 1e-3
    # NOx is oxidized into reservoirs
    assert g[idx["HNO3"]] > 1.0 and g[idx["PAN"]] > 0.1
    # SO2 -> H2SO4 happened
    assert g[idx["H2SO4"]] > 0.01


def test_dark_no_titration(mech):
    g, idx = _box(mech, 2.0, -1.0, dict(NO=40.0, O3=30.0))
    # O3 + NO -> NO2 runs to near-completion on the deficient side
    assert g[idx["O3"]] < 1.0
    assert g[idx["NO2"]] > 25.0
    # no photolysis: no OH chemistry
    assert g[idx["OH"]] < 1e-6


def test_nitrogen_closed_over_noy(mech):
    g, idx = _box(mech, 3.0, 0.7, URBAN)
    nvec = np.array([N_ATOMS.get(n, 0) for n in mech.names], float)
    c0 = np.zeros(mech.n_spec, np.float32)
    for n, v in URBAN.items():
        c0[idx[n]] = v
    n0 = float((c0 * nvec).sum())
    n1 = float((g * nvec).sum())
    assert abs(n1 - n0) / n0 < 0.02


@pytest.mark.slow
def test_batched_cells_match_single(mech):
    idx = {n: i for i, n in enumerate(mech.names)}
    c0 = np.zeros(mech.n_spec, np.float32)
    for n, v in URBAN.items():
        c0[idx[n]] = v
    batch = jnp.asarray(np.tile(c0, (3, 2, 1)))
    out_b = cbmz_step(mech, batch, 298.0, 1.0e5, 0.5, 0.8, 300.0)
    out_s = cbmz_step(mech, jnp.asarray(c0), 298.0, 1.0e5, 0.5, 0.8, 300.0)
    np.testing.assert_allclose(np.asarray(out_b[1, 1]), np.asarray(out_s),
                               rtol=1e-5, atol=1e-7)


def test_photolysis_zero_at_night():
    J = photolysis_rates(-0.3)
    assert all(float(v) == 0.0 for v in J.values())
    J = photolysis_rates(1.0)
    assert float(J["no2"]) > 5e-3


def test_cos_zenith_geometry():
    # solar noon at equator on the equinox: sun nearly overhead
    mu = cos_zenith(0.0, 0.0, 80, 12 * 3600.0)
    assert float(mu) > 0.95
    # midnight: below horizon
    mu = cos_zenith(0.0, 0.0, 80, 0.0)
    assert float(mu) < 0.0


@pytest.mark.slow
def test_w_method_stiff_accuracy_vs_dense_refactorization(mech):
    """Stiff-accuracy regression (VERDICT r4 item 5 / ADVICE r4 #2): the
    Rosenbrock-W path (frozen fast_inv operator) must track the classic
    per-substep refactorized ROS2 within stated tolerances across substep
    sizes, over a diurnal urban cycle segment (day photochemistry + dusk).
    Failure modes caught: fast_inv losing the inverse when a mechanism
    change breaks the diagonal-dominance assumption; W-order degradation
    at large h."""
    idx = {n: i for i, n in enumerate(mech.names)}
    c0 = np.zeros(mech.n_spec, np.float32)
    for n, v in URBAN.items():
        c0[idx[n]] = v
    key_species = ["O3", "NO", "NO2", "HNO3", "HCHO", "PAN", "CO", "H2SO4"]

    # drive 2 h of daytime chemistry to a stiff mid-cycle state
    g = jnp.asarray(c0)
    warm = jax.jit(lambda x: cbmz_step(mech, x, 298.0, 1.0e5, 0.5, 0.8,
                                       300.0, n_sub=6))
    for _ in range(24):
        g = warm(g)

    # measured bounds (2026-08): daytime <= 2e-4; the dusk NO-titration
    # transient (NO falling 2 decades within one macro-step) reaches ~3e-2
    # on a ~0.03 ppb absolute difference — the W-scheme's frozen operator
    # can't track that Jacobian swing, which is the documented accuracy
    # cost of the design.  Tolerances pin both regimes at ~2x headroom.
    for cz, tol in ((0.8, 1e-3), (0.0, 6e-2)):
        for dt, n_sub in ((300.0, 6), (600.0, 6), (600.0, 1)):
            w = np.asarray(cbmz_step(mech, g, 298.0, 1.0e5, 0.5, cz, dt,
                                     n_sub=n_sub, w_method=True))
            d = np.asarray(cbmz_step(mech, g, 298.0, 1.0e5, 0.5, cz, dt,
                                     n_sub=n_sub, w_method=False))
            for sp in key_species:
                i = idx[sp]
                err = abs(w[i] - d[i]) / (abs(d[i]) + 1.0)  # 1 ppb floor
                assert err < tol, (f"{sp}: W-method {w[i]:.4g} vs dense "
                                   f"{d[i]:.4g} (rel {err:.2e} > {tol}) at "
                                   f"dt={dt} n_sub={n_sub} cosz={cz}")


@pytest.mark.slow
def test_fast_inv_matches_exact_inverse(mech):
    """fast_inv (no-pivot block-Schur + Newton-Schulz) vs jnp.linalg.inv on
    real chemistry operators A = I - gamma*h*J (ADVICE r4 #2): relative
    operator error below 1e-3 at production substeps."""
    from wrf_partmc_tpu.models.partmc.cbmz import (_ROS_GAMMA, fast_inv,
                                                   jacobian,
                                                   rate_coefficients)

    idx = {n: i for i, n in enumerate(mech.names)}
    c0 = np.zeros((4, mech.n_spec), np.float32)
    for n, v in URBAN.items():
        c0[:, idx[n]] = v
    c0[1] *= 10.0                         # heavy pollution
    c0[2] *= 0.01                         # clean background
    c0[3, idx["O3"]] = 150.0              # ozone episode
    T = jnp.full((4,), 298.0)
    k = rate_coefficients(mech, T, jnp.full((4,), 1.0e5),
                          jnp.full((4,), 0.5), 0.8)
    for h in (50.0, 100.0):
        J = jacobian(mech, jnp.asarray(c0), k)
        A = jnp.eye(mech.n_spec) - _ROS_GAMMA * h * J
        Xf = np.asarray(fast_inv(A))
        Xe = np.asarray(jnp.linalg.inv(A))
        err = (np.abs(Xf - Xe).max(axis=(-2, -1))
               / np.abs(Xe).max(axis=(-2, -1)))
        assert (err < 1e-3).all(), f"fast_inv rel err {err} at h={h}"
