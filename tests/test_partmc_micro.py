"""Microphysics validation: coagulation vs Smoluchowski analytics, Brownian
kernel magnitudes, kappa-Koehler CCN, equilibrium water, deposition-velocity
shape, mixing-state metrics, and the jitted box-model driver."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu import constants as c
from wrf_partmc_tpu.config import PartmcConfig
from wrf_partmc_tpu.models.partmc import coag
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data, particle_mass
from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state
from wrf_partmc_tpu.models.partmc.box import BoxState, run_box
from wrf_partmc_tpu.models.partmc.condense import (
    crit_supersat, equilib_water, kappa_rh_at_diam, state_crit_supersats)
from wrf_partmc_tpu.models.partmc.deposition import deposition_velocity
from wrf_partmc_tpu.models.partmc.diagnostics import mixing_state_metrics, process
from wrf_partmc_tpu.models.partmc.dist import make_mode, sample_particles
from wrf_partmc_tpu.models.partmc.env_state import make_env_state
from wrf_partmc_tpu.models.partmc.bin_grid import make_bin_grid
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data, zero_gas_state
from wrf_partmc_tpu.models.partmc.scenario import constant_scenario

AD = make_aero_data()
S = AD.n_spec
ENV = make_env_state(temp=293.15, pressure=1.0e5, rel_humid=0.5, cell_volume=1.0)


def _so4_mode(num_conc=1e9, gmd=1e-7, gsd=1.6, **kw):
    vf = np.zeros(S)
    vf[AD.spec_by_name("SO4")] = 1.0
    return make_mode(num_conc, gmd, gsd, vf, **kw)


def _populate(capacity, n, num_conc, cell_shape=(), gmd=1e-7, seed=0):
    st = zero_state(AD, capacity, cell_shape)
    vol, num, src, wcl = sample_particles(
        jax.random.key(seed), _so4_mode(num_conc, gmd), AD, n, 1.0, cell_shape)
    return add_particles(st, vol, num, src, wcl)


# ---------------------------------------------------------------- coagulation

@pytest.mark.slow
def test_constant_kernel_smoluchowski_decay():
    """N(t) = N0 / (1 + K N0 t / 2) for the constant kernel."""
    n0 = 1.0e12            # m-3
    K = coag.CONSTANT_KERNEL_COEF
    dt, n_steps = 100.0, 40
    cells = (16,)
    st = _populate(256, 192, n0, cell_shape=cells)

    def step(s, i):
        return coag.coag_step(s, AD, ENV, dt, jax.random.fold_in(jax.random.key(7), i),
                              kernel=coag.KERNEL_CONSTANT), None

    stf, _ = jax.jit(lambda s: jax.lax.scan(step, s, jnp.arange(n_steps)))(st)
    t = dt * n_steps
    n_true = n0 / (1.0 + K * n0 * t / 2.0)
    n_sim = float(jnp.mean(stf.total_num()))
    assert abs(n_sim / n_true - 1.0) < 0.08, (n_sim, n_true)
    # mass conservation (exact)
    m0 = float(jnp.sum(particle_mass(st.vol, AD) * st.num))
    m1 = float(jnp.sum(particle_mass(stf.vol, AD) * stf.num))
    np.testing.assert_allclose(m1, m0, rtol=1e-4)


def test_brownian_kernel_magnitude_and_symmetry():
    d = jnp.asarray([1e-6, 1e-6, 1e-8, 1e-8])
    rho = 1800.0
    m = rho * jnp.pi / 6 * d ** 3
    kfn = lambda a, b, ma, mb: float(jnp.squeeze(coag.brownian_kernel(a, b, ma, mb, ENV)))
    k11 = kfn(d[0], d[1], m[0], m[1])
    k33 = kfn(d[2], d[3], m[2], m[3])
    k13 = kfn(d[0], d[2], m[0], m[2])
    k31 = kfn(d[2], d[0], m[2], m[0])
    # continuum limit for equal 1 um particles: 8kT/(3 mu) ~ 6e-16 m3/s
    assert 3e-16 < k11 < 1.2e-15, k11
    # dissimilar sizes strongly enhanced
    assert k13 > 10 * k11
    np.testing.assert_allclose(k13, k31, rtol=1e-5)
    # free-molecular self-kernel smaller than the dissimilar pair
    assert k33 < k13


# ------------------------------------------------------------- kappa-Koehler

@pytest.mark.slow
def test_crit_supersat_against_analytic_limit():
    A = float(ENV.kelvin_A)
    for kappa in (0.3, 0.65, 1.1):
        for dd in (5e-8, 1e-7, 2e-7):
            sc = float(crit_supersat(jnp.asarray(dd), jnp.asarray(kappa), A))
            sc_approx = np.sqrt(4 * A ** 3 / (27 * kappa * dd ** 3))
            assert abs(sc / sc_approx - 1) < 0.1, (kappa, dd, sc, sc_approx)
    # monotonicity
    sc_small = float(crit_supersat(jnp.asarray(5e-8), jnp.asarray(0.65), A))
    sc_big = float(crit_supersat(jnp.asarray(2e-7), jnp.asarray(0.65), A))
    assert sc_small > sc_big


def test_equilib_water_consistency():
    st = _populate(64, 32, 1e9)
    st_wet = equilib_water(st, AD, ENV)
    d_wet = st_wet.wet_diameter()
    d_dry = st_wet.dry_diameter(AD)
    alive = np.asarray(st_wet.alive)
    # growth factor > 1 and RH recovered from the Koehler equation
    gf = np.asarray(d_wet / d_dry)[alive]
    assert np.all(gf > 1.05) and np.all(gf < 3.0)
    rh_back = np.asarray(kappa_rh_at_diam(
        d_wet, d_dry, jnp.full_like(d_wet, 0.65), float(ENV.kelvin_A)))[alive]
    np.testing.assert_allclose(rh_back, 0.5, rtol=2e-2)


@pytest.mark.slow
def test_ccn_spectrum_monotone():
    st = _populate(128, 96, 1e9)
    from wrf_partmc_tpu.models.partmc.condense import ccn_conc
    supersats = jnp.asarray([1e-4, 1e-3, 3e-3, 1e-2, 5e-2])
    ccn = np.asarray(ccn_conc(st, AD, ENV, supersats))
    assert np.all(np.diff(ccn) >= -1e-6)          # more active at higher S
    assert ccn[-1] <= float(st.total_num()) + 1e-3


# ---------------------------------------------------------------- deposition

def test_deposition_velocity_curve_shape():
    """v_d(D) has the classic minimum in the accumulation mode."""
    d = jnp.asarray([[1e-8, 3e-7, 1e-5]])
    rho = jnp.full_like(d, 1800.0)
    vd = np.asarray(deposition_velocity(d, rho, ENV, r_a=50.0))[0]
    assert vd[0] > vd[1] and vd[2] > vd[1], vd
    assert np.all(vd > 0)


# --------------------------------------------------------------- diagnostics

def test_mixing_state_internal_vs_external():
    # internal: every particle 50/50 SO4+BC -> chi = 1
    st = zero_state(AD, 8, ())
    vol = np.zeros((S, 8), np.float32)
    vol[AD.spec_by_name("SO4"), :4] = 0.5e-21
    vol[AD.spec_by_name("BC"), :4] = 0.5e-21 * 1.0  # equal mass fractions need density care
    st_int = dataclasses.replace(st, vol=jnp.asarray(vol),
                                 num=jnp.asarray([1.0] * 4 + [0.0] * 4, jnp.float32))
    chi_i, da_i, dg_i = map(float, mixing_state_metrics(st_int, AD))
    assert abs(chi_i - 1.0) < 1e-3
    # external: half pure SO4, half pure BC (equal total masses) -> chi = 0
    vol = np.zeros((S, 8), np.float32)
    vol[AD.spec_by_name("SO4"), :2] = 1e-21
    vol[AD.spec_by_name("BC"), 2:4] = 1e-21
    st_ext = dataclasses.replace(st, vol=jnp.asarray(vol),
                                 num=jnp.asarray([1.0] * 4 + [0.0] * 4, jnp.float32))
    chi_e, da_e, dg_e = map(float, mixing_state_metrics(st_ext, AD))
    assert chi_e < 1e-3
    assert da_e == 1.0 or abs(da_e - 1.0) < 1e-3
    assert dg_e > 1.5


@pytest.mark.slow
def test_process_diagnostics_shapes_and_sums():
    st = _populate(128, 96, 1e9, cell_shape=(5,))
    bg = make_bin_grid(40, 1e-9, 1e-5)
    env = make_env_state(cell_volume=1.0, cell_shape=(5,))
    diag = jax.jit(lambda s: process(s, AD, env, bg))(st)
    assert diag.num_dist.shape == (5, 40)
    # integral of dN/dlnD over bins recovers the number conc
    n_int = np.asarray(jnp.sum(diag.num_dist, axis=-1) * bg.log_width)
    np.testing.assert_allclose(n_int, np.asarray(diag.num_conc), rtol=1e-4)
    assert np.all(np.asarray(diag.pm10) >= np.asarray(diag.pm25))
    assert np.all(np.asarray(diag.pm25) >= np.asarray(diag.pm1) - 1e-12)


# ------------------------------------------------------------------ box model

def test_box_urban_plume_smoke():
    """Emission + dilution + coagulation box run stays finite and approaches
    the emission/dilution balance scale."""
    gd = make_gas_data()
    emit = _so4_mode(num_conc=2e6, gmd=5e-8)      # rate interp: [# m-3 s-1]
    back = _so4_mode(num_conc=1e8, gmd=1e-7)
    scn = constant_scenario(AD, gd.n_spec, emit, dilution_rate=1e-4,
                            back_dist=back)
    cfg = PartmcConfig(num_particles=64, max_particles=128, n_emit_slots=8,
                       do_deposition=False)
    st = _populate(cfg.max_particles, 64, 1e8, gmd=1e-7)
    box = BoxState(aero=st, gas=zero_gas_state(gd), t=jnp.asarray(0.0))
    out = jax.jit(lambda b: run_box(b, AD, ENV, scn, cfg, 60.0, 30))(box)
    n_final = float(out.aero.total_num())
    assert np.isfinite(n_final) and n_final > 0
    # equilibrium number conc ~ rate/lambda + background = 2e6/1e-4=2e10 (towards it)
    assert n_final > 2e8
    n_alive = int(out.aero.n_alive())
    assert 16 <= n_alive <= 128


# ---------------- dynamic condensation ODE (condense module parity) -------

def test_condense_dynamic_relaxes_to_equilibrium():
    """Subsaturated: the dynamic ODE must land on the kappa-Koehler
    equilibrium water (PartMC condense.F90 vs condense_equilib)."""
    import dataclasses as _dc

    from wrf_partmc_tpu.models.partmc.condense import (condense_dynamic,
                                                       equilib_water)

    ad = AD
    st = zero_state(ad, 16)
    nv = np.zeros((ad.n_spec, 8), np.float32)
    num = np.zeros(8, np.float32)
    for i, d in enumerate([5e-8, 1e-7, 2e-7, 4e-7] * 2):
        nv[ad.spec_by_name("SO4"), i] = np.pi / 6 * d ** 3
        num[i] = 1e8
    st = add_particles(st, jnp.asarray(nv), jnp.asarray(num),
                       jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32), 0.0)
    env = make_env_state(temp=285.0, pressure=9e4, rel_humid=0.9,
                         cell_volume=1.0)
    w_eq = np.asarray(equilib_water(st, ad, env).vol)[ad.i_water][:8]
    st_dyn, s_out = condense_dynamic(st, ad, env, dt=60.0, n_sub=20)
    w_dy = np.asarray(st_dyn.vol)[ad.i_water][:8]
    np.testing.assert_allclose(w_dy, w_eq, rtol=1e-3)
    # subsaturated, tiny vapor sink: S barely moves
    assert abs(float(s_out) - 0.9) < 1e-3


def test_condense_dynamic_activation_and_vapor_closure():
    """Supersaturated parcel: particles above their critical supersaturation
    grow into droplets, depleting the vapor (S decreases), and the water
    gained exactly balances the vapor removed."""
    import dataclasses as _dc

    from wrf_partmc_tpu import constants as c
    from wrf_partmc_tpu.models.partmc.condense import condense_dynamic

    ad = AD
    st = zero_state(ad, 16)
    nv = np.zeros((ad.n_spec, 8), np.float32)
    num = np.zeros(8, np.float32)
    for i, d in enumerate([5e-8, 1e-7, 2e-7, 4e-7] * 2):
        nv[ad.spec_by_name("SO4"), i] = np.pi / 6 * d ** 3
        num[i] = 1e6                                 # 8e6 droplets / m3
    st = add_particles(st, jnp.asarray(nv), jnp.asarray(num),
                       jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32), 0.0)
    env = make_env_state(temp=280.0, pressure=9e4, rel_humid=0.5,
                         cell_volume=1.0)
    env = _dc.replace(env, rel_humid=jnp.asarray(1.004, jnp.float32))

    s0 = 1.004
    st2, s2 = condense_dynamic(st, ad, env, dt=10.0, n_sub=40)
    gf = (np.asarray(st2.wet_diameter()) / np.asarray(st.dry_diameter(ad)))[:8]
    assert (gf > 2.0).all()                      # droplet growth
    assert float(s2) < s0                        # vapor depleted
    # closure: condensed mass == vapor removed (structural in the scheme)
    dm = float(((st2.vol[ad.i_water] - st.vol[ad.i_water])
                * c.WATER_DENSITY * st.num).sum())
    es = 610.78 * np.exp(17.27 * (280.0 - 273.15) / (280.0 - 35.85))
    rv = c.UNIV_GAS_CONST / c.WATER_MOLEC_WEIGHT
    m_vap_sat = es / (rv * 280.0) * 1.0
    np.testing.assert_allclose(dm, (s0 - float(s2)) * m_vap_sat, rtol=5e-2)

# ------------------- advanced diagnostics: optics + mixed counterfactual ----

def _external_bc_so4(capacity=64, n_each=16, d=2e-7):
    """External mixture: n_each BC-only + n_each SO4-only particles, equal
    dry diameters and multiplicities."""
    from wrf_partmc_tpu.models.partmc.aero_data import diam_to_vol

    st = zero_state(AD, capacity)
    v = float(diam_to_vol(jnp.asarray(d)))
    vol = np.zeros((S, 2 * n_each), np.float32)
    vol[AD.spec_by_name("BC"), :n_each] = v
    vol[AD.spec_by_name("SO4"), n_each:] = v
    num = np.full(2 * n_each, 1e8, np.float32)
    src = np.zeros(2 * n_each, np.int32)
    wcl = np.zeros(2 * n_each, np.int32)
    return add_particles(st, jnp.asarray(vol), jnp.asarray(num),
                         jnp.asarray(src), jnp.asarray(wcl))


def test_bin_average_comp_internal_mixing():
    """Composition averaging preserves per-particle dry volume and the size
    distribution, and drives the mixing-state index chi from ~0 (external)
    to ~1 (internal)."""
    from wrf_partmc_tpu.models.partmc.diagnostics import bin_average_comp

    st = _external_bc_so4()
    bg = make_bin_grid(40, 1e-9, 1e-5)
    chi0, _, _ = mixing_state_metrics(st, AD)
    mixed = bin_average_comp(st, AD, bg)
    chi1, _, _ = mixing_state_metrics(mixed, AD)
    assert float(chi0) < 0.05
    assert float(chi1) > 0.95
    # dry volume per particle preserved
    from wrf_partmc_tpu.models.partmc.aero_data import particle_volume
    v0 = particle_volume(st.vol, dry=True, aero_data=AD)
    v1 = particle_volume(mixed.vol, dry=True, aero_data=AD)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-5)


@pytest.mark.slow
def test_process_advanced_optical_counterfactual():
    """Advanced diagnostics: positive scattering/absorption; the
    internally-mixed counterfactual differs from the external mixture
    (BC redistribution changes absorption); plain mode returns zeros."""
    st = _external_bc_so4()
    bg = make_bin_grid(40, 1e-9, 1e-5)
    d = jax.jit(lambda s: process(s, AD, ENV, bg))(st)
    assert float(d.b_scat) > 0.0 and float(d.b_abs) > 0.0
    assert float(d.b_scat_mix) > 0.0
    # counterfactual changes the optics (not identical populations)
    assert abs(float(d.b_abs_mix) - float(d.b_abs)) > 1e-3 * float(d.b_abs)
    # CCN counterfactual: kappa dilution shifts activation
    assert d.ccn_mix.shape == d.ccn.shape
    d0 = process(st, AD, ENV, bg, advanced=False)
    assert float(d0.b_scat) == 0.0 and float(jnp.sum(d0.ccn_mix)) == 0.0
