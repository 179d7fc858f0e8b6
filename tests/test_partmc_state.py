"""AeroState container invariants: sampling, add/compact/thin/split/rebalance."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.models.partmc.aero_data import (
    make_aero_data, parse_aero_data_dat, particle_mass, solute_kappa)
from wrf_partmc_tpu.models.partmc.aero_state import (
    add_particles, compact, rebalance, split_largest, thin, zero_state)
from wrf_partmc_tpu.models.partmc.dist import (
    concat_dists, dist_number_conc, make_mode, sample_particles)

AD = make_aero_data()
S = AD.n_spec


def _mode(num_conc=1e9, gmd=1e-7, gsd=1.8, spec="SO4", source=0, w_class=0):
    vf = np.zeros(S)
    vf[AD.spec_by_name(spec)] = 1.0
    return make_mode(num_conc, gmd, gsd, vf, source=source, w_class=w_class)


def test_parse_aero_data_dat():
    txt = """# name density ions mw kappa
    SO4 1800 0 96e-3 0.65
    BC 1800 0 1e-3 0.0
    H2O 1000 0 18e-3 0.0
    """
    ad = parse_aero_data_dat(txt)
    assert ad.names == ("SO4", "BC", "H2O")
    np.testing.assert_allclose(float(ad.kappa[0]), 0.65, rtol=1e-6)
    assert ad.i_water == 2


def test_sample_particles_moments():
    """Sampled population reproduces the log-normal number and mass conc."""
    key = jax.random.key(0)
    dist = _mode(num_conc=1e9, gmd=1e-7, gsd=1.6)
    E = 4096
    V = 1e-3
    vol, num, src, wcl = sample_particles(key, dist, AD, E, V)
    assert vol.shape == (S, E) and num.shape == (E,)
    # number: exact by construction
    np.testing.assert_allclose(float(jnp.sum(num)), 1e9 * V, rtol=1e-5)
    # mass: E[v] = pi/6 gmd^3 exp(4.5 ln(gsd)^2)
    vmean_true = np.pi / 6 * (1e-7) ** 3 * np.exp(4.5 * np.log(1.6) ** 2)
    vmean_est = float(jnp.sum(vol) / jnp.sum(num) * jnp.mean(num) * E / jnp.sum(num) * jnp.sum(num) / E)
    vmean_est = float(jnp.sum(vol) / E)  # per-particle mean sampled volume
    assert abs(vmean_est / vmean_true - 1) < 0.15  # MC tolerance


@pytest.mark.slow
def test_add_particles_and_compact_conserve():
    st = zero_state(AD, capacity=64, cell_shape=(3,))
    key = jax.random.key(1)
    dist = _mode()
    vol, num, src, wcl = sample_particles(key, dist, AD, 16, 1.0, cell_shape=(3,))
    st = add_particles(st, vol, num, src, wcl)
    assert np.all(np.asarray(st.n_alive()) == 16)
    np.testing.assert_allclose(np.asarray(st.total_num()), 1e9, rtol=1e-5)
    # second add appends
    st2 = add_particles(st, vol, num, src, wcl)
    assert np.all(np.asarray(st2.n_alive()) == 32)
    np.testing.assert_allclose(np.asarray(st2.total_num()), 2e9, rtol=1e-5)
    # ids unique among alive
    ids = np.asarray(st2.pid[0][np.asarray(st2.alive[0])])
    assert len(set(ids.tolist())) == len(ids)


def test_add_overflow_conserves_number():
    st = zero_state(AD, capacity=16, cell_shape=())
    dist = _mode()
    key = jax.random.key(2)
    vol, num, src, wcl = sample_particles(key, dist, AD, 12, 1.0)
    st = add_particles(st, vol, num, src, wcl)
    st = add_particles(st, vol, num, src, wcl)  # only 4 of 12 fit
    assert int(st.n_alive()) == 16
    np.testing.assert_allclose(float(st.total_num()), 2e9, rtol=1e-4)


@pytest.mark.slow
def test_thin_conserves_expected_number():
    st = zero_state(AD, capacity=256, cell_shape=())
    dist = _mode()
    vol, num, src, wcl = sample_particles(jax.random.key(3), dist, AD, 256, 1.0)
    st = add_particles(st, vol, num, src, wcl)
    tot0 = float(st.total_num())
    outs = [float(thin(st, 0.5, jax.random.key(i)).total_num()) for i in range(20)]
    assert abs(np.mean(outs) / tot0 - 1) < 0.05
    n_after = int(thin(st, 0.5, jax.random.key(0)).n_alive())
    assert 90 < n_after < 166


@pytest.mark.slow
def test_split_largest_doubles_exactly():
    st = zero_state(AD, capacity=64, cell_shape=())
    dist = _mode()
    vol, num, src, wcl = sample_particles(jax.random.key(4), dist, AD, 20, 1.0)
    st = add_particles(st, vol, num, src, wcl)
    st2 = split_largest(st)
    assert int(st2.n_alive()) == 40
    np.testing.assert_allclose(float(st2.total_num()), float(st.total_num()), rtol=1e-6)
    m1 = float(jnp.sum(particle_mass(st.vol, AD) * st.num))
    m2 = float(jnp.sum(particle_mass(st2.vol, AD) * st2.num))
    np.testing.assert_allclose(m1, m2, rtol=1e-6)


@pytest.mark.slow
def test_rebalance_targets():
    dist = _mode()
    cfg_ideal = 32
    # overpopulated cell -> halving kicks in
    st = zero_state(AD, capacity=256, cell_shape=())
    vol, num, src, wcl = sample_particles(jax.random.key(5), dist, AD, 200, 1.0)
    st = add_particles(st, vol, num, src, wcl)
    st2 = rebalance(st, jax.random.key(6), cfg_ideal)
    assert int(st2.n_alive()) < 200
    np.testing.assert_allclose(float(st2.total_num()), float(st.total_num()), rtol=0.3)
    # underpopulated -> doubling
    st = zero_state(AD, capacity=256, cell_shape=())
    vol, num, src, wcl = sample_particles(jax.random.key(7), dist, AD, 8, 1.0)
    st = add_particles(st, vol, num, src, wcl)
    st3 = rebalance(st, jax.random.key(8), cfg_ideal)
    assert int(st3.n_alive()) == 16
    np.testing.assert_allclose(float(st3.total_num()), float(st.total_num()), rtol=1e-5)


def test_num_by_class():
    st = zero_state(AD, capacity=32, cell_shape=())
    d1 = _mode(num_conc=2e9, w_class=0)
    d2 = _mode(num_conc=1e9, w_class=2)
    dist = concat_dists([d1, d2])
    vol, num, src, wcl = sample_particles(jax.random.key(9), dist, AD, 32, 1.0)
    st = add_particles(st, vol, num, src, wcl)
    by_class = np.asarray(st.num_by_class(4))
    np.testing.assert_allclose(by_class.sum(), 3e9, rtol=1e-4)
    assert by_class[1] == 0 and by_class[3] == 0
    # class split is stochastic (mode choice), but proportions should be near 2:1
    assert 0.5 < by_class[0] / 2e9 < 1.5


def test_solute_kappa_mixing_rule():
    st = zero_state(AD, capacity=4, cell_shape=())
    vol = np.zeros((S, 4), np.float32)
    vol[AD.spec_by_name("SO4"), 0] = 1e-21      # pure SO4: kappa=0.65
    vol[AD.spec_by_name("BC"), 1] = 1e-21       # pure BC: kappa=0
    vol[AD.spec_by_name("SO4"), 2] = 0.5e-21    # 50/50 by volume
    vol[AD.spec_by_name("BC"), 2] = 0.5e-21
    import dataclasses
    st = dataclasses.replace(st, vol=jnp.asarray(vol),
                             num=jnp.ones(4, jnp.float32))
    kap = np.asarray(solute_kappa(st.vol, AD))
    np.testing.assert_allclose(kap[0], 0.65, rtol=1e-5)
    np.testing.assert_allclose(kap[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(kap[2], 0.325, rtol=1e-5)


def test_sampled_mode_reproduces_histogram():
    """AERO_MODE_TYPE_SAMPLED: sampling a binned dist reproduces the bin
    number concentrations (driver :1855 sampled-mode parity)."""
    from wrf_partmc_tpu.models.partmc.dist import from_sampled, sample_particles

    edges = np.array([1e-8, 3e-8, 1e-7, 3e-7, 1e-6], np.float32)
    counts = np.array([1e9, 3e9, 2e9, 5e8], np.float32)
    vf = np.zeros(AD.n_spec, np.float32)
    vf[0] = 1.0
    dist = from_sampled(edges, counts, vf)
    assert dist.n_mode == 4
    vol, num, src, wcl = sample_particles(jax.random.key(3), dist, AD,
                                          4096, 1.0)
    d = np.asarray((6.0 / np.pi * vol.sum(-2)) ** (1.0 / 3.0))
    n = np.asarray(num)
    hist = [n[(d >= edges[i]) & (d < edges[i + 1])].sum() for i in range(4)]
    np.testing.assert_allclose(hist, counts, rtol=0.08)
    np.testing.assert_allclose(n.sum(), counts.sum(), rtol=1e-4)


def test_scenario_linear_time_interp():
    """Emission intensities interpolate linearly between time slabs
    (aero_dist_interp_1d semantics)."""
    import dataclasses as _dc

    from wrf_partmc_tpu.models.partmc.dist import make_mode
    from wrf_partmc_tpu.models.partmc.scenario import (constant_scenario,
                                                       dist_at_time,
                                                       update_gas_state)

    vf = np.zeros(AD.n_spec, np.float32)
    vf[0] = 1.0
    m = make_mode(1e9, 1e-7, 1.6, vf)
    scn = constant_scenario(AD, 4, m)
    two = jax.tree.map(lambda a: jnp.concatenate([a, a], 0), scn.emit_dist)
    two = _dc.replace(two, num_conc=two.num_conc.at[1].set(3e9))
    scn = _dc.replace(scn, emit_times=jnp.asarray([0.0, 100.0]),
                      emit_dist=two,
                      gas_emit_rate=jnp.asarray([[1.0, 0, 0, 0],
                                                 [3.0, 0, 0, 0]], jnp.float32))
    np.testing.assert_allclose(float(dist_at_time(scn, 0.0).num_conc[0]), 1e9)
    np.testing.assert_allclose(float(dist_at_time(scn, 50.0).num_conc[0]),
                               2e9, rtol=1e-6)
    np.testing.assert_allclose(float(dist_at_time(scn, 1000.0).num_conc[0]),
                               3e9, rtol=1e-6)
    g = update_gas_state(scn, jnp.zeros(4), 50.0, 1.0)
    np.testing.assert_allclose(float(g[0]), 2.0, rtol=1e-6)


@pytest.mark.slow
def test_add_particles_large_path_matches_small():
    """E > 64 routes through the MXU place engine; totals and per-source
    masses must match the small-E one-hot path (slot arrangement may
    differ)."""
    import jax
    import jax.numpy as jnp
    from wrf_partmc_tpu.models.partmc.aero_state import add_particles, zero_state

    S = AD.n_spec
    cells = (3, 2)
    key = jax.random.key(11)
    E_small, E_large = 48, 80            # same entries, large is zero-padded
    vol = jax.random.uniform(key, (*cells, S, E_small), jnp.float32) * 1e-20
    num = jnp.where(jax.random.uniform(jax.random.key(1), (*cells, E_small))
                    < 0.9, 5.0, 0.0)
    src = jax.random.randint(jax.random.key(2), (*cells, E_small), 0, 4)
    wcl = jnp.zeros((*cells, E_small), jnp.int32)
    pad = lambda a, fill=0.0: jnp.pad(
        a, [(0, 0)] * (a.ndim - 1) + [(0, E_large - E_small)],
        constant_values=fill)

    st0 = zero_state(AD, 128, cells)
    a = add_particles(st0, vol, num, src, wcl, time=3.0)
    b = add_particles(st0, pad(vol), pad(num), pad(src).astype(jnp.int32),
                      pad(wcl).astype(jnp.int32), time=3.0)
    np.testing.assert_allclose(np.asarray(a.total_num()),
                               np.asarray(b.total_num()), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.num_by_source(5)),
                               np.asarray(b.num_by_source(5)), rtol=1e-6)
    np.testing.assert_allclose(float(a.vol.sum()), float(b.vol.sum()),
                               rtol=1e-6)
    assert int(a.n_alive().sum()) == int(b.n_alive().sum())
