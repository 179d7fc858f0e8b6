"""CARES-width weight-class universe (~40 classes; VERDICT r4 item 4).

The reference discovers ~40 weight classes from its IC/BC/emission sources
(``wrf_pmc_init.F90:1291-1431``) and advects one NUM_CONC tracer per class
(``registry.partmc_trans``).  These tests run the coupled model at that
width on the virtual mesh and check the per-class machinery stays correct
and class-count-independent in loop structure."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_universe_discovers_40_classes():
    import __graft_entry__ as ge

    step_fn, cs = ge._build(nx=6, ny=6, nz=4, n_part=8, cap=24,
                            everything_on=False, chem_on=False,
                            n_sources=38)
    # 1 IC + 38 emission sources -> 39 sources/classes, n_class >= 39
    assert cs.dyn.num_conc.shape[0] >= 39


@pytest.mark.slow
def test_40class_coupled_step_and_transport_statistics():
    """Full coupled steps at 40 classes: finite, number-conserving
    (periodic, no removal processes), and the per-class tracer copy keeps
    every class's represented number consistent with the particle
    population."""
    import __graft_entry__ as ge
    from wrf_partmc_tpu.models.partmc import aero_state as A

    step_fn, cs = ge._build(nx=8, ny=8, nz=4, n_part=32, cap=96,
                            everything_on=False, chem_on=False,
                            n_sources=38)
    C = cs.dyn.num_conc.shape[0]
    assert C >= 39
    step = jax.jit(step_fn)
    n0 = float(cs.aero.total_num().sum())
    out = cs
    for _ in range(4):
        out = step(out)
    assert np.isfinite(np.asarray(out.dyn.theta_p)).all()
    n1 = float(out.aero.total_num().sum())
    np.testing.assert_allclose(n1, n0, rtol=1e-3)

    # per-class counts from the particle arrays match the one-hot path used
    # by transport (num_by_class) — classes above the populated set empty
    nbc = np.asarray(out.aero.num_by_class(C))            # [nz,ny,nx,C]
    w = np.asarray(out.aero.w_class)
    num = np.asarray(out.aero.num)
    for ci in (0, 1, C - 1):
        direct = (num * (w == ci)).sum()
        np.testing.assert_allclose(nbc[..., ci].sum(), direct, rtol=1e-4)


@pytest.mark.slow
def test_40class_vertical_sampling_matches_narrow():
    """_sample_dest_k's per-destination-level gather must give the same
    statistics regardless of class width: a 2-class R replicated to 40
    classes yields the same destination distribution for the same
    particles."""
    from wrf_partmc_tpu.config import uniform_test_config, DomainConfig, \
        PartmcConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled.init import populate_from_number_field
    from wrf_partmc_tpu.models.coupled.transport import (_class_onehot,
                                                         _sample_dest_k)
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data

    AD = make_aero_data()
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=6, ny=6, nz=6, dx=2000.0, dy=2000.0,
                            ztop=1200.0),
        partmc=PartmcConfig(num_particles=64, max_particles=96))
    grid = make_grid(cfg)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e8)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(2))

    # a mixing matrix R: each row moves 50% down-one-level, 50% stay
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    eye = jnp.eye(nz)
    R1 = 0.5 * eye + 0.5 * jnp.eye(nz, k=-1)
    R1 = R1.at[0, 0].set(1.0)
    u2 = jax.random.uniform(jax.random.key(7), aero.num.shape)

    for C in (2, 40):
        R = jnp.broadcast_to(R1, (C, ny, nx, nz, nz))
        w_class = aero.w_class % C
        oh = _class_onehot(w_class, C)
        dest = _sample_dest_k(R, oh, u2, nz)
        # identical u2 + identical per-class rows -> identical destinations
        if C == 2:
            ref = dest
        else:
            np.testing.assert_array_equal(np.asarray(dest), np.asarray(ref))
    # and the sampled distribution honors R: ~half the alive particles at
    # level k>0 move down one level
    kk = jax.lax.broadcasted_iota(jnp.int32, aero.num.shape, 0)
    moved = np.asarray((dest == kk - 1) & aero.alive & (kk > 0))
    frac = moved.sum() / max(np.asarray(aero.alive & (kk > 0)).sum(), 1)
    assert 0.4 < frac < 0.6, frac
