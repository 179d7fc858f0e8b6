"""Stochastic particle transport vs Eulerian ground truth — the em_uniform /
em_rotational verification strategy (SURVEY 4.1): the same run advects the
NUM_CONC tracer field Eulerian-ly, and the particle field must track it."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.config import DomainConfig, PartmcConfig, uniform_test_config
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.coupled.driver import (
    CoupledState, coupled_step, init_coupled, run_coupled)
from wrf_partmc_tpu.models.coupled.init import populate_from_number_field
from wrf_partmc_tpu.models.coupled.transport import (
    rebucket, transport_step, vertical_operator)
from wrf_partmc_tpu.models.dycore.ideal import init_rotational, init_uniform
from wrf_partmc_tpu.models.dycore.state import base_profiles
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data
from wrf_partmc_tpu.models.partmc.scenario import constant_scenario
from wrf_partmc_tpu.models.partmc.dist import make_mode
from wrf_partmc_tpu.utils import rng

AD = make_aero_data()
GD = make_gas_data()


def _cfg(nx=16, ny=16, nz=4, n_part=32, cap=96, ztop=10000.0):
    cfg = uniform_test_config()
    return cfg.replace(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0, ztop=ztop),
        partmc=PartmcConfig(num_particles=n_part, max_particles=cap,
                            do_coagulation=False, do_emission=False,
                            do_deposition=False, do_transport=True),
    )


def _scn():
    vf = np.zeros(AD.n_spec)
    vf[0] = 1.0
    return constant_scenario(AD, GD.n_spec, make_mode(0.0, 1e-7, 1.6, vf))


def _particle_conc(cs, grid):
    """[nz, ny, nx] number conc from the particle field."""
    V = grid.cell_volume.reshape(-1, 1, 1)
    return np.asarray(cs.aero.total_num() / V)


def _tracer_conc(cs, grid):
    rho_b, _, _ = base_profiles(grid)
    air = (grid.cell_volume * rho_b).reshape(-1, 1, 1)
    return np.asarray(cs.dyn.num_conc[0] * air / grid.cell_volume.reshape(-1, 1, 1))


@pytest.mark.slow
def test_uniform_particles_track_eulerian_tracer():
    cfg = _cfg()
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, u0=10.0, v0=5.0, blob_conc=1e9)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    aero = populate_from_number_field(AD, cfg, grid, dyn.num_conc[0],
                                      jax.random.key(0))
    cs = dataclasses.replace(cs, aero=aero)
    n0_tot = float(cs.aero.total_num().sum())

    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    scn = _scn()
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, scn, exch, 30))(cs)

    pc = _particle_conc(out, grid)
    tc = _tracer_conc(out, grid)
    # total number conserved through transport + rebalance (statistical:
    # multinomial moves + duplication give a few-percent MC noise over 30
    # steps; the realization depends on the captured probs, so pd vs mono
    # advection shifts it)
    np.testing.assert_allclose(float(out.aero.total_num().sum()), n0_tot, rtol=4e-2)
    # particle field tracks the Eulerian solution
    corr = np.corrcoef(pc.ravel(), tc.ravel())[0, 1]
    assert corr > 0.9, corr
    # blob moved: center of mass of particle field near Eulerian one
    com = lambda f: np.array([ (f.sum(axis=(0, 1)) * np.arange(f.shape[2])).sum(),
                               (f.sum(axis=(0, 2)) * np.arange(f.shape[1])).sum() ]) / f.sum()
    np.testing.assert_allclose(com(pc), com(tc), atol=0.6)


@pytest.mark.slow
def test_rotational_particles_track_cone():
    cfg = _cfg(nx=24, ny=24, nz=2, n_part=48, cap=144)
    grid = make_grid(cfg)
    n_rev = 60
    dyn = init_rotational(cfg, grid, period_s=n_rev * cfg.dynamics.dt, blob_conc=1e9)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    aero = populate_from_number_field(AD, cfg, grid, dyn.num_conc[0],
                                      jax.random.key(1))
    cs = dataclasses.replace(cs, aero=aero)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, _scn(), exch,
                                        n_rev // 2))(cs)
    pc = _particle_conc(out, grid)
    tc = _tracer_conc(out, grid)
    corr = np.corrcoef(pc.ravel(), tc.ravel())[0, 1]
    assert corr > 0.85, corr


@pytest.mark.slow
def test_vertical_operator_row_stochastic_and_mixing():
    cfg = _cfg(nz=6)
    grid = make_grid(cfg)
    n_class = cfg.n_class
    zshape = (n_class, grid.nz, grid.ny, grid.nx)
    from wrf_partmc_tpu.ops.advection import OutflowProbs
    zeros = jnp.zeros(zshape, jnp.float32)
    probs = OutflowProbs(xm=zeros, xp=zeros, ym=zeros, yp=zeros,
                         zm=zeros, zp=zeros)
    exch = jnp.full((grid.nz + 1, grid.ny, grid.nx), 500.0, jnp.float32)
    R = vertical_operator(probs, None, exch, grid, cfg, dt=600.0)
    Rn = np.asarray(R)
    np.testing.assert_allclose(Rn.sum(axis=-1), 1.0, atol=1e-5)
    assert Rn.min() >= 0.0
    # with strong mixing, off-diagonal mass appears
    off = Rn[0, 0, 0] - np.diag(np.diag(Rn[0, 0, 0]))
    assert off.sum() > 0.05


@pytest.mark.slow
def test_vertical_mixing_spreads_particles():
    cfg = _cfg(nx=8, ny=8, nz=6, n_part=64, cap=192, ztop=1200.0)
    cfg = cfg.replace(partmc=dataclasses.replace(cfg.partmc, do_transport=True))
    grid = make_grid(cfg)
    # all particles initially in the surface layer
    conc = jnp.zeros((grid.nz, grid.ny, grid.nx)).at[0].set(1e9)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(2))
    from wrf_partmc_tpu.models.dycore.state import zero_dycore_state
    dyn = zero_dycore_state(cfg, grid)
    cs = CoupledState(dyn=dyn, aero=aero,
                      gas=jnp.zeros((grid.nz, grid.ny, grid.nx, GD.n_spec)),
                      step=jnp.asarray(0, jnp.int32))
    exch = jnp.full((grid.nz + 1, grid.ny, grid.nx), 100.0, jnp.float32)
    out = jax.jit(lambda c: run_coupled(c, grid, cfg, AD, GD, _scn(), exch, 20))(cs)
    prof0 = np.asarray(aero.total_num().sum(axis=(1, 2)))
    proff = np.asarray(out.aero.total_num().sum(axis=(1, 2)))
    np.testing.assert_allclose(proff.sum(), prof0.sum(), rtol=2e-2)
    # mass moved upward out of the surface layer
    assert proff[0] < 0.85 * prof0[0]
    assert proff[1:].sum() > 0.1 * prof0.sum()
    # mean height increased
    z = np.asarray(grid.z_half)
    assert (proff * z).sum() / proff.sum() > (prof0 * z).sum() / prof0.sum()


@pytest.mark.slow
def test_rebucket_conserves_and_places():
    cfg = _cfg(nx=4, ny=4, nz=2, n_part=8, cap=16)
    grid = make_grid(cfg)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e8)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(3))
    shp = aero.num.shape
    kk = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    acc = jnp.ones((grid.nz, grid.ny, grid.nx))
    drop = jnp.zeros(shp, bool)
    zero = jnp.zeros(shp, jnp.int32)
    # move every particle one cell +x (periodic)
    out, diag = rebucket(aero, kk, zero, jnp.ones(shp, jnp.int32),
                         jnp.ones(shp, bool), drop, acc, grid, cfg,
                         jax.random.key(9))
    np.testing.assert_allclose(float(out.total_num().sum()),
                               float(aero.total_num().sum()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.total_num()),
        np.asarray(jnp.roll(aero.total_num(), 1, axis=2)), rtol=1e-4)
    assert float(diag["overflow_class"]) == 0.0
    assert float(diag["overflow_free"]) == 0.0

    # vertical collapse to level 0 with a tight per-class cap: shipped-
    # survivor rescale conserves represented number despite class overflow
    cfg2 = cfg.replace(partmc=dataclasses.replace(cfg.partmc, trans_cap_v=4))
    out2, diag2 = rebucket(aero, zero, zero, zero, jnp.zeros(shp, bool),
                           drop, acc, grid, cfg2, jax.random.key(10))
    np.testing.assert_allclose(float(out2.total_num().sum()),
                               float(aero.total_num().sum()), rtol=1e-4)
    assert float(diag2["overflow_class"]) > 0.0
    # upper level fully drained into level 0
    assert float(out2.total_num()[1:].sum()) == 0.0
    tn = np.asarray(out2.total_num()[0])
    np.testing.assert_allclose(tn, np.asarray(aero.total_num()).sum(axis=0),
                               rtol=1e-4)


@pytest.mark.slow
def test_sharded_transport_matches_global_statistics(mesh8):
    """transport_step_sharded on the 2x4 virtual mesh: total represented
    number conserved (periodic), particle cloud tracks the same advection as
    the single-device global-sort path (different RNG stream -> statistical,
    not bitwise, comparison — the reference has the same property across MPI
    decompositions, SURVEY 4.4)."""
    from wrf_partmc_tpu.models.coupled.driver import partmc_to_wrf
    from wrf_partmc_tpu.models.coupled.transport import (
        transport_step_sharded)
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    cfg = _cfg(nx=16, ny=16, nz=4, n_part=16, cap=48)
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, u0=10.0, v0=5.0, blob_conc=1e9)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    aero = populate_from_number_field(AD, cfg, grid, dyn.num_conc[0],
                                      jax.random.key(0))
    dyn2, diag = jax.jit(lambda d: solve_step(d, grid, cfg))(
        partmc_to_wrf(dataclasses.replace(cs, aero=aero), grid, cfg))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)

    n0 = float(aero.total_num().sum())

    step_g = jax.jit(lambda a, k: transport_step(
        a, diag.probs, diag.xkhh, exch, grid, cfg, cfg.dynamics.dt, k))
    step_s = jax.jit(lambda a, k: transport_step_sharded(
        a, diag.probs, diag.xkhh, exch, grid, cfg, cfg.dynamics.dt, k,
        mesh8)[0])
    a_g = aero
    a_s = aero
    for i in range(4):
        key = jax.random.key(100 + i)
        a_g = step_g(a_g, key)
        a_s = step_s(a_s, key)
    ng = float(a_g.total_num().sum())
    ns = float(a_s.total_num().sum())
    np.testing.assert_allclose(ng, n0, rtol=1e-3)
    np.testing.assert_allclose(ns, n0, rtol=1e-3)
    # same transported cloud, statistically: compare column sums
    cg = np.asarray(a_g.total_num()).sum(axis=0)
    cs_ = np.asarray(a_s.total_num()).sum(axis=0)
    corr = np.corrcoef(cg.ravel(), cs_.ravel())[0, 1]
    assert corr > 0.95, corr


@pytest.mark.slow
def test_sharded_transport_open_boundary_outflow(mesh8):
    """Open boundaries: particles advected across the global edge leave the
    domain (outflow-discard, wrf_pmc_trans_aero.F90:811-955), including
    across shard boundaries."""
    from wrf_partmc_tpu.models.coupled.driver import partmc_to_wrf
    from wrf_partmc_tpu.models.coupled.transport import transport_step_sharded
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    cfg = _cfg(nx=16, ny=16, nz=4, n_part=16, cap=48)
    cfg = cfg.replace(boundary=dataclasses.replace(
        cfg.boundary, periodic_x=False, periodic_y=False,
        open_xs=True, open_xe=True, open_ys=True, open_ye=True))
    grid = make_grid(cfg)
    dyn = init_uniform(cfg, grid, u0=10.0, v0=0.0, blob_conc=1e9)
    # uniform particle field: the east-edge cells outflow from step one
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e9)
    cs = init_coupled(cfg, grid, AD, GD, dyn)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(0))
    dyn2, diag = jax.jit(lambda d: solve_step(d, grid, cfg))(
        partmc_to_wrf(dataclasses.replace(cs, aero=aero), grid, cfg))
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    n0 = float(aero.total_num().sum())
    step_s = jax.jit(lambda a, k: transport_step_sharded(
        a, diag.probs, diag.xkhh, exch, grid, cfg, cfg.dynamics.dt, k,
        mesh8)[0])
    a = aero
    for i in range(20):
        a = step_s(a, jax.random.key(i))
    n1 = float(a.total_num().sum())
    assert n1 < n0 * 0.999          # something left through the outflow edge
    assert np.isfinite(np.asarray(a.vol)).all()


def _convergent_probs(grid, n_class, p=0.3):
    """Synthetic outflow probabilities pushing everything toward the domain
    center column (sustained convergent flow — the regime that motivates
    trans_aero_preweight, wrf_pmc_trans_aero.F90:1103-1423)."""
    from wrf_partmc_tpu.ops.advection import OutflowProbs
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    ii = jnp.arange(nx).reshape(1, 1, 1, nx)
    jj = jnp.arange(ny).reshape(1, 1, ny, 1)
    cx, cy = nx // 2, ny // 2
    shape = (n_class, nz, ny, nx)
    xm = jnp.where(ii > cx, p, 0.0) * jnp.ones(shape)
    xp = jnp.where(ii < cx, p, 0.0) * jnp.ones(shape)
    ym = jnp.where(jj > cy, p, 0.0) * jnp.ones(shape)
    yp = jnp.where(jj < cy, p, 0.0) * jnp.ones(shape)
    z = jnp.zeros(shape)
    return OutflowProbs(xm=xm, xp=xp, ym=ym, yp=yp, zm=z, zp=z)


@pytest.mark.slow
def test_preweight_acceptance_marks_convergence_target():
    from wrf_partmc_tpu.models.coupled.transport import (
        horizontal_diffusion_probs, normalized_face_probs,
        preweight_acceptance, vertical_operator)
    cfg = _cfg(nx=9, ny=9, nz=2, n_part=32, cap=64)
    grid = make_grid(cfg)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e8)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(4))
    probs = _convergent_probs(grid, cfg.n_class)
    xkhh = jnp.zeros((grid.nz, grid.ny, grid.nx), jnp.float32)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    ph = normalized_face_probs(probs, horizontal_diffusion_probs(
        xkhh, grid, cfg.dynamics.dt))
    R = vertical_operator(probs, None, exch, grid, cfg, cfg.dynamics.dt)
    acc = np.asarray(preweight_acceptance(aero, ph, R, grid, cfg))
    cx, cy = grid.nx // 2, grid.ny // 2
    # center receives ~ (1 + 4*0.3) * n_ideal > trigger is False at 2.0...
    # expected arrivals = n*(1-0) stay + 4 * 0.3 n = 2.2 n > 2 n -> acc < 1
    assert acc[0, cy, cx] < 1.0
    # interior non-center cells stay at acceptance 1
    assert acc[0, 1, 1] == 1.0
    assert 0.0 < acc.min() <= 1.0


@pytest.mark.slow
def test_convergent_flow_conserves_number_with_preweight():
    """Sustained convergent flow with tight capacity: represented number is
    conserved (preweight thinning + multiplicity rescale), and the hot cell's
    computational count stays bounded — round 1's survivor-clipping is no
    longer the primary mechanism."""
    cfg = _cfg(nx=9, ny=9, nz=2, n_part=24, cap=48)
    grid = make_grid(cfg)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e8)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(5))
    probs = _convergent_probs(grid, cfg.n_class)
    xkhh = jnp.zeros((grid.nz, grid.ny, grid.nx), jnp.float32)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    n0 = float(aero.total_num().sum())
    step = jax.jit(lambda a, k: transport_step(
        a, probs, xkhh, exch, grid, cfg, cfg.dynamics.dt, k))
    a = aero
    for i in range(25):
        a = step(a, jax.random.key(10 + i))
    n1 = float(a.total_num().sum())
    # expectation-exact; arrivals at the capacity-pinned hot cell are thinned
    # with small acceptance (multiplicity / acc), so realizations carry large
    # MC noise — same property as the reference's Poisson entry sampling
    np.testing.assert_allclose(n1, n0, rtol=0.25)
    # computational count in the hot cell bounded by capacity without the
    # represented number there being clipped: the center holds most mass
    cx, cy = grid.nx // 2, grid.ny // 2
    assert int(a.n_alive()[0, cy, cx]) <= cfg.partmc.max_particles
    center_frac = float(a.total_num()[:, cy, cx].sum()) / n1
    assert center_frac > 0.5, center_frac


@pytest.mark.slow
def test_sharded_convergent_flow_conserves_number(mesh8):
    """The sharded path under convergent flow across shard boundaries: face
    buffers + preweight must conserve represented number (round 1 dropped
    face-buffer overflow)."""
    from wrf_partmc_tpu.models.coupled.transport import transport_step_sharded
    cfg = _cfg(nx=16, ny=16, nz=2, n_part=24, cap=48)
    grid = make_grid(cfg)
    conc = jnp.full((grid.nz, grid.ny, grid.nx), 1e8)
    aero = populate_from_number_field(AD, cfg, grid, conc, jax.random.key(6))
    probs = _convergent_probs(grid, cfg.n_class)
    xkhh = jnp.zeros((grid.nz, grid.ny, grid.nx), jnp.float32)
    exch = jnp.zeros((grid.nz + 1, grid.ny, grid.nx), jnp.float32)
    n0 = float(aero.total_num().sum())
    step = jax.jit(lambda a, k: transport_step_sharded(
        a, probs, xkhh, exch, grid, cfg, cfg.dynamics.dt, k, mesh8)[0])
    a = aero
    for i in range(15):
        a = step(a, jax.random.key(30 + i))
    n1 = float(a.total_num().sum())
    np.testing.assert_allclose(n1, n0, rtol=0.25)


def test_vertical_operator_matches_matrix_exponential_strong_mixing():
    """VERDICT r3 item 8: PBL-strength K (K ~ 500 m2/s, dz ~ 100 m, dt 600 s
    needs N ~ 360 substeps) must not be biased by a substep cap; B^N via
    repeated squaring must match the exact generator exponential exp(dt L)."""
    import scipy.linalg

    cfg = _cfg(nx=2, ny=2, nz=8, ztop=800.0)     # dz = 100 m
    grid = make_grid(cfg)
    n_class = cfg.n_class
    from wrf_partmc_tpu.ops.advection import OutflowProbs
    zeros = jnp.zeros((n_class, grid.nz, grid.ny, grid.nx), jnp.float32)
    probs = OutflowProbs(xm=zeros, xp=zeros, ym=zeros, yp=zeros,
                         zm=zeros, zp=zeros)
    K = 500.0
    dt = 600.0
    exch = jnp.full((grid.nz + 1, grid.ny, grid.nx), K, jnp.float32)
    R = np.asarray(vertical_operator(probs, None, exch, grid, cfg, dt=dt)
                   )[0, 0, 0]                    # [nz, nz]

    # exact exponential of the density-weighted diffusion generator
    rho_b, _, _ = base_profiles(grid)
    rho = np.asarray(rho_b)
    dz = np.asarray(grid.dz)
    dzf = np.asarray(grid.z_half[1:] - grid.z_half[:-1])
    nz = grid.nz
    L = np.zeros((nz, nz))
    for k in range(nz - 1):
        rho_f = 0.5 * (rho[k] + rho[k + 1])
        c = rho_f * K / dzf[k]
        L[k, k + 1] += c / (rho[k] * dz[k])
        L[k, k] -= c / (rho[k] * dz[k])
        L[k + 1, k] += c / (rho[k + 1] * dz[k + 1])
        L[k + 1, k + 1] -= c / (rho[k + 1] * dz[k + 1])
    E = scipy.linalg.expm(dt * L)
    np.testing.assert_allclose(R, E, atol=5e-3)
    # and conservation: rho dz weighted column mass preserved by R
    w = rho * dz
    np.testing.assert_allclose(w @ R, w, rtol=1e-3)


def test_em_uniform_coupled_step_no_cap_overflow():
    """Hygiene guard (VERDICT r4 item 8): at the em_uniform contract's
    mixing strength the default mover caps must NOT saturate — the
    conserving overflow rescale is a backstop, not a steady-state path.
    A cap regression (or a rank-computation bug inflating mover counts)
    shows up here as overflow_class > 0 instead of only in the bench."""
    import __graft_entry__ as ge

    step_fn, cs = ge._build(nx=10, ny=10, nz=6, n_part=96, cap=144,
                            chem_on=False, diag_out=True)
    step = jax.jit(step_fn)
    tot = {"overflow_class": 0.0, "overflow_free": 0.0, "movers": 0.0}
    out = cs
    for _ in range(8):
        out, diag = step(out)
        for k in tot:
            tot[k] += float(diag[k])
    assert tot["movers"] > 0.0                     # transport actually ran
    assert tot["overflow_class"] == 0.0, tot
    assert tot["overflow_free"] == 0.0, tot
