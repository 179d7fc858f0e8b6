"""Core runtime tests: grid/base state, mesh policy, stencil ops, halo
exchange on a virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wrf_partmc_tpu import constants as c
from wrf_partmc_tpu.config import Config, uniform_test_config
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.ops.stencil import AXIS_X, AXIS_Y, shift
from wrf_partmc_tpu.parallel import halo
from wrf_partmc_tpu.parallel.mesh import factor_2d, field_sharding, make_mesh


def test_grid_base_state_hydrostatic():
    cfg = uniform_test_config()
    g = make_grid(cfg)
    assert g.nx == 40 and g.ny == 40 and g.nz == 10
    # pressure decreases with height, heights increase
    assert np.all(np.diff(np.asarray(g.p_base)) < 0)
    assert np.all(np.diff(np.asarray(g.z_full)) > 0)
    # hydrostatic consistency: dp = -rho g dz within discretization error
    p = np.asarray(g.p_base)
    dz = np.asarray(g.dz)
    rho = 1.0 / np.asarray(g.alpha_base)
    dp_num = np.diff(p)
    dp_hyd = (-rho * c.GRAV * dz)[:-1] * 0.5 + (-rho * c.GRAV * dz)[1:] * 0.5
    assert np.allclose(dp_num, dp_hyd, rtol=0.06)


def test_factor_2d():
    assert factor_2d(8) == (2, 4)
    assert factor_2d(4) == (2, 2)
    assert factor_2d(7) == (1, 7)
    assert factor_2d(1) == (1, 1)


def test_shift_periodic_and_clamp():
    a = jnp.arange(5.0)[None, None, :] * jnp.ones((2, 3, 5))
    sp = shift(a, 2, AXIS_X, "periodic")
    np.testing.assert_allclose(np.asarray(sp)[0, 0], [2, 3, 4, 0, 1])
    sc = shift(a, 2, AXIS_X, "clamp")
    np.testing.assert_allclose(np.asarray(sc)[0, 0], [2, 3, 4, 4, 4])
    sm = shift(a, -1, AXIS_X, "clamp")
    np.testing.assert_allclose(np.asarray(sm)[0, 0], [0, 0, 1, 2, 3])


@pytest.mark.parametrize("periodic", [True, False])
def test_halo_exchange_matches_global_stencil(mesh8, periodic):
    nz, ny, nx = 3, 8, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nz, ny, nx)), dtype=jnp.float32)
    h = 2

    def local_fn(blk):
        return halo.exchange_2d(blk, h, periodic=(periodic, periodic))

    padded = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh8, in_specs=P(None, "y", "x"),
            out_specs=P(None, "y", "x"),
        )
    )(x)
    # each local block [nz, 4+2h, 4+2h] concatenates to [nz, ny+py*2h, nx+px*2h]
    padded = np.asarray(padded)
    py, px = 2, 4
    ly, lx = ny // py, nx // px
    xg = np.asarray(x)
    for by in range(py):
        for bx in range(px):
            blk = padded[:, by * (ly + 2 * h):(by + 1) * (ly + 2 * h),
                         bx * (lx + 2 * h):(bx + 1) * (lx + 2 * h)]
            for jj in range(ly + 2 * h):
                gj = by * ly + jj - h
                for ii in range(lx + 2 * h):
                    gi = bx * lx + ii - h
                    if periodic:
                        exp = xg[:, gj % ny, gi % nx]
                    else:
                        exp = xg[:, np.clip(gj, 0, ny - 1) if 0 <= gj < ny or True else 0,
                                 np.clip(gi, 0, nx - 1)]
                        exp = xg[:, int(np.clip(gj, 0, ny - 1)), int(np.clip(gi, 0, nx - 1))]
                    np.testing.assert_allclose(blk[:, jj, ii], exp, err_msg=f"{by},{bx},{jj},{ii}")


def test_neighbor_shift_roundtrip(mesh8):
    x = jnp.arange(8.0).reshape(1, 2, 4) * jnp.ones((3, 2, 4))

    def fn(blk):
        fwd = halo.neighbor_shift(blk, +1, "x")
        return halo.neighbor_shift(fwd, -1, "x")

    out = jax.jit(
        jax.shard_map(fn, mesh=mesh8, in_specs=P(None, "y", "x"),
                      out_specs=P(None, "y", "x"))
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_sharded_roll_matches_single_device(mesh8):
    """Stencil-by-roll under GSPMD sharding == unsharded result (the automatic
    halo path the dycore relies on)."""
    nz, ny, nx = 4, 8, 16
    x = jnp.asarray(np.random.default_rng(1).standard_normal((nz, ny, nx)), jnp.float32)

    def lap(a):
        return (shift(a, 1, AXIS_X) + shift(a, -1, AXIS_X)
                + shift(a, 1, AXIS_Y) + shift(a, -1, AXIS_Y) - 4 * a)

    expect = lap(x)
    xs = jax.device_put(x, field_sharding(mesh8))
    got = jax.jit(lap)(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_config_hashable_and_namelist_shim():
    cfg = Config()
    hash(cfg)  # must be usable as a static jit arg
    from wrf_partmc_tpu.config import namelist_to_config

    cfg2 = namelist_to_config({
        "domains": {"e_we": 11, "e_sn": 21, "e_vert": 6, "dx": 500.0, "dy": 500.0},
        "partmc": {"num_particles": 32, "do_coagulation": False},
    })
    assert cfg2.domain.nx == 10 and cfg2.domain.ny == 20 and cfg2.domain.nz == 5
    assert cfg2.partmc.num_particles == 32 and not cfg2.partmc.do_coagulation


def test_clock_alarms():
    from wrf_partmc_tpu.utils.clock import Clock

    ck = Clock(dt=10.0, t_stop=100.0)
    ck.add_alarm("hist", 30.0)
    fires = []
    while not ck.done():
        if ck.ringing("hist"):
            fires.append(ck.t)
        ck.advance()
    assert fires == [0.0, 30.0, 60.0, 90.0]


# ----------------- config cross-validation (check_a_mundo) ----------------

def test_validate_config_accepts_defaults():
    from wrf_partmc_tpu.config import Config, validate_config

    validate_config(Config())
    from wrf_partmc_tpu.config import uniform_test_config
    validate_config(uniform_test_config())


def test_validate_config_catches_bad_combos():
    import dataclasses

    import pytest

    from wrf_partmc_tpu.config import Config, validate_config

    cfg = Config()
    bad = [
        cfg.replace(partmc=dataclasses.replace(cfg.partmc, max_particles=4,
                                               num_particles=8)),
        cfg.replace(partmc=dataclasses.replace(cfg.partmc,
                                               partmc_chem_dt=25.0)),
        cfg.replace(dynamics=dataclasses.replace(cfg.dynamics,
                                                 chem_adv_opt="weno9")),
        cfg.replace(boundary=dataclasses.replace(cfg.boundary, open_xs=True,
                                                 periodic_x=True)),
        cfg.replace(partmc=dataclasses.replace(cfg.partmc, do_mosaic=True,
                                               chem_mech="cbmz")),
        cfg.replace(n_class=0),
    ]
    for c in bad:
        with pytest.raises(ValueError):
            validate_config(c)
