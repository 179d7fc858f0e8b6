#!/usr/bin/env python
"""Breakdown of the r5 rebucket internals at the em_uniform contract."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/wpmc_xla"))

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                   uniform_test_config)
from wrf_partmc_tpu.grid import make_grid
from wrf_partmc_tpu.models.coupled import transport as T
from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
from wrf_partmc_tpu.models.partmc.aero_state import (payload_channel_list,
                                                     zero_state)
from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h
from wrf_partmc_tpu.ops.advection import OutflowProbs
from wrf_partmc_tpu.ops.place import MAX_CH, gather_rows, scatter_rows

nx = ny = 40
nz = 10
n_part, cap = 1000, 1280
cfg = uniform_test_config().replace(
    domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                        ztop=2000.0),
    partmc=PartmcConfig(num_particles=n_part, max_particles=cap))
cfg = cfg.replace(n_class=8)
grid = make_grid(cfg)
ad = make_aero_data()
key = jax.random.key(1)
aero = zero_state(ad, cap, cell_shape=(nz, ny, nx))
# ~1000 alive per cell with random classes
u0 = jax.random.uniform(jax.random.key(2), aero.num.shape)
aero = dataclasses.replace(
    aero, num=jnp.where(u0 < n_part / cap, 1e6, 0.0),
    w_class=jax.random.randint(jax.random.key(3), aero.num.shape, 0, 8),
    vol=jnp.where((u0 < n_part / cap)[..., None, :], 1e-20, 0.0))

P = cap
C = nz * ny * nx
Av, Ah = T._caps(cfg, P, nz)
F1 = nz * Av + 4 * Ah
AB = Av + 4 * Ah
D = nz + 4

# a realistic move sample
z4 = jnp.zeros((8, nz, ny, nx), jnp.float32)
probs = OutflowProbs(xm=z4 + 0.01, xp=z4 + 0.01, ym=z4 + 0.01, yp=z4 + 0.01,
                     zm=z4 + 0.05, zp=z4 + 0.05)
exch = k_profile_exch_h(grid, 0.4, 800.0)
xkhh = jnp.zeros((nz, ny, nx), jnp.float32)
ph = T.normalized_face_probs(probs, T.horizontal_diffusion_probs(
    xkhh, grid, cfg.dynamics.dt, cfg=cfg))
R = T.vertical_operator(probs, xkhh, exch, grid, cfg, cfg.dynamics.dt)
acc = T.preweight_acceptance(aero, ph, R, grid, cfg)
dj, di, dest_k, horizontal = jax.jit(
    lambda a: T.sample_moves(a, ph, R, cfg.n_class, key))(aero)
drop = jnp.zeros(dj.shape, bool)


def tm(name, fn, *args, n=4):
    fj = jax.jit(fn)
    y = jax.block_until_ready(fj(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        y = jax.block_until_ready(fj(*args))
    print(f"  {name:32s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")
    return y


def phase1a(a):
    kk = lax.broadcasted_iota(jnp.int32, a.num.shape, 0)
    alive = a.alive
    vert = (~horizontal) & (dest_k != kk)
    hdir = jnp.where(di < 0, 0, jnp.where(di > 0, 1, jnp.where(dj < 0, 2, 3)))
    dcode4 = jnp.where(vert, dest_k, jnp.where(horizontal, nz + hdir, -1))
    dcode4 = jnp.where(alive, dcode4, -1)
    dcode = dcode4.reshape(C, P)
    mover = dcode >= 0
    num_flat = a.num.reshape(C, P)
    oh = (dcode[:, None, :] == jnp.arange(D, dtype=jnp.int32)[None, :, None]
          ).astype(jnp.bfloat16)
    tri = (jnp.arange(P)[:, None] < jnp.arange(P)[None, :]).astype(jnp.bfloat16)
    pre = jnp.einsum("cdq,qp->cdp", oh, tri,
                     preferred_element_type=jnp.float32)
    rank_p = jnp.einsum("cdp,cdp->cp", oh, pre)
    cnt = jnp.sum(oh, axis=-1, dtype=jnp.float32)
    cnt4 = cnt.reshape(nz, ny, nx, D)
    offs4 = jnp.cumsum(cnt4, axis=0) - cnt4
    is_v_d = jnp.arange(D) < nz
    offs_cd = jnp.where(is_v_d, offs4, 0.0).reshape(C, D)
    offs_p = jnp.einsum("cdp,cd->cp", oh, offs_cd)
    rank_g = (rank_p + offs_p).astype(jnp.int32)
    is_v_p = dcode < nz
    cap_p = jnp.where(is_v_p, Av, Ah)
    ship = mover & (rank_g < cap_p)
    base_p = jnp.where(is_v_p, dcode * Av, nz * Av + (dcode - nz) * Ah)
    dst1 = jnp.where(ship, base_p + rank_g, -1)
    tot_cd = jnp.einsum("cdp,cp->cd", oh, num_flat)
    shp_cd = jnp.einsum("cdp,cp->cd", oh, jnp.where(ship, num_flat, 0.0))
    return dst1, ship, tot_cd, shp_cd, mover


dst1, ship, _, _, mover = tm("phase1a (ranks+caps)", phase1a, aero)


def rank_mm(a):
    kk = lax.broadcasted_iota(jnp.int32, a.num.shape, 0)
    vert = (~horizontal) & (dest_k != kk)
    hdir = jnp.where(di < 0, 0, jnp.where(di > 0, 1, jnp.where(dj < 0, 2, 3)))
    dcode4 = jnp.where(vert, dest_k, jnp.where(horizontal, nz + hdir, -1))
    dcode = jnp.where(a.alive, dcode4, -1).reshape(C, P)
    oh = (dcode[:, None, :] == jnp.arange(D, dtype=jnp.int32)[None, :, None]
          ).astype(jnp.bfloat16)
    tri = (jnp.arange(P)[:, None] < jnp.arange(P)[None, :]).astype(jnp.bfloat16)
    pre = jnp.einsum("cdq,qp->cdp", oh, tri,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("cdp,cdp->cp", oh, pre)


tm("  rank matmul only", rank_mm, aero)

parts0 = [x.reshape(C, P) for x in payload_channel_list(aero)]
CH = len(parts0)
ch_block = max(4, min(CH, MAX_CH, (3 * 1024 ** 3) // (C * F1 * 4 * 2)))
n_blk = -(-CH // ch_block)
ch_block = -(-CH // n_blk)
bounds = [(b * ch_block, min((b + 1) * ch_block, CH)) for b in range(n_blk)]
print(f"  (CH={CH}, slabs={bounds})")
roll = lambda s, sh, ax: jnp.roll(s, sh, ax)


def t1(a):
    parts = [x.reshape(C, P) for x in payload_channel_list(a)]
    outs = []
    for lo, hi in bounds:
        pb = jnp.stack(parts[lo:hi], axis=1)
        src = jnp.where(ship[:, None, :], pb, 0.0)
        minis_b = scatter_rows(src, dst1, F1)
        outs.append(T._reorder_minis(minis_b, nz, ny, nx, hi - lo, Av, Ah,
                                     roll))
    return outs


arr_slabs = tm("T1 (slab scatters+reorder)", t1, aero)


def t1_scatter_only(a):
    parts = [x.reshape(C, P) for x in payload_channel_list(a)]
    outs = []
    for lo, hi in bounds:
        pb = jnp.stack(parts[lo:hi], axis=1)
        src = jnp.where(ship[:, None, :], pb, 0.0)
        outs.append(scatter_rows(src, dst1, F1)[:, :, ::7].sum())
    return outs


tm("  T1 scatters only", t1_scatter_only, aero)

a_num = arr_slabs[0][:, 0, :]
acc_c = acc.reshape(C, 1)
u = jax.random.uniform(key, (C, AB))
keep = (u < acc_c) & (a_num > 0.0)
a_num_th = jnp.where(keep, a_num / jnp.maximum(acc_c, 1e-6), 0.0)
stay_keep = aero.alive.reshape(C, P) & ~mover
free = ~stay_keep
n_free = jnp.sum(free, axis=-1)
f_rank = jnp.cumsum(free.astype(jnp.int32), axis=-1) - 1
k_rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
placed = keep & (k_rank < n_free[:, None])
n_kept = jnp.sum(placed.astype(jnp.int32), axis=-1)
dstc = jnp.where(placed, k_rank, -1)
srcp = jnp.where(free & (f_rank < n_kept[:, None]), f_rank, -1)


def t2(a):
    parts = [x.reshape(C, P) for x in payload_channel_list(a)]
    sk = stay_keep[:, None, :]
    outs = []
    for (lo, hi), arr_b in zip(bounds, arr_slabs):
        arrc_b = scatter_rows(arr_b, dstc, AB)
        arrived_b = gather_rows(arrc_b, srcp)
        pay_b = jnp.stack(parts[lo:hi], axis=1)
        outs.append((arrived_b + pay_b * sk).sum())
    return outs


tm("T2 (compact+gather+merge)", t2, aero)


def t2_gather_only(a):
    outs = []
    for (lo, hi), arr_b in zip(bounds, arr_slabs):
        arrc_b = scatter_rows(arr_b, dstc, AB)
        outs.append(gather_rows(arrc_b, srcp)[:, :, ::7].sum())
    return outs


tm("  T2 scatter+gather only", t2_gather_only, aero)

rb = lambda a: T.rebucket(a, dest_k, dj, di, horizontal, drop, acc, grid,
                          cfg, key)
tm("rebucket (full)", rb, aero)
