"""Stochastic particle transport driven by captured advective fluxes.

TPU-native redesign of the reference transport stack:

* ``wrf_pmc_trans.F90`` — probability construction: advective outflow
  probabilities (here captured directly by the PD advection,
  ``compute_advect_probs_wrf`` :205-284), 2nd-order horizontal eddy-diffusion
  probabilities from xkhh (``compute_diffusion_probs`` :358-407), and the
  per-column vertical operator R = B^N A (implicit-substep diffusion matrix
  powered to the stable substep count, times the vertical advection matrix;
  ``compute_vertical_probs`` :414-652).
* ``wrf_pmc_trans_aero.F90`` — the per-particle move sampling.  The
  reference's sorted sequential conditional multinomial partition
  (``aero_state_multisample`` :2351-2479) is mathematically an i.i.d.
  categorical draw per particle; with per-particle multiplicities the
  binomial/Poisson weight-ratio corrections (:2250-2318) vanish (number is
  conserved exactly by carrying ``num`` with the particle).  Cross-cell moves
  are realized as one vectorized sort-and-rebucket over the flattened
  particle pool instead of per-cell delta_aero_states + MPI packing
  (:356-804); capacity overflow conserves number by rescaling survivors
  (the preweighting bound, :1374-1402).

Joint sampling factorization: a particle first tries a horizontal move with
probabilities (pxm, pxp, pym, pyp); otherwise its new level is drawn from the
full-column PDF row R[k, :] (which includes staying) — the same composition
of operators as the reference's joint sorted sample.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ...config import Config
from ...grid import Grid
from ...ops.advection import OutflowProbs
from ...models.partmc.aero_state import AeroState
from ...models.dycore.state import base_profiles


def horizontal_diffusion_probs(xkhh, grid: Grid, dt):
    """One-step horizontal eddy-diffusion move probability per lateral face:
    P = K dt / dx^2 (compute_diffusion_probs, density-uniform flat-terrain
    form).  Returns scalar field [nz, ny, nx] applied to all four faces."""
    return jnp.clip(xkhh * dt * grid.rdx * grid.rdx, 0.0, 0.2)


def vertical_operator(probs: OutflowProbs, xkhh_unused, exch_h, grid: Grid,
                      cfg: Config, dt, n_sub_max: int = 16):
    """Per-column, per-class full-level transition matrix R = B^N A.

    exch_h: [nz+1, ny, nx] vertical eddy diffusivity at w levels (the PBL
    ``exch_h`` the reference consumes, ``wrf_pmc_trans.F90:472``).
    probs.zm/zp: [n_class, nz, ny, nx] captured vertical advection
    probabilities.  Returns R: [n_class, ny, nx, nz, nz] row-stochastic.
    """
    nz = grid.nz
    rho_b, _, _ = base_profiles(grid)
    dz = grid.dz                                   # [nz]
    dzf = grid.z_half[1:] - grid.z_half[:-1]       # [nz-1] between levels

    # stability substep count (stable_timestep :626-652):
    # dt_small = 0.1 dz_min^2 / K_max  per column
    k_int = exch_h[1:-1]                           # [nz-1, ny, nx] interior faces
    k_max = jnp.max(k_int, axis=0)                 # [ny, nx]
    dz_min2 = jnp.min(dz) ** 2
    n_need = jnp.ceil(dt * 10.0 * k_max / jnp.maximum(dz_min2, 1e-10))
    n_sub = jnp.clip(n_need, 1, n_sub_max).astype(jnp.int32)      # [ny, nx]
    tau = dt / n_sub.astype(jnp.float32)                          # [ny, nx]

    # one-substep explicit diffusion matrix B [ny, nx, nz, nz]
    rho_f = 0.5 * (rho_b[1:] + rho_b[:-1])                        # [nz-1]
    coef = (rho_f / dzf)[:, None, None] * k_int                   # [nz-1, ny, nx]
    p_up = coef / (rho_b[:-1] * dz[:-1])[:, None, None]           # from k -> k+1
    p_dn = coef / (rho_b[1:] * dz[1:])[:, None, None]             # from k+1 -> k
    p_up = jnp.moveaxis(p_up, 0, -1) * tau[..., None]             # [ny, nx, nz-1]
    p_dn = jnp.moveaxis(p_dn, 0, -1) * tau[..., None]
    # clip for stability regardless of n_sub cap
    p_up = jnp.clip(p_up, 0.0, 0.45)
    p_dn = jnp.clip(p_dn, 0.0, 0.45)

    eye = jnp.eye(nz)
    e_up = jnp.eye(nz, k=1)      # entry (k, k+1)
    e_dn = jnp.eye(nz, k=-1)     # entry (k, k-1)
    up_row = jnp.pad(p_up, ((0, 0), (0, 0), (0, 1)))              # row k -> k+1
    dn_row = jnp.pad(p_dn, ((0, 0), (0, 0), (1, 0)))              # row k -> k-1
    stay = 1.0 - up_row - dn_row
    B = (stay[..., None] * eye + up_row[..., None] * e_up
         + dn_row[..., None] * e_dn)

    # B^N with data-dependent N via masked repeated multiplication
    def body(i, M):
        M2 = jnp.einsum("yxab,yxbc->yxac", M, B)
        take = (i < n_sub)[..., None, None]
        return jnp.where(take, M2, M)

    BN = lax.fori_loop(1, n_sub_max, body, B)
    # row renormalization (reference renormalizes per power step)
    BN = BN / jnp.maximum(jnp.sum(BN, axis=-1, keepdims=True), 1e-12)

    # vertical advection matrix A per class [n_class, ny, nx, nz, nz]
    zm = jnp.moveaxis(probs.zm, 1, -1)             # [n_class, ny, nx, nz]
    zp = jnp.moveaxis(probs.zp, 1, -1)
    stay_a = jnp.clip(1.0 - zm - zp, 0.0, 1.0)
    A = (stay_a[..., None] * eye + zp[..., None] * e_up + zm[..., None] * e_dn)

    R = jnp.einsum("yxab,cyxbd->cyxad", BN, A)
    R = R / jnp.maximum(jnp.sum(R, axis=-1, keepdims=True), 1e-12)
    return R


def _gather_by_class(field_cf, cls_onehot):
    """field_cf: [n_class, nz, ny, nx] -> per-particle values [nz, ny, nx, P]
    via a one-hot contraction over the (small) class axis — lane-axis gathers
    are slow on TPU, tiny einsums are free."""
    f = jnp.moveaxis(field_cf, 0, -1)              # [nz, ny, nx, n_class]
    return jnp.einsum("...c,...pc->...p", f, cls_onehot)


def sample_destinations(aero: AeroState, probs: OutflowProbs, p_hdiff, R,
                        grid: Grid, cfg: Config, key):
    """Per-particle destination cell (k', j', i') — the aero_state_multisample
    equivalent.  Returns int32 arrays [nz, ny, nx, P]."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = aero.capacity
    k_h, k_v = jax.random.split(key)

    cls = aero.w_class                              # [nz, ny, nx, P]
    cls_oh = jax.nn.one_hot(cls, cfg.n_class, dtype=jnp.float32)  # [..., P, C]
    pxm = _gather_by_class(probs.xm, cls_oh) + p_hdiff[..., None]
    pxp = _gather_by_class(probs.xp, cls_oh) + p_hdiff[..., None]
    pym = _gather_by_class(probs.ym, cls_oh) + p_hdiff[..., None]
    pyp = _gather_by_class(probs.yp, cls_oh) + p_hdiff[..., None]
    total_h = pxm + pxp + pym + pyp
    scale = jnp.where(total_h > 1.0, 1.0 / jnp.maximum(total_h, 1e-12), 1.0)
    pxm, pxp, pym, pyp = (p * scale for p in (pxm, pxp, pym, pyp))

    u = jax.random.uniform(k_h, aero.num.shape)
    c1 = pxm
    c2 = c1 + pxp
    c3 = c2 + pym
    c4 = c3 + pyp
    di = jnp.where(u < c1, -1, jnp.where(u < c2, 1, 0))
    dj = jnp.where((u >= c2) & (u < c3), -1, jnp.where((u >= c3) & (u < c4), 1, 0))
    horizontal = u < c4

    # vertical destination from R rows (non-horizontal movers): per-particle
    # CDF via one one-hot contraction over the class axis, then an
    # inverse-CDF count — no per-level loop.
    u2 = jax.random.uniform(k_v, aero.num.shape)
    R_cum = jnp.cumsum(R, axis=-1)                  # [C, ny, nx, nz_src, nzd]
    R_t = jnp.moveaxis(jnp.moveaxis(R_cum, -2, 1), 0, -1)  # [nz,ny,nx,nzd,C]
    cdf = jnp.einsum("...dc,...pc->...pd", R_t, cls_oh)    # [nz,ny,nx,P,nzd]
    dest_k = jnp.sum((u2[..., None] >= cdf).astype(jnp.int32), axis=-1)
    dest_k = jnp.clip(dest_k, 0, nz - 1)

    kk = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx, P), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx, P), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx, P), 2)

    new_k = jnp.where(horizontal, kk, dest_k)
    new_j = jj + dj
    new_i = ii + di
    out = jnp.zeros_like(new_i, dtype=bool)
    if cfg.boundary.periodic_x:
        new_i = new_i % nx
    else:
        out = out | (new_i < 0) | (new_i >= nx)   # leaves the open domain
        new_i = jnp.clip(new_i, 0, nx - 1)
    if cfg.boundary.periodic_y:
        new_j = new_j % ny
    else:
        out = out | (new_j < 0) | (new_j >= ny)
        new_j = jnp.clip(new_j, 0, ny - 1)
    return new_k, new_j, new_i, out


def rebucket(aero: AeroState, new_k, new_j, new_i, grid: Grid) -> AeroState:
    """Move particles to their destination cells with one flattened stable
    sort (replaces per-cell delta_aero_states + neighbor MPI packing,
    ``wrf_pmc_trans_aero.F90:356-804``).  Capacity overflow at a destination
    conserves represented number by rescaling the survivors."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = aero.capacity
    C = nz * ny * nx
    N = C * P

    dest = (new_k * ny + new_j) * nx + new_i        # [nz, ny, nx, P]
    dest_flat = dest.reshape(N)
    alive_flat = aero.alive.reshape(N)
    dest_flat = jnp.where(alive_flat, dest_flat, C)  # dead -> sentinel bucket

    order = jnp.argsort(dest_flat, stable=True)

    counts = jnp.bincount(dest_flat, length=C + 1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts[:-1]).astype(jnp.int32)])

    # per-destination total incoming number (for overflow conservation)
    num_flat = aero.num.reshape(N)
    tot_in = jax.ops.segment_sum(num_flat, dest_flat, num_segments=C + 1)

    # build new [C, P] slot gather indices
    slot = jnp.arange(P, dtype=jnp.int32)
    cells = jnp.arange(C, dtype=jnp.int32)
    src_pos = starts[cells][:, None] + slot[None, :]          # [C, P]
    valid = slot[None, :] < jnp.minimum(counts[cells][:, None], P)
    src_pos = jnp.clip(src_pos, 0, N - 1)
    gather_idx = order[src_pos]                                # [C, P] flat src

    # single packed row-gather for every per-particle field (many separate
    # element-gathers are slow on TPU; one [N, CH] row gather is one pass)
    S = aero.vol.shape[-2]
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    payload = jnp.concatenate(
        [aero.num[..., None], aero.t_create[..., None],
         bc(aero.pid)[..., None], bc(aero.source)[..., None],
         bc(aero.w_class)[..., None],
         jnp.moveaxis(aero.vol, -2, -1)],                     # [.., P, S]
        axis=-1).reshape(N, 5 + S)
    rows = jnp.where(valid[..., None], payload[gather_idx], 0.0)  # [C, P, 5+S]

    num = rows[..., 0]
    kept = jnp.sum(num, axis=-1)                               # [C]
    scale = jnp.where(kept > 0, tot_in[:C] / jnp.maximum(kept, 1e-300), 1.0)
    num = num * scale[:, None]

    ic = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    cshape = (nz, ny, nx, P)
    return dataclasses.replace(
        aero,
        vol=jnp.moveaxis(rows[..., 5:].reshape(*cshape, S), -1, -2),
        num=num.reshape(cshape),
        pid=ic(rows[..., 2]).reshape(cshape),
        source=ic(rows[..., 3]).reshape(cshape),
        w_class=ic(rows[..., 4]).reshape(cshape),
        t_create=rows[..., 1].reshape(cshape),
    )


def transport_step(aero: AeroState, probs: OutflowProbs, xkhh, exch_h,
                   grid: Grid, cfg: Config, dt, key) -> AeroState:
    """Full stochastic transport step (wrf_pmc_trans_driver equivalent).
    Particles sampled across an open lateral boundary are removed (the
    outflow-discard of ``wrf_pmc_trans_aero.F90:811-955``)."""
    p_hdiff = horizontal_diffusion_probs(xkhh, grid, dt)
    R = vertical_operator(probs, xkhh, exch_h, grid, cfg, dt)
    new_k, new_j, new_i, out = sample_destinations(aero, probs, p_hdiff, R,
                                                   grid, cfg, key)
    if not (cfg.boundary.periodic_x and cfg.boundary.periodic_y):
        aero = dataclasses.replace(
            aero, num=jnp.where(out, 0.0, aero.num),
            vol=jnp.where(out[..., None, :], 0.0, aero.vol))
    return rebucket(aero, new_k, new_j, new_i, grid)
