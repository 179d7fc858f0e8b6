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


def sample_moves(aero: AeroState, probs: OutflowProbs, p_hdiff, R,
                 n_class: int, key):
    """Raw per-particle move draw (no boundary policy): returns
    (dj, di, dest_k, horizontal) each [nz, ny, nx, P].  dj/di in {-1,0,1}
    are mutually exclusive (a horizontal move crosses exactly one face, as
    in the reference's sequential sample)."""
    nz, ny, nx, P = (*aero.num.shape[:3], aero.capacity)
    k_h, k_v = jax.random.split(key)

    cls = aero.w_class
    cls_oh = jax.nn.one_hot(cls, n_class, dtype=jnp.float32)
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
    dj = jnp.where((u >= c2) & (u < c3), -1,
                   jnp.where((u >= c3) & (u < c4), 1, 0))
    horizontal = u < c4

    u2 = jax.random.uniform(k_v, aero.num.shape)
    R_cum = jnp.cumsum(R, axis=-1)
    R_t = jnp.moveaxis(jnp.moveaxis(R_cum, -2, 1), 0, -1)
    cdf = jnp.einsum("...dc,...pc->...pd", R_t, cls_oh)
    dest_k = jnp.sum((u2[..., None] >= cdf).astype(jnp.int32), axis=-1)
    dest_k = jnp.clip(dest_k, 0, nz - 1)
    return dj, di, dest_k, horizontal


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


def _pack_rows(aero: AeroState):
    """[N, 5+S] packed per-particle payload (same row schema as
    aero_state._pack_payload)."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    S = aero.vol.shape[-2]
    return jnp.concatenate(
        [aero.num[..., None], aero.t_create[..., None],
         bc(aero.pid)[..., None], bc(aero.source)[..., None],
         bc(aero.w_class)[..., None],
         jnp.moveaxis(aero.vol, -2, -1)],
        axis=-1).reshape(-1, 5 + S)


def _rows_to_state(aero: AeroState, rows, cshape) -> AeroState:
    ic = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    S = aero.vol.shape[-2]
    return dataclasses.replace(
        aero,
        vol=jnp.moveaxis(rows[..., 5:].reshape(*cshape, S), -1, -2),
        num=rows[..., 0].reshape(cshape),
        pid=ic(rows[..., 2]).reshape(cshape),
        source=ic(rows[..., 3]).reshape(cshape),
        w_class=ic(rows[..., 4]).reshape(cshape),
        t_create=rows[..., 1].reshape(cshape),
    )


def _bucket_rows(payload, dest_flat, C: int, P: int):
    """Sort an [N_pool, CH] particle pool into [C, P, CH] destination buckets
    (dead/sentinel rows carry dest = C).  Overflow beyond P slots conserves
    represented number by rescaling the survivors in that bucket."""
    N = payload.shape[0]
    order = jnp.argsort(dest_flat, stable=True)
    counts = jnp.bincount(dest_flat, length=C + 1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts[:-1]).astype(jnp.int32)])
    tot_in = jax.ops.segment_sum(payload[:, 0], dest_flat, num_segments=C + 1)

    slot = jnp.arange(P, dtype=jnp.int32)
    cells = jnp.arange(C, dtype=jnp.int32)
    src_pos = starts[cells][:, None] + slot[None, :]
    valid = slot[None, :] < jnp.minimum(counts[cells][:, None], P)
    src_pos = jnp.clip(src_pos, 0, N - 1)
    gather_idx = order[src_pos]
    rows = jnp.where(valid[..., None], payload[gather_idx], 0.0)  # [C, P, CH]

    num = rows[..., 0]
    kept = jnp.sum(num, axis=-1)
    scale = jnp.where(kept > 0, tot_in[:C] / jnp.maximum(kept, 1e-300), 1.0)
    return rows.at[..., 0].set(num * scale[:, None])


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
    dest_flat = jnp.where(aero.alive.reshape(N), dest.reshape(N), C)
    rows = _bucket_rows(_pack_rows(aero), dest_flat, C, P)
    return _rows_to_state(aero, rows, (nz, ny, nx, P))


def transport_step_sharded(aero: AeroState, probs: OutflowProbs, xkhh, exch_h,
                           grid: Grid, cfg: Config, dt, key, mesh,
                           face_capacity: int | None = None) -> AeroState:
    """Distributed transport over a 2-D ('y','x') device mesh — the explicit
    TPU equivalent of the reference's neighbor particle exchange
    (``wrf_pmc_trans_aero.F90``: ghost delta_aero_states packed and
    isend/irecv'd to MPI_cart_shift neighbors, :545-675).

    Per shard: sample moves locally, bucket the stayers with a *local* sort,
    and ship cross-shard movers through four fixed-capacity face buffers
    exchanged by ``lax.ppermute`` over ICI.  A particle crosses exactly one
    face per step (single-cell moves), so no corner exchange is needed —
    same property the reference exploits.  Face-buffer overflow drops the
    excess movers (bounded statistically exactly as the reference bounds its
    per-face populations; size with ``face_capacity``).
    """
    from jax.sharding import PartitionSpec as PS
    shard_map = jax.shard_map

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = aero.capacity
    S = aero.vol.shape[-2]
    CH = 5 + S
    py, px = (mesh.shape["y"], mesh.shape["x"])
    ny_l, nx_l = ny // py, nx // px
    N_l = nz * ny_l * nx_l * P
    C_l = nz * ny_l * nx_l
    F = face_capacity or max(64, nz * max(ny_l, nx_l) * P // 4)

    def spec_for_rank(r):
        if r == 5:
            return PS(None, "y", "x", None, None)   # vol
        if r == 4:
            return PS(None, "y", "x", None)         # num/pid/...
        if r == 3:
            return PS(None, "y", "x")               # next_id / fields
        return PS()

    aero_specs = jax.tree.map(lambda a: spec_for_rank(jnp.ndim(a)), aero)
    probs_specs = jax.tree.map(lambda a: PS(None, None, "y", "x"), probs)

    def local(aero_l: AeroState, probs_l: OutflowProbs, xkhh_l, exch_l, k):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        k = jax.random.fold_in(jax.random.fold_in(k, iy), ix)
        p_hdiff = horizontal_diffusion_probs(xkhh_l, grid, dt)
        R = vertical_operator(probs_l, xkhh_l, exch_l, grid, cfg, dt)
        dj, di, dest_k, horizontal = sample_moves(aero_l, probs_l, p_hdiff,
                                                  R, cfg.n_class, k)
        shp = aero_l.num.shape
        kk = lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = lax.broadcasted_iota(jnp.int32, shp, 1)
        ii = lax.broadcasted_iota(jnp.int32, shp, 2)
        new_k = jnp.where(horizontal, kk, dest_k)
        new_j = jj + dj
        new_i = ii + di

        alive = aero_l.alive
        # open lateral boundaries: drop particles leaving the *global* domain
        out = jnp.zeros(shp, bool)
        if not cfg.boundary.periodic_x:
            gi = ix * nx_l + new_i
            out = out | (gi < 0) | (gi >= nx)
        if not cfg.boundary.periodic_y:
            gj = iy * ny_l + new_j
            out = out | (gj < 0) | (gj >= ny)
        alive = alive & ~out

        dep_w = alive & (new_i < 0)
        dep_e = alive & (new_i >= nx_l)
        dep_s = alive & (new_j < 0)
        dep_n = alive & (new_j >= ny_l)
        staying = alive & ~(dep_w | dep_e | dep_s | dep_n)

        payload = _pack_rows(aero_l)                       # [N_l, CH]
        nj = jnp.clip(new_j, 0, ny_l - 1)
        ni = jnp.clip(new_i, 0, nx_l - 1)
        dest_local = (new_k * ny_l + nj) * nx_l + ni
        dest_stay = jnp.where(staying.reshape(N_l),
                              dest_local.reshape(N_l), C_l)

        def face_buffer(dep, coord):
            flag = (~dep.reshape(N_l)).astype(jnp.int32)   # departing first
            order = jnp.argsort(flag, stable=True)
            take = order[:F]
            rows = payload[take]
            meta = jnp.stack([new_k.reshape(N_l)[take].astype(jnp.float32),
                              coord.reshape(N_l)[take].astype(jnp.float32)],
                             axis=-1)
            ok = dep.reshape(N_l)[take]
            return jnp.concatenate([jnp.where(ok[:, None], rows, 0.0),
                                    jnp.where(ok[:, None], meta, -1.0)],
                                   axis=-1)                # [F, CH+2]

        buf_w = face_buffer(dep_w, jj)
        buf_e = face_buffer(dep_e, jj)
        buf_s = face_buffer(dep_s, ii)
        buf_n = face_buffer(dep_n, ii)

        minus_x = [(i, (i - 1) % px) for i in range(px)]
        plus_x = [(i, (i + 1) % px) for i in range(px)]
        minus_y = [(i, (i - 1) % py) for i in range(py)]
        plus_y = [(i, (i + 1) % py) for i in range(py)]
        arr_from_e = lax.ppermute(buf_w, "x", minus_x)     # their west = our east edge
        arr_from_w = lax.ppermute(buf_e, "x", plus_x)
        arr_from_n = lax.ppermute(buf_s, "y", minus_y)
        arr_from_s = lax.ppermute(buf_n, "y", plus_y)

        def arrival(buf, edge_j, edge_i, coord_is_j):
            rows, meta = buf[:, :CH], buf[:, CH:]
            ak = meta[:, 0].astype(jnp.int32)
            ac = meta[:, 1].astype(jnp.int32)
            ok = meta[:, 0] >= 0.0
            aj = ac if coord_is_j else jnp.full_like(ac, edge_j)
            ai = jnp.full_like(ac, edge_i) if coord_is_j else ac
            dest = (jnp.clip(ak, 0, nz - 1) * ny_l
                    + jnp.clip(aj, 0, ny_l - 1)) * nx_l \
                + jnp.clip(ai, 0, nx_l - 1)
            return rows, jnp.where(ok, dest, C_l)

        r1, d1 = arrival(arr_from_e, 0, nx_l - 1, True)
        r2, d2 = arrival(arr_from_w, 0, 0, True)
        r3, d3 = arrival(arr_from_n, ny_l - 1, 0, False)
        r4, d4 = arrival(arr_from_s, 0, 0, False)

        pool = jnp.concatenate([payload, r1, r2, r3, r4], axis=0)
        dest_pool = jnp.concatenate([dest_stay, d1, d2, d3, d4], axis=0)
        rows = _bucket_rows(pool, dest_pool, C_l, P)
        return _rows_to_state(aero_l, rows, (nz, ny_l, nx_l, P))

    fn = shard_map(local, mesh=mesh,
                   in_specs=(aero_specs, probs_specs,
                             PS(None, "y", "x"), PS(None, "y", "x"), PS()),
                   out_specs=aero_specs, check_vma=False)
    return fn(aero, probs, xkhh, exch_h, key)


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
