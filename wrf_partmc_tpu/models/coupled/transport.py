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
  binomial/Poisson weight-ratio corrections (:2250-2318) reduce to an
  acceptance-thinning against the destination cell's preweight factor.
  Cross-cell moves are realized as one vectorized sort-and-rebucket over the
  flattened particle pool instead of per-cell delta_aero_states + MPI packing
  (:356-804).

**Preweighting** (``trans_aero_preweight`` :1103-1423, rescale rule
:1374-1402): before any particle is sampled, the expected computational
particle count arriving at every cell is projected deterministically from the
move probabilities and the per-class alive counts; where the projection
exceeds ``weight_rescale_trigger x num_particles`` the destination gets an
acceptance factor ``acc = n_ideal / n_proj < 1``.  Every particle headed to
(or staying in) that cell is then kept with probability ``acc`` with its
multiplicity divided by ``acc`` — exactly the reference's pre-sampling weight
rescale, which bounds per-cell populations under sustained convergent flow
*without* biased survivor clipping.  Represented number is conserved in
expectation by construction.

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


def normalized_face_probs(probs: OutflowProbs, p_hdiff):
    """Per-(class, cell) horizontal face probabilities with eddy diffusion
    added and the reference's sum-to-one renormalization applied
    (``normalize_probs``, ``wrf_pmc_trans.F90:692``).  All particles of a
    class in a cell share these, so normalizing at field level is identical
    to the per-particle form.  Returns (pxm, pxp, pym, pyp) each
    [n_class, nz, ny, nx]."""
    pxm = probs.xm + p_hdiff[None]
    pxp = probs.xp + p_hdiff[None]
    pym = probs.ym + p_hdiff[None]
    pyp = probs.yp + p_hdiff[None]
    total = pxm + pxp + pym + pyp
    scale = jnp.where(total > 1.0, 1.0 / jnp.maximum(total, 1e-12), 1.0)
    return pxm * scale, pxp * scale, pym * scale, pyp * scale


def preweight_acceptance(aero: AeroState, ph, R, grid: Grid, cfg: Config):
    """``trans_aero_preweight`` equivalent: deterministic projection of the
    expected computational-particle arrival count per cell, then the
    pre-sampling acceptance field that bounds it.

    Reference (``wrf_pmc_trans_aero.F90:1103-1423``): per-class number-conc
    fluxes are projected (``compute_fluxes`` :1428) and where the projected
    count exceeds ``2 x n_ideal`` the destination weight is rescaled
    (``aero_state_scale_weight`` :1374-1402).  After that rescale, particles
    *entering* the heavier-weighted cell are binomial/Poisson-thinned by the
    source/destination weight ratio (:2250-2254) while the standing
    population is touched only at the (rare) rescale events.  The
    multiplicity-design equivalent: acceptance applies to **movers only** —
    thinning the stayers every step would re-thin the same particles
    repeatedly, a multiplicative martingale whose typical realization decays
    even though its expectation is exact.  The stayer population is bounded
    by the rebalance halving instead (``aero_state_rebalance``), which fires
    at the reference's own log-frequency.

    acc[dest] = min(1, free / expected_arrivals), with
    free = bound - expected_stayers and
    bound = min(trigger x n_ideal, 0.95 x capacity), floored so arrivals are
    never deterministically destroyed (the bucket backstop handles the rare
    residual overflow).

    Returns acc: [nz, ny, nx] in (0, 1].
    """
    C = ph[0].shape[0]
    pxm, pxp, pym, pyp = ph
    onehot = jax.nn.one_hot(aero.w_class, C, dtype=jnp.float32)
    n_c = jnp.einsum("...p,...pc->...c",
                     aero.alive.astype(jnp.float32), onehot)   # [nz,ny,nx,C]
    n_cf = jnp.moveaxis(n_c, -1, 0)                            # [C,nz,ny,nx]

    # horizontal arrivals: a mover through my east neighbor's west face (-x)
    # lands in me, etc.  Axis layout [C, nz, ny, nx]: x = -1, y = -2.
    arr_xm = jnp.roll(pxm * n_cf, -1, axis=-1)
    arr_xp = jnp.roll(pxp * n_cf, 1, axis=-1)
    arr_ym = jnp.roll(pym * n_cf, -1, axis=-2)
    arr_yp = jnp.roll(pyp * n_cf, 1, axis=-2)
    if not cfg.boundary.periodic_x:   # nothing arrives from outside the domain
        arr_xm = arr_xm.at[..., -1].set(0.0)
        arr_xp = arr_xp.at[..., 0].set(0.0)
    if not cfg.boundary.periodic_y:
        arr_ym = arr_ym.at[..., -1, :].set(0.0)
        arr_yp = arr_yp.at[..., 0, :].set(0.0)

    # non-horizontal population redistributed over the column by R; the
    # diagonal of R is the expected true stayers (same cell k -> k)
    stay_h = jnp.clip(1.0 - (pxm + pxp + pym + pyp), 0.0, 1.0)
    n_nh = stay_h * n_cf                                       # [C,nz,ny,nx]
    arr_v = jnp.einsum("cyxsd,csyx->cdyx", R, n_nh)
    diag_r = jnp.moveaxis(jnp.diagonal(R, axis1=-2, axis2=-1), -1, 1)
    n_keep = jnp.sum(n_nh * diag_r, axis=0)                    # [nz,ny,nx]

    n_in = jnp.sum(arr_v + arr_xm + arr_xp + arr_ym + arr_yp,
                   axis=0) - n_keep
    # Bound the expected arrivals by the remaining *capacity*: populations
    # legitimately sit anywhere up to ~2 n_ideal between rebalance halvings
    # (the scale_weight role is played by rebalance), so only the static
    # bucket size may thin movers.  Using trigger*n_ideal here would floor
    # the acceptance in ordinary flow whenever emissions fill a cell.
    free = jnp.maximum(0.95 * aero.capacity - n_keep, 0.0)
    acc = jnp.where(n_in > free, free / jnp.maximum(n_in, 1e-6), 1.0)
    return jnp.maximum(acc, 1.0 / 64.0)


def _gather_by_class(field_cf, cls_onehot):
    """field_cf: [n_class, nz, ny, nx] -> per-particle values [nz, ny, nx, P]
    via a one-hot contraction over the (small) class axis — lane-axis gathers
    are slow on TPU, tiny einsums are free."""
    f = jnp.moveaxis(field_cf, 0, -1)              # [nz, ny, nx, n_class]
    return jnp.einsum("...c,...pc->...p", f, cls_onehot)


def _sample_dest_k(R, w_class, u2, nz: int, n_class: int):
    """Vertical destination level per particle by inverse-CDF over its
    column's R row.  The compare-and-count runs per class over a broadcast
    [nz,ny,nx,P,nz_dest] expression that XLA fuses into the reduction — no
    per-particle CDF tensor is ever materialized (the round-1 einsum built
    [nz,ny,nx,P,nz] in HBM, which capped particle capacity)."""
    R_cum = jnp.cumsum(R, axis=-1)                 # [C, ny, nx, src, dst]
    dest = jnp.zeros(u2.shape, jnp.int32)
    for ci in range(n_class):
        cdf_c = jnp.moveaxis(R_cum[ci], 2, 0)      # [src(nz), ny, nx, dst]
        d_c = jnp.sum((u2[..., None] >= cdf_c[:, :, :, None, :]),
                      axis=-1, dtype=jnp.int32)
        dest = jnp.where(w_class == ci, d_c, dest) if ci else d_c
    return jnp.clip(dest, 0, nz - 1)


def sample_moves(aero: AeroState, ph, R, n_class: int, key):
    """Raw per-particle move draw (no boundary policy): returns
    (dj, di, dest_k, horizontal) each [nz, ny, nx, P].  dj/di in {-1,0,1}
    are mutually exclusive (a horizontal move crosses exactly one face, as
    in the reference's sequential sample)."""
    nz = aero.num.shape[0]
    k_h, k_v = jax.random.split(key)

    cls_oh = jax.nn.one_hot(aero.w_class, n_class, dtype=jnp.float32)
    pxm = _gather_by_class(ph[0], cls_oh)
    pxp = _gather_by_class(ph[1], cls_oh)
    pym = _gather_by_class(ph[2], cls_oh)
    pyp = _gather_by_class(ph[3], cls_oh)

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
    dest_k = _sample_dest_k(R, aero.w_class, u2, nz, n_class)
    return dj, di, dest_k, horizontal


def sample_destinations(aero: AeroState, ph, R, grid: Grid, cfg: Config, key):
    """Per-particle destination cell (k', j', i') — the aero_state_multisample
    equivalent.  Returns int32 arrays [nz, ny, nx, P] plus the out-of-domain
    mask for open boundaries."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = aero.capacity
    dj, di, dest_k, horizontal = sample_moves(aero, ph, R, cfg.n_class, key)

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
    """[N, CH] packed per-particle payload (same row schema as
    aero_state._pack_payload: num, t_create, pid, source, w_class, vol(S),
    src_vol(K), src_id(K))."""
    from ...models.partmc.aero_state import _pack_payload

    return _pack_payload(aero)


def _rows_to_state(aero: AeroState, rows, cshape) -> AeroState:
    """rows: [C, P, CH] -> state with cell shape cshape (== aero's)."""
    from ...models.partmc.aero_state import _unpack_payload

    return _unpack_payload(aero, rows.reshape(*cshape, aero.capacity,
                                              rows.shape[-1]))


def _bucket_rows(payload, dest_flat, C: int, P: int):
    """Sort an [N_pool, CH] particle pool into [C, P, CH] destination buckets
    (dead/sentinel rows carry dest = C).  With preweighting active, overflow
    beyond P slots is statistically rare; when it does occur represented
    number is conserved by rescaling the survivors in that bucket (the
    backstop, not the primary bound)."""
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


def _apply_preweight_thin(num, alive, acc_at_dest, key):
    """Keep each particle with the destination's acceptance probability and
    divide the survivors' multiplicity by it (the binomial thinning the
    reference's source/destination weight ratio induces,
    ``wrf_pmc_trans_aero.F90:2250-2318``, driven by the preweight rescale)."""
    u = jax.random.uniform(key, num.shape)
    keep = (u < acc_at_dest) & alive
    return jnp.where(keep, num / jnp.maximum(acc_at_dest, 1e-6), 0.0)


def rebucket(aero: AeroState, new_k, new_j, new_i, grid: Grid) -> AeroState:
    """Move particles to their destination cells with one flattened stable
    sort (replaces per-cell delta_aero_states + neighbor MPI packing,
    ``wrf_pmc_trans_aero.F90:356-804``)."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = aero.capacity
    C = nz * ny * nx
    N = C * P

    dest = (new_k * ny + new_j) * nx + new_i        # [nz, ny, nx, P]
    dest_flat = jnp.where(aero.alive.reshape(N), dest.reshape(N), C)
    rows = _bucket_rows(_pack_rows(aero), dest_flat, C, P)
    return _rows_to_state(aero, rows, (nz, ny, nx))


def transport_step_sharded(aero: AeroState, probs: OutflowProbs, xkhh, exch_h,
                           grid: Grid, cfg: Config, dt, key, mesh,
                           face_capacity: int | None = None) -> AeroState:
    """Distributed transport over a 2-D ('y','x') device mesh — the explicit
    TPU equivalent of the reference's neighbor particle exchange
    (``wrf_pmc_trans_aero.F90``: ghost delta_aero_states packed and
    isend/irecv'd to MPI_cart_shift neighbors, :545-675).

    The probability fields (face probs, vertical operator R, preweight
    acceptance) are built *outside* the shard_map — they are small Eulerian
    fields whose one-cell halos GSPMD handles.  Inside the shard_map each
    shard: exchanges a one-cell halo of the acceptance field over ICI,
    preweight-thins its own particles against their destination's acceptance,
    samples moves, buckets the stayers with a *local* sort, and ships
    cross-shard movers through four fixed-capacity face buffers exchanged by
    ``lax.ppermute``.  A particle crosses exactly one face per step
    (single-cell moves), so no corner exchange is needed — same property the
    reference exploits.  Face-buffer overflow conserves represented number by
    rescaling the shipped movers to carry the full departing number (the
    reference never drops; preweighting keeps expected per-face counts small).
    """
    from jax.sharding import PartitionSpec as PS
    shard_map = jax.shard_map

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = aero.capacity
    S = aero.vol.shape[-2]
    CH = 5 + S + 2 * aero.n_src_comp
    py, px = (mesh.shape["y"], mesh.shape["x"])
    ny_l, nx_l = ny // py, nx // px
    N_l = nz * ny_l * nx_l * P
    C_l = nz * ny_l * nx_l
    F = face_capacity or max(64, nz * max(ny_l, nx_l) * P // 4)

    # Eulerian probability fields: GSPMD inserts the halo collectives
    p_hdiff = horizontal_diffusion_probs(xkhh, grid, dt)
    ph = normalized_face_probs(probs, p_hdiff)
    R = vertical_operator(probs, xkhh, exch_h, grid, cfg, dt)
    acc = preweight_acceptance(aero, ph, R, grid, cfg)

    def spec_for_rank(r):
        if r == 5:
            return PS(None, "y", "x", None, None)   # vol
        if r == 4:
            return PS(None, "y", "x", None)         # num/pid/...
        if r == 3:
            return PS(None, "y", "x")               # next_id / fields
        return PS()

    aero_specs = jax.tree.map(lambda a: spec_for_rank(jnp.ndim(a)), aero)
    ph_specs = tuple(PS(None, None, "y", "x") for _ in ph)

    minus_x = [(i, (i - 1) % px) for i in range(px)]
    plus_x = [(i, (i + 1) % px) for i in range(px)]
    minus_y = [(i, (i - 1) % py) for i in range(py)]
    plus_y = [(i, (i + 1) % py) for i in range(py)]

    def local(aero_l: AeroState, ph_l, R_l, acc_l, k):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        k = jax.random.fold_in(jax.random.fold_in(k, iy), ix)
        k_mv, k_thin = jax.random.split(k)
        dj, di, dest_k, horizontal = sample_moves(aero_l, ph_l, R_l,
                                                  cfg.n_class, k_mv)
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

        # one-cell halo of the acceptance field over ICI, then preweight-thin
        # BEFORE shipping (movers never carry unthinned populations).  No
        # diagonal moves, so zero-filled corners are never addressed.
        halo_w = lax.ppermute(acc_l[:, :, -1:], "x", plus_x)
        halo_e = lax.ppermute(acc_l[:, :, :1], "x", minus_x)
        mid = jnp.concatenate([halo_w, acc_l, halo_e], axis=2)
        halo_s = lax.ppermute(acc_l[:, -1:, :], "y", plus_y)
        halo_n = lax.ppermute(acc_l[:, :1, :], "y", minus_y)
        zpad = jnp.zeros((nz, 1, 1), acc_l.dtype)
        row_s = jnp.concatenate([zpad, halo_s, zpad], axis=2)
        row_n = jnp.concatenate([zpad, halo_n, zpad], axis=2)
        acc_ext = jnp.concatenate([row_s, mid, row_n], axis=1)
        moved = (new_k != kk) | (new_j != jj) | (new_i != ii)
        acc_p = jnp.where(moved, acc_ext[new_k, new_j + 1, new_i + 1], 1.0)
        num_thin = _apply_preweight_thin(aero_l.num, alive, acc_p, k_thin)
        alive = num_thin > 0.0

        dep_w = alive & (new_i < 0)
        dep_e = alive & (new_i >= nx_l)
        dep_s = alive & (new_j < 0)
        dep_n = alive & (new_j >= ny_l)
        staying = alive & ~(dep_w | dep_e | dep_s | dep_n)

        payload = _pack_rows(aero_l)                       # [N_l, CH]
        payload = payload.at[:, 0].set(num_thin.reshape(N_l))
        nj = jnp.clip(new_j, 0, ny_l - 1)
        ni = jnp.clip(new_i, 0, nx_l - 1)
        dest_local = (new_k * ny_l + nj) * nx_l + ni
        dest_stay = jnp.where(staying.reshape(N_l),
                              dest_local.reshape(N_l), C_l)

        def face_buffer(dep, coord):
            """Fixed-capacity departure buffer; overflow beyond F rows is
            conserved by rescaling the shipped rows' multiplicities to carry
            the full departing number."""
            depf = dep.reshape(N_l)
            flag = (~depf).astype(jnp.int32)               # departing first
            order = jnp.argsort(flag, stable=True)
            take = order[:F]
            rows = payload[take]
            ok = depf[take]
            tot_dep = jnp.sum(jnp.where(depf, payload[:, 0], 0.0))
            shipped = jnp.sum(jnp.where(ok, rows[:, 0], 0.0))
            scale = jnp.where(shipped > 0,
                              tot_dep / jnp.maximum(shipped, 1e-300), 1.0)
            rows = rows.at[:, 0].multiply(scale)
            meta = jnp.stack([new_k.reshape(N_l)[take].astype(jnp.float32),
                              coord.reshape(N_l)[take].astype(jnp.float32)],
                             axis=-1)
            return jnp.concatenate([jnp.where(ok[:, None], rows, 0.0),
                                    jnp.where(ok[:, None], meta, -1.0)],
                                   axis=-1)                # [F, CH+2]

        buf_w = face_buffer(dep_w, jj)
        buf_e = face_buffer(dep_e, jj)
        buf_s = face_buffer(dep_s, ii)
        buf_n = face_buffer(dep_n, ii)

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
        return _rows_to_state(aero_l, rows, (nz, ny_l, nx_l))

    fn = shard_map(local, mesh=mesh,
                   in_specs=(aero_specs, ph_specs,
                             PS(None, "y", "x", None, None),
                             PS(None, "y", "x"), PS()),
                   out_specs=aero_specs, check_vma=False)
    return fn(aero, ph, R, acc, key)


def transport_step(aero: AeroState, probs: OutflowProbs, xkhh, exch_h,
                   grid: Grid, cfg: Config, dt, key,
                   mesh=None) -> AeroState:
    """Full stochastic transport step (wrf_pmc_trans_driver equivalent):
    preweight -> thin -> sample -> rebucket.  With ``mesh`` given, runs the
    sharded ICI face-buffer path (the production multi-chip design); the
    single-device path is its degenerate case with a global sort.  Particles
    sampled across an open lateral boundary are removed (the outflow-discard
    of ``wrf_pmc_trans_aero.F90:811-955``)."""
    if mesh is not None:
        return transport_step_sharded(aero, probs, xkhh, exch_h, grid, cfg,
                                      dt, key, mesh)
    k_mv, k_thin = jax.random.split(key)
    p_hdiff = horizontal_diffusion_probs(xkhh, grid, dt)
    ph = normalized_face_probs(probs, p_hdiff)
    R = vertical_operator(probs, xkhh, exch_h, grid, cfg, dt)
    acc = preweight_acceptance(aero, ph, R, grid, cfg)
    new_k, new_j, new_i, out = sample_destinations(aero, ph, R, grid, cfg,
                                                   k_mv)
    alive = aero.alive & ~out
    shp = aero.num.shape
    kk = lax.broadcasted_iota(jnp.int32, shp, 0)
    jj = lax.broadcasted_iota(jnp.int32, shp, 1)
    ii = lax.broadcasted_iota(jnp.int32, shp, 2)
    moved = (new_k != kk) | (new_j != jj) | (new_i != ii)
    acc_p = jnp.where(moved, acc[new_k, new_j, new_i], 1.0)
    num = _apply_preweight_thin(aero.num, alive, acc_p, k_thin)
    aero = dataclasses.replace(
        aero, num=num, vol=jnp.where((num > 0)[..., None, :], aero.vol, 0.0))
    return rebucket(aero, new_k, new_j, new_i, grid)
