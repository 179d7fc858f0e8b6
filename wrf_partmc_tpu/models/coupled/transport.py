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
  acceptance-thinning against the destination cell's preweight factor
  (applied destination-side, so no acceptance halo is ever exchanged).
  Cross-cell moves are realized by the MXU rebucket (see :func:`rebucket`):
  per-cell mover extraction into static per-destination mini-regions and
  free-slot insertion as dense one-hot matmuls (``ops/place.py``), with the
  cross-cell reorder reduced to pure reshapes/transposes/rolls by the
  static per-(source, destination) caps — replacing both the reference's
  per-cell delta_aero_states + MPI packing (:356-804) and the r2 global
  argsort (row gathers measured at ~5 GB/s on TPU).  Stayers never move;
  overflow at any stage conserves represented number by multiplicity
  rescale and is counted in the transport diag.

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


def horizontal_diffusion_probs(xkhh, grid: Grid, dt, rho3=None,
                               cfg: Config | None = None):
    """Per-face horizontal eddy-diffusion move probabilities
    (``compute_diffusion_probs``, ``wrf_pmc_trans.F90:358-407``):
    P_face = K_face dt rho_face / (dx^2 rho_cell), density-weighted and with
    dy honored for the y faces.  Face K/rho averages honor the lateral BCs
    (clamped, not wrapped, on open axes).  Returns (pxm, pxp, pym, pyp) each
    [nz, ny, nx]."""
    from ...ops.stencil import shift as bshift

    if rho3 is None:
        rho_b, _, _ = base_profiles(grid)
        rho3 = jnp.broadcast_to(rho_b.reshape(-1, 1, 1), xkhh.shape)
    msq = (grid.msft * grid.msft) if grid.msft is not None else 1.0
    bc_x = "periodic" if (cfg is None or cfg.boundary.periodic_x) else "clamp"
    bc_y = "periodic" if (cfg is None or cfg.boundary.periodic_y) else "clamp"

    def face(s, axis, rdx2, bc):
        k_f = 0.5 * (xkhh + bshift(xkhh, s, axis, bc))
        r_f = 0.5 * (rho3 + bshift(rho3, s, axis, bc))
        return jnp.clip(k_f * dt * msq * rdx2 * r_f
                        / jnp.maximum(rho3, 1e-10), 0.0, 0.2)

    rdx2 = grid.rdx * grid.rdx
    rdy2 = grid.rdy * grid.rdy
    return (face(-1, 2, rdx2, bc_x), face(1, 2, rdx2, bc_x),
            face(-1, 1, rdy2, bc_y), face(1, 1, rdy2, bc_y))


def vertical_operator(probs: OutflowProbs, xkhh_unused, exch_h, grid: Grid,
                      cfg: Config, dt, n_sub_max: int = 1024,
                      rho3=None, dz3=None):
    """Per-column, per-class full-level transition matrix R = B^N A.

    exch_h: [nz+1, ny, nx] vertical eddy diffusivity at w levels (the PBL
    ``exch_h`` the reference consumes, ``wrf_pmc_trans.F90:472``).
    probs.zm/zp: [n_class, nz, ny, nx] captured vertical advection
    probabilities.  rho3/dz3: actual per-cell dry density and layer depth
    (terrain/geopotential-aware under the ARW core); base-state fallback.
    Returns R: [n_class, ny, nx, nz, nz] row-stochastic.

    The substep count honors the reference's stability rule
    ``dt_small = 0.1 dz_min^2 / K_max`` (``stable_timestep``,
    ``wrf_pmc_trans.F90:626-652``) up to ``n_sub_max`` via matrix repeated
    squaring — N = 512 costs ~10 squarings, so strong-mixing PBL columns
    (K ~ 500 m2/s, dz ~ 50 m, dt = 60 s -> N ~ 480) are not biased by the
    old 16-substep cap.
    """
    nz = grid.nz
    if rho3 is None or dz3 is None:
        rho_b, _, _ = base_profiles(grid)
        shape3 = exch_h.shape[0] - 1, *exch_h.shape[1:]
        rho3 = jnp.broadcast_to(rho_b.reshape(-1, 1, 1), shape3)
        dz3 = jnp.broadcast_to(grid.dz.reshape(-1, 1, 1), shape3)

    # stability substep count per column (stable_timestep :626-652)
    k_int = exch_h[1:-1]                           # [nz-1, ny, nx] interior faces
    k_max = jnp.max(k_int, axis=0)                 # [ny, nx]
    dz_min2 = jnp.min(dz3, axis=0) ** 2            # [ny, nx]
    n_need = jnp.ceil(dt * 10.0 * k_max / jnp.maximum(dz_min2, 1e-10))
    n_sub = jnp.clip(n_need, 1, n_sub_max).astype(jnp.int32)      # [ny, nx]
    tau = dt / n_sub.astype(jnp.float32)                          # [ny, nx]

    # one-substep explicit diffusion matrix B [ny, nx, nz, nz] built from
    # actual layer depths and densities
    dzf = 0.5 * (dz3[1:] + dz3[:-1])                              # [nz-1, ny, nx]
    rho_f = 0.5 * (rho3[1:] + rho3[:-1])
    coef = (rho_f / dzf) * k_int                                  # [nz-1, ny, nx]
    p_up = coef / (rho3[:-1] * dz3[:-1])                          # from k -> k+1
    p_dn = coef / (rho3[1:] * dz3[1:])                            # from k+1 -> k
    p_up = jnp.moveaxis(p_up, 0, -1) * tau[..., None]             # [ny, nx, nz-1]
    p_dn = jnp.moveaxis(p_dn, 0, -1) * tau[..., None]
    # safety clip (the stability substepping keeps these ~0.1 by design)
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

    # B^N with data-dependent N via repeated squaring over the bits of N
    # (log2(n_sub_max) squarings instead of N multiplies); rows renormalized
    # per squaring as the reference renormalizes per power step
    nbits = max(1, int(n_sub_max).bit_length())
    M = jnp.broadcast_to(eye, B.shape)
    Bp = B

    def bit_body(i, carry):
        M, Bp = carry
        bit = ((n_sub >> i) & 1).astype(bool)[..., None, None]
        M2 = jnp.einsum("yxab,yxbc->yxac", M, Bp)
        M = jnp.where(bit, M2, M)
        Bp2 = jnp.einsum("yxab,yxbc->yxac", Bp, Bp)
        Bp2 = Bp2 / jnp.maximum(jnp.sum(Bp2, axis=-1, keepdims=True), 1e-12)
        return M, Bp2

    BN, _ = lax.fori_loop(0, nbits, bit_body, (M, Bp))
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
    hxm, hxp, hym, hyp = p_hdiff
    pxm = probs.xm + hxm[None]
    pxp = probs.xp + hxp[None]
    pym = probs.ym + hym[None]
    pyp = probs.yp + hyp[None]
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
    onehot = _class_onehot(aero.w_class, C)
    n_c = jnp.einsum("...p,...cp->...c",
                     aero.alive.astype(jnp.bfloat16), onehot,
                     preferred_element_type=jnp.float32)       # [nz,ny,nx,C]
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
    # floor: below ~1/8 the 1/acc multiplicity inflation dominates the MC
    # variance; the residual bound is the deterministic free-slot fold in
    # rebucket (number-exact, composition-biased only at saturation)
    return jnp.maximum(acc, 1.0 / 8.0)


def _class_onehot(w_class, n_class: int):
    """Per-particle class one-hot [..., n_class, P] in bf16 (0/1 exact; all
    consuming matmuls accumulate in f32).  bf16 halves the HBM footprint,
    which matters at the CARES class width (C ~ 40)."""
    c_iota = jnp.arange(n_class, dtype=jnp.int32).reshape(-1, 1)
    return (w_class[..., None, :] == c_iota).astype(jnp.bfloat16)


def _gather_by_class(field_cf, cls_onehot_T):
    """field_cf: [n_class, nz, ny, nx] -> per-particle values [nz, ny, nx, P]
    via a one-hot contraction over the (small) class axis.  The one-hot is
    [..., n_class, P] (P on lanes): the [..., P, n_class] orientation pads
    n_class up to 128 lanes (16x memory)."""
    f = jnp.moveaxis(field_cf, 0, -1)              # [nz, ny, nx, n_class]
    return jnp.einsum("...c,...cp->...p", f,
                      cls_onehot_T.astype(f.dtype),
                      preferred_element_type=jnp.float32)


def _sample_dest_k(R, cls_oh, u2, nz: int):
    """Vertical destination level per particle by inverse-CDF over its
    column's R row: dest = #{d : u2 >= CDF[d]}.  Each particle's CDF value
    at destination level d is gathered from its class's row by one one-hot
    matmul (``_gather_by_class``), looped over the nz destination levels —
    loop length independent of n_class (the r3 form replayed a
    [nz,ny,nx,P,nz] compare-reduce per class, linear in class count), and
    no [.., P, nz] per-particle CDF tensor is ever materialized."""
    R_cum = jnp.cumsum(R, axis=-1)                 # [C, ny, nx, src, dst]
    Rt = jnp.moveaxis(R_cum, -1, 0)                # [dst, C, ny, nx, src]
    Rt = jnp.moveaxis(Rt, -1, 2)                   # [dst, C, src, ny, nx]

    def body(d, dest):
        Rd = lax.dynamic_index_in_dim(Rt, d, 0, keepdims=False)
        cdf_d = _gather_by_class(Rd, cls_oh)       # [nz, ny, nx, P]
        return dest + (u2 >= cdf_d).astype(jnp.int32)

    dest = lax.fori_loop(0, nz, body, jnp.zeros(u2.shape, jnp.int32))
    return jnp.clip(dest, 0, nz - 1)


def sample_moves(aero: AeroState, ph, R, n_class: int, key):
    """Raw per-particle move draw (no boundary policy): returns
    (dj, di, dest_k, horizontal) each [nz, ny, nx, P].  dj/di in {-1,0,1}
    are mutually exclusive (a horizontal move crosses exactly one face, as
    in the reference's sequential sample)."""
    nz = aero.num.shape[0]
    k_h, k_v = jax.random.split(key)

    cls_oh = _class_onehot(aero.w_class, n_class)
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
    dest_k = _sample_dest_k(R, cls_oh, u2, nz)
    return dj, di, dest_k, horizontal


def open_boundary_drop(dj, di, horizontal, grid: Grid, cfg: Config,
                       ix0=0, iy0=0):
    """Mask of particles sampled across an open lateral boundary (the
    outflow-discard of ``wrf_pmc_trans_aero.F90:811-955``).  ix0/iy0 are the
    shard's global offsets (0 on a single device)."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    shp = dj.shape
    drop = jnp.zeros(shp, bool)
    if not cfg.boundary.periodic_x:
        gi = ix0 + lax.broadcasted_iota(jnp.int32, shp, 2) + di
        drop = drop | (horizontal & ((gi < 0) | (gi >= nx)))
    if not cfg.boundary.periodic_y:
        gj = iy0 + lax.broadcasted_iota(jnp.int32, shp, 1) + dj
        drop = drop | (horizontal & ((gj < 0) | (gj >= ny)))
    return drop


def _apply_preweight_thin(num, alive, acc_at_dest, key):
    """Keep each particle with the destination's acceptance probability and
    divide the survivors' multiplicity by it (the binomial thinning the
    reference's source/destination weight ratio induces,
    ``wrf_pmc_trans_aero.F90:2250-2318``, driven by the preweight rescale)."""
    u = jax.random.uniform(key, num.shape)
    keep = (u < acc_at_dest) & alive
    return jnp.where(keep, num / jnp.maximum(acc_at_dest, 1e-6), 0.0)


# ---------------------------------------------------------------------------
# MXU rebucket: movers are extracted per cell into static per-destination
# mini-regions (one dense one-hot matmul), the mini-regions are turned into
# per-destination-cell arrival buffers by pure reshapes/transposes/rolls (the
# static per-(src,dst) caps make the cross-cell reorder a transpose), and
# arrivals are placed into free slots of their destination cell (a second
# dense one-hot matmul).  Stayers never move.  This replaces the round-2
# global argsort + row gather (which ran at ~5 GB/s on TPU) and the
# reference's per-cell delta_aero_states + MPI packing
# (``wrf_pmc_trans_aero.F90:356-804``).
# ---------------------------------------------------------------------------


def _caps(cfg: Config, P: int, nz: int):
    """Per-(source-cell, destination-class) mover caps.  Overflow beyond a
    cap conserves represented number by rescaling the shipped survivors of
    that (cell, class); the hit rate is surfaced through the transport diag
    (``CoupledState.trans_diag`` -> history).

    Cost scales ~linearly with the vertical cap (the rebucket payload
    phase moves D x Av mover slots), so the default is a measured
    compromise: max(16, P//16) is 2x the r3 default that ADVICE flagged
    as saturating under strong mixing, yet 6.4x cheaper than the
    worst-case 2P/nz bound (which benched 2.5x slower on the em_uniform
    contract while its extra headroom went entirely unused — overflow
    counters read 0 there at HALF this cap).  Fully-convective regimes
    where a near-uniform R row really moves ~P/nz particles per level
    should set trans_cap_v explicitly (e.g. 2P/nz); saturation of the
    conserving overflow path is visible in history as trans_overflow_*."""
    av = cfg.partmc.trans_cap_v or max(16, min(P, P // 16))
    ah = cfg.partmc.trans_cap_h or max(16, P // 16)
    return av, ah


def _reorder_minis(minis, nz, nyl, nxl, chb, Av, Ah, roll):
    """Cross-cell reorder of the per-cell mover mini-regions into
    per-destination-cell arrival buffers.  minis: [C, chb, F1] ->
    arr [C, chb, Av + 4*Ah].

    Vertical: because vertical ranks are COLUMN-GLOBAL (phase 1a), every
    (dest-level, rank) slot is claimed by at most one source cell in the
    whole column, so the column arrival buffer is simply the SUM of the
    source cells' mini regions — one bandwidth-bound reduction over the
    leading level axis.  (The r4.0 form kept per-(src, dst) regions and
    transposed the two small level axes; that [.., chb, nz, Av] small-tile
    transpose alone cost 46 ms of a 58 ms rebucket at the profile size.)
    Dest cell kd then reads its Av-wide segment — a leading-axis moveaxis,
    which is cheap."""
    C = nz * nyl * nxl
    F1 = nz * Av + 4 * Ah
    m5 = minis.reshape(nz, nyl, nxl, chb, F1)
    col = jnp.sum(m5[..., :nz * Av], axis=0)        # [ny, nx, c, nz*Av]
    col = col.reshape(nyl, nxl, chb, nz, Av)
    arr_v = jnp.moveaxis(col, 3, 0)                 # [kd, ny, nx, c, Av]
    mh = m5[..., nz * Av:].reshape(nz, nyl, nxl, chb, 4, Ah)
    # W-movers of column i arrive in column i-1, etc.; under open BCs the
    # edge movers were already dropped, so the wrapped rows are zero.  On a
    # device mesh roll patches the wrapped column with the neighbor shard's
    # edge buffer over ICI (transport_step_sharded).
    arr_w = roll(mh[..., 0, :], -1, 2)
    arr_e = roll(mh[..., 1, :], 1, 2)
    arr_s = roll(mh[..., 2, :], -1, 1)
    arr_n = roll(mh[..., 3, :], 1, 1)
    arr = jnp.concatenate([arr_v, arr_w, arr_e, arr_s, arr_n], axis=-1)
    return arr.reshape(C, chb, Av + 4 * Ah)


def rebucket(aero: AeroState, dest_k, dj, di, horizontal, drop, acc,
             grid: Grid, cfg: Config, key, roll_fn=None,
             ch_block: int | None = None):
    """Move particles to their sampled destination cells.

    dest_k/dj/di/horizontal: per-particle move sample ([nz, ny, nx, P]);
    a particle either moves horizontally by one cell (dj/di, keeping k) or
    redistributes vertically to dest_k within its column.  ``drop`` marks
    particles leaving an open domain.  ``acc`` [nz, ny, nx] is the preweight
    acceptance applied (destination-side) to arrivals.  ``roll_fn`` overrides
    the horizontal wrap (sharded edge exchange).  Cell dims come from the
    (possibly shard-local) aero arrays, not the global grid.

    Loop-free r5 design (replaces the r4 per-destination-class fori loop
    that ran 14 full [C, P] passes at ~44 GB/s effective, 377 ms of the
    738 ms em_uniform transport step):

    * **phase 1a** — destination-class one-hot [C, D, P] (bf16) + ONE MXU
      matmul against a strict-triangular ones matrix gives every particle's
      within-cell rank for its class simultaneously; column-global vertical
      ranks come from an exclusive level-scan of the per-class counts.  The
      source-level visiting order is rotated by a per-step random offset so
      cap saturation cannot systematically ship low levels first (ADVICE
      r4 #1).  Pool conservation scales and overflow counters are
      per-(pool) einsum reductions over the same one-hot.
    * **T1** — the FULL payload (num included) moves through the mover
      mini-regions in one fused multi-channel scatter (slab-chunked under
      ``lax.map`` only when the F1-wide transient exceeds the HBM budget);
      the expensive per-cell one-hot build is amortized over all ~33
      channels instead of being rebuilt per 9-channel slab.
    * **phase 1b** — thinning draw, arrival compaction ranks and free-slot
      ranks live entirely on [C, AB]-sized arrays.
    * **T2** — kept arrivals are compacted by rank (small AB-wide scatter)
      and every free slot gathers its rank'th arrival in one fused
      multi-channel gather; no slot_of_rank indirection pass.

    Returns (new_aero, diag) with overflow counters.
    """
    from ...models.partmc.aero_state import (payload_channel_list,
                                             unpack_payload)
    from ...ops.place import MAX_CH, gather_rows, scatter_rows

    nz, nyl, nxl, P = aero.num.shape
    C = nz * nyl * nxl
    Av, Ah = _caps(cfg, P, nz)
    F1 = nz * Av + 4 * Ah          # per-cell mover-region width
    AB = Av + 4 * Ah               # per-cell arrival-buffer width
    D = nz + 4

    k_thin, k_rot = jax.random.split(key)

    kk = lax.broadcasted_iota(jnp.int32, aero.num.shape, 0)
    alive = aero.alive & ~drop
    vert = (~horizontal) & (dest_k != kk)
    # destination class: 0..nz-1 = vertical target level, nz+d = horizontal
    # face d (0=W -x, 1=E +x, 2=S -y, 3=N +y)
    hdir = jnp.where(di < 0, 0, jnp.where(di > 0, 1,
                     jnp.where(dj < 0, 2, 3)))
    dcode4 = jnp.where(vert, dest_k, jnp.where(horizontal, nz + hdir, -1))
    dcode4 = jnp.where(alive, dcode4, -1)              # [nz, ny, nx, P]
    dcode = dcode4.reshape(C, P)
    mover = dcode >= 0
    num_flat = aero.num.reshape(C, P)

    # ---- phase 1a: loop-free ranks/caps/conservation via the class one-hot
    oh = (dcode[:, None, :] == jnp.arange(D, dtype=jnp.int32)[None, :, None]
          ).astype(jnp.bfloat16)                       # [C, D, P] 0/1 exact

    # within-cell rank per class: rank[c,d,p] = #{q < p : dcode[c,q] = d},
    # realized as one [C*D, P] x [P, P] bf16 MXU matmul with f32 accumulation
    # (exact for counts < 2^24); only the diagonal-in-d slice (the particle's
    # own class) is reduced out, chunked over D when the f32 prefix
    # intermediate would exceed ~1.5 GB
    tri = (jnp.arange(P, dtype=jnp.int32)[:, None]
           < jnp.arange(P, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)

    def _rank_of(oh_b):
        pre = jnp.einsum("cdq,qp->cdp", oh_b, tri,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("cdp,cdp->cp", oh_b, pre)

    d_chunk = max(1, min(D, int(6e8 // max(C * P * 4, 1))))
    if d_chunk >= D:
        rank_p = _rank_of(oh)
    else:
        n_dc = -(-D // d_chunk)
        ohp = jnp.pad(oh, ((0, 0), (0, n_dc * d_chunk - D), (0, 0)))
        parts = lax.map(_rank_of,
                        jnp.moveaxis(ohp.reshape(C, n_dc, d_chunk, P), 1, 0))
        rank_p = jnp.sum(parts, axis=0)

    cnt = jnp.sum(oh, axis=-1, dtype=jnp.float32)      # [C, D]
    cnt4 = cnt.reshape(nz, nyl, nxl, D)
    # column-global vertical ranks, visiting source levels in a randomly
    # rotated order each step (removes the deterministic low-level-first
    # shipping bias under cap saturation, ADVICE r4 #1)
    rot = jax.random.randint(k_rot, (), 0, nz)
    a = jnp.roll(cnt4, -rot, axis=0)
    offs_rot = jnp.cumsum(a, axis=0) - a               # exclusive scan
    offs4 = jnp.roll(offs_rot, rot, axis=0)            # [nz, ny, nx, D]
    is_v_d = jnp.arange(D) < nz
    offs_cd = jnp.where(is_v_d, offs4, 0.0).reshape(C, D)
    offs_p = jnp.einsum("cdp,cd->cp", oh, offs_cd)
    rank_g = (rank_p + offs_p).astype(jnp.int32)       # [C, P]

    is_v_p = dcode < nz
    cap_p = jnp.where(is_v_p, Av, Ah)
    ship = mover & (rank_g < cap_p)
    base_p = jnp.where(is_v_p, dcode * Av, nz * Av + (dcode - nz) * Ah)
    dst1 = jnp.where(ship, base_p + rank_g, -1)        # [C, P]

    # pool conservation scale: shipped movers of each pool carry the pool's
    # full departing represented number (vertical pools span the column)
    tot_cd = jnp.einsum("cdp,cp->cd", oh, num_flat)
    shp_cd = jnp.einsum("cdp,cp->cd", oh,
                        jnp.where(ship, num_flat, 0.0))
    tot4 = tot_cd.reshape(nz, nyl, nxl, D)
    shp4 = shp_cd.reshape(nz, nyl, nxl, D)
    tot_pool = jnp.where(is_v_d, jnp.sum(tot4, 0, keepdims=True), tot4)
    shp_pool = jnp.where(is_v_d, jnp.sum(shp4, 0, keepdims=True), shp4)
    sc4 = jnp.where(shp_pool > 0.0,
                    tot_pool / jnp.maximum(shp_pool, 1e-300), 1.0)
    sc_cd = jnp.broadcast_to(sc4, (nz, nyl, nxl, D)).reshape(C, D)
    scale_p = jnp.einsum("cdp,cd->cp", oh, sc_cd)
    num_all = jnp.where(ship, num_flat * jnp.maximum(scale_p, 1.0), num_flat)

    # class-overflow diag: movers beyond each pool's cap
    cnt_pool_v = jnp.sum(cnt4, axis=0)[..., :nz]       # [ny, nx, dest-level]
    ovf_class = (jnp.sum(jnp.maximum(cnt_pool_v - Av, 0.0))
                 + jnp.sum(jnp.maximum(cnt4[..., nz:] - Ah, 0.0)))

    # ---- T1: full payload (num first) through the mover mini-regions in
    # channel slabs.  Slabs are a statically unrolled Python loop, each
    # stacking only its own channels from the SoA fields — the monolithic
    # [C, CH, P] payload is never materialized, and the expensive per-cell
    # one-hot builds amortize over each slab's 3*chb MXU rows.
    parts = [a.reshape(C, P) for a in payload_channel_list(aero)]
    parts[0] = num_all
    CH = len(parts)
    roll = roll_fn or (lambda slab, shift, axis: jnp.roll(slab, shift, axis))
    if ch_block is None:
        budget = 3 * 1024 ** 3
        per_ch = C * F1 * 4 * 2    # minis + reorder transient per channel
        ch_block = max(4, min(CH, MAX_CH, budget // max(per_ch, 1)))
    ch_block = min(ch_block, CH, MAX_CH)
    n_blk = -(-CH // ch_block)
    # balance slab widths (e.g. 33 channels -> 17 + 16, not 28 + 5)
    ch_block = -(-CH // n_blk)
    bounds = [(b * ch_block, min((b + 1) * ch_block, CH))
              for b in range(n_blk)]

    def t1_block(pb):
        src = jnp.where(ship[:, None, :], pb, 0.0)
        minis_b = scatter_rows(src, dst1, F1)
        return _reorder_minis(minis_b, nz, nyl, nxl, pb.shape[1], Av, Ah,
                              roll)

    arr_slabs = [t1_block(jnp.stack(parts[lo:hi], axis=1))
                 for lo, hi in bounds]                 # each [C, chb, AB]

    # ---- phase 1b (all on [C, AB]): destination-side preweight thinning
    # (equivalent to the reference's source-side weight-ratio thinning — the
    # Bernoulli draw is independent of the move), then arrival/free ranks
    a_num = arr_slabs[0][:, 0, :]
    u = jax.random.uniform(k_thin, (C, AB))
    acc_c = acc.reshape(C, 1)
    keep = (u < acc_c) & (a_num > 0.0)
    a_num_th = jnp.where(keep, a_num / jnp.maximum(acc_c, 1e-6), 0.0)
    tot_arr = jnp.sum(a_num_th, axis=-1)

    stay_keep = (aero.alive & ~drop).reshape(C, P) & ~mover
    free = ~stay_keep
    n_free = jnp.sum(free, axis=-1)
    f_rank = jnp.cumsum(free.astype(jnp.int32), axis=-1) - 1
    k_rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
    placed = keep & (k_rank < n_free[:, None])
    n_kept = jnp.sum(placed.astype(jnp.int32), axis=-1)
    ovf_free = jnp.sum(jnp.where(keep & ~placed, 1.0, 0.0))

    # ---- T2 per slab: compact kept arrivals by rank (small AB-wide
    # scatter), then every free slot gathers its rank'th arrival; stayers
    # merge from a freshly stacked payload slab (transients stay slab-sized)
    dstc = jnp.where(placed, k_rank, -1)
    srcp = jnp.where(free & (f_rank < n_kept[:, None]), f_rank, -1)
    sk = stay_keep[:, None, :]
    merged_slabs = []
    for (lo, hi), arr_b in zip(bounds, arr_slabs):
        if lo == 0:
            arr_b = jnp.concatenate([a_num_th[:, None, :], arr_b[:, 1:, :]],
                                    axis=1)
        arrc_b = scatter_rows(arr_b, dstc, AB)
        arrived_b = gather_rows(arrc_b, srcp)          # [C, chb, P]
        pay_b = jnp.stack(parts[lo:hi], axis=1)
        merged_slabs.append(arrived_b + pay_b * sk)

    # free-slot overflow conservation fold: arrival number that could not be
    # placed (cell saturated with stayers) is folded onto the whole cell by
    # a multiplicity rescale — the bucket-level conservation the reference's
    # weight rescale provides under convergent flow
    # (``wrf_pmc_trans_aero.F90:1374-1402``)
    merged_num = merged_slabs[0][:, 0, :]
    stay_num = jnp.sum(jnp.where(stay_keep, num_flat, 0.0), axis=-1)
    actual = jnp.sum(merged_num, axis=-1)
    scale_cell = jnp.where(actual > 0,
                           (stay_num + tot_arr) / jnp.maximum(actual, 1e-300),
                           1.0)
    merged_num = merged_num * jnp.maximum(scale_cell, 1.0)[:, None]
    merged_slabs[0] = jnp.concatenate(
        [merged_num[:, None, :], merged_slabs[0][:, 1:, :]], axis=1)
    merged = jnp.concatenate(merged_slabs, axis=1)     # [C, CH, P]

    new = unpack_payload(aero, merged)
    diag = {"overflow_class": ovf_class, "overflow_free": ovf_free,
            "movers": jnp.sum(mover.astype(jnp.float32))}
    return new, diag


def transport_step_sharded(aero: AeroState, probs: OutflowProbs, xkhh, exch_h,
                           grid: Grid, cfg: Config, dt, key, mesh,
                           rho3=None, dz3=None):
    """Distributed transport over a 2-D ('y','x') device mesh — the explicit
    TPU equivalent of the reference's neighbor particle exchange
    (``wrf_pmc_trans_aero.F90``: ghost delta_aero_states packed and
    isend/irecv'd to MPI_cart_shift neighbors, :545-675).

    The probability fields (face probs, vertical operator R, preweight
    acceptance) are built *outside* the shard_map — they are small Eulerian
    fields whose one-cell halos GSPMD handles.  Inside the shard_map each
    shard samples moves and runs the same MXU rebucket as the single-device
    path; the only cross-shard traffic is the per-face mover mini-buffers of
    the shard's edge columns, exchanged by ``lax.ppermute`` inside the
    rebucket's roll hook.  A particle crosses exactly one face per step, so
    no corner exchange is needed — the same property the reference exploits.
    Preweight acceptance is applied at the *destination*, so no acceptance
    halo is exchanged at all.
    """
    from jax.sharding import PartitionSpec as PS
    shard_map = jax.shard_map

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    py, px = (mesh.shape["y"], mesh.shape["x"])
    ny_l, nx_l = ny // py, nx // px

    # Eulerian probability fields: GSPMD inserts the halo collectives
    p_hdiff = horizontal_diffusion_probs(xkhh, grid, dt, rho3=rho3, cfg=cfg)
    ph = normalized_face_probs(probs, p_hdiff)
    R = vertical_operator(probs, xkhh, exch_h, grid, cfg, dt,
                          rho3=rho3, dz3=dz3)
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

    def roll_fn(slab, shift, axis):
        """Shift mover mini-buffers one column over, patching the wrapped
        edge with the neighbor shard's edge buffer over ICI."""
        rolled = jnp.roll(slab, shift, axis=axis)
        ax_name = "x" if axis == 2 else "y"
        idx = [slice(None)] * slab.ndim
        if shift == -1:      # arrivals from +1 side; wrapped entry is last
            idx[axis] = slice(0, 1)
            perm = minus_x if ax_name == "x" else minus_y
            edge = lax.ppermute(slab[tuple(idx)], ax_name, perm)
            idx[axis] = slice(-1, None)
            rolled = rolled.at[tuple(idx)].set(edge)
        else:                # arrivals from -1 side; wrapped entry is first
            idx[axis] = slice(-1, None)
            perm = plus_x if ax_name == "x" else plus_y
            edge = lax.ppermute(slab[tuple(idx)], ax_name, perm)
            idx[axis] = slice(0, 1)
            rolled = rolled.at[tuple(idx)].set(edge)
        return rolled

    def local(aero_l: AeroState, ph_l, R_l, acc_l, k):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        k = jax.random.fold_in(jax.random.fold_in(k, iy), ix)
        k_mv, k_thin = jax.random.split(k)
        dj, di, dest_k, horizontal = sample_moves(aero_l, ph_l, R_l,
                                                  cfg.n_class, k_mv)
        drop = open_boundary_drop(dj, di, horizontal, grid, cfg,
                                  ix0=ix * nx_l, iy0=iy * ny_l)
        new, diag = rebucket(aero_l, dest_k, dj, di, horizontal, drop,
                             acc_l, grid, cfg, k_thin, roll_fn=roll_fn)
        diag = {k_: lax.psum(lax.psum(v, "y"), "x")
                for k_, v in diag.items()}
        return new, diag

    diag_specs = {k_: PS() for k_ in ("overflow_class", "overflow_free",
                                      "movers")}
    fn = shard_map(local, mesh=mesh,
                   in_specs=(aero_specs, ph_specs,
                             PS(None, "y", "x", None, None),
                             PS(None, "y", "x"), PS()),
                   out_specs=(aero_specs, diag_specs), check_vma=False)
    return fn(aero, ph, R, acc, key)


def transport_step(aero: AeroState, probs: OutflowProbs, xkhh, exch_h,
                   grid: Grid, cfg: Config, dt, key,
                   mesh=None, return_diag: bool = False,
                   rho3=None, dz3=None):
    """Full stochastic transport step (wrf_pmc_trans_driver equivalent):
    probability build -> move sampling -> MXU rebucket with destination-side
    preweight thinning.  With ``mesh`` given, runs the sharded ICI
    edge-buffer path (the production multi-chip design); the single-device
    path is its degenerate case with plain rolls.  Particles sampled across
    an open lateral boundary are removed (the outflow-discard of
    ``wrf_pmc_trans_aero.F90:811-955``)."""
    if mesh is not None:
        new, diag = transport_step_sharded(aero, probs, xkhh, exch_h, grid,
                                           cfg, dt, key, mesh,
                                           rho3=rho3, dz3=dz3)
        if return_diag:
            return new, diag
        return new
    k_mv, k_thin = jax.random.split(key)
    p_hdiff = horizontal_diffusion_probs(xkhh, grid, dt, rho3=rho3, cfg=cfg)
    ph = normalized_face_probs(probs, p_hdiff)
    R = vertical_operator(probs, xkhh, exch_h, grid, cfg, dt,
                          rho3=rho3, dz3=dz3)
    acc = preweight_acceptance(aero, ph, R, grid, cfg)
    dj, di, dest_k, horizontal = sample_moves(aero, ph, R, cfg.n_class, k_mv)
    drop = open_boundary_drop(dj, di, horizontal, grid, cfg)
    new, diag = rebucket(aero, dest_k, dj, di, horizontal, drop, acc,
                         grid, cfg, k_thin)
    if return_diag:
        return new, diag
    return new
