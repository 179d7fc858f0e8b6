"""Finite-volume flux-form advection operators with flux capture.

TPU-native equivalent of ``dyn_em/module_advect_em.F``: 5th/3rd-order upwind
fluxes (``advect_scalar`` :3039), the positive-definite limited scalar update
(``advect_scalar_pd`` :6079-7959, Skamarock & Weller 2008 renormalization),
and — the coupling artifact — per-face *outflow probabilities* captured for
the stochastic particle transport exactly where the reference stores
``u_flux/v_flux/w_flux`` (pd: ``:7806-7946``; mono: ``:10674-10865``).

Everything operates on [*, nz, ny, nx] arrays (arbitrary leading batch axes,
e.g. the tracer-class axis), with horizontal neighbor access by roll/clamp
(GSPMD inserts halo collectives under sharding).  Vertical faces use clamped
one-sided stencils with zero flux through the surface and model top.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .stencil import AXIS_X, AXIS_Y, AXIS_Z, make_taps, shift


def _weno_face_value(q, upwind_pos, order: int, axis: int, bc: str,
                     eps: float = 1e-6):
    """WENO reconstruction of q at the face between cells i-1 and i
    (Jiang & Shu 1996) — the scheme behind the reference's WENO advection
    variants (``module_advect_em.F:7963`` 5th-order, ``:8647`` 3rd-order).

    ``upwind_pos``: boolean/array, True where the face velocity >= 0 (donor
    is cell i-1).  The negative-velocity branch is the mirror stencil.
    """
    half = 3 if order == 5 else 2
    s = make_taps(q, -half, half - 1, axis, bc)

    # smoothness indicators are evaluated on a locally-normalized stencil so
    # the nonlinear weights stay scale-invariant in f32 (beta ~ q^2 and
    # alpha ~ 1/beta^2 would overflow/underflow for fields like number
    # concentrations ~1e9); the candidate polynomials are linear in q and use
    # the raw values.
    def weno5(qm3, qm2, qm1, q0, qp1):
        scale = jnp.maximum(jnp.abs(qm3), jnp.maximum(jnp.abs(qm2),
                jnp.maximum(jnp.abs(qm1), jnp.maximum(jnp.abs(q0),
                jnp.abs(qp1))))) + 1e-30
        n3, n2, n1, n0, np1 = (v / scale for v in (qm3, qm2, qm1, q0, qp1))
        b0 = (13.0 / 12.0) * (n3 - 2.0 * n2 + n1) ** 2 \
            + 0.25 * (n3 - 4.0 * n2 + 3.0 * n1) ** 2
        b1 = (13.0 / 12.0) * (n2 - 2.0 * n1 + n0) ** 2 \
            + 0.25 * (n2 - n0) ** 2
        b2 = (13.0 / 12.0) * (n1 - 2.0 * n0 + np1) ** 2 \
            + 0.25 * (3.0 * n1 - 4.0 * n0 + np1) ** 2
        a0 = 0.1 / (eps + b0) ** 2
        a1 = 0.6 / (eps + b1) ** 2
        a2 = 0.3 / (eps + b2) ** 2
        asum = a0 + a1 + a2            # weights normalized BEFORE combining
        p0 = (2.0 * qm3 - 7.0 * qm2 + 11.0 * qm1) / 6.0
        p1 = (-qm2 + 5.0 * qm1 + 2.0 * q0) / 6.0
        p2 = (2.0 * qm1 + 5.0 * q0 - qp1) / 6.0
        return (a0 / asum) * p0 + (a1 / asum) * p1 + (a2 / asum) * p2

    def weno3(qm2, qm1, q0):
        scale = jnp.maximum(jnp.abs(qm2),
                            jnp.maximum(jnp.abs(qm1), jnp.abs(q0))) + 1e-30
        n2, n1, n0 = qm2 / scale, qm1 / scale, q0 / scale
        b0 = (n2 - n1) ** 2
        b1 = (n1 - n0) ** 2
        a0 = (1.0 / 3.0) / (eps + b0) ** 2
        a1 = (2.0 / 3.0) / (eps + b1) ** 2
        asum = a0 + a1
        p0 = 1.5 * qm1 - 0.5 * qm2
        p1 = 0.5 * (qm1 + q0)
        return (a0 / asum) * p0 + (a1 / asum) * p1

    if order == 5:
        q_pos = weno5(s(-3), s(-2), s(-1), s(0), s(1))
        q_neg = weno5(s(2), s(1), s(0), s(-1), s(-2))
    elif order == 3:
        q_pos = weno3(s(-2), s(-1), s(0))
        q_neg = weno3(s(1), s(0), s(-1))
    else:
        raise ValueError(f"unsupported WENO order {order}")
    return jnp.where(upwind_pos, q_pos, q_neg)


def _upwind_face_flux(q, vel_face, order, axis: int, bc: str):
    """Tracer flux through owner faces: F[i] = vel_face[i] * q_interp at the
    face between cells i-1 and i.  vel_face carries the mass flux [rho*u].

    WRF's even-order symmetric flux minus odd-order upwinding dissipation
    (module_advect_em.F flux forms); ``order`` may also be "weno5"/"weno3"
    for the nonlinear WENO reconstructions (scalar_adv_opt=3/4 class).
    """
    if isinstance(order, str):
        if order not in ("weno5", "weno3"):
            raise ValueError(f"unsupported advection order {order}")
        qf = _weno_face_value(q, vel_face >= 0.0, int(order[-1]), axis, bc)
        return vel_face * qf
    half = {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}[order]
    s = make_taps(q, -half, half - 1, axis, bc)
    u = vel_face
    au = jnp.abs(vel_face)
    if order == 1:
        return 0.5 * u * (s(0) + s(-1)) - 0.5 * au * (s(0) - s(-1))
    if order == 2:
        return 0.5 * u * (s(0) + s(-1))
    if order in (3, 4):
        f4 = u * (7.0 * (s(0) + s(-1)) - (s(1) + s(-2))) / 12.0
        if order == 4:
            return f4
        return f4 - au * (3.0 * (s(0) - s(-1)) - (s(1) - s(-2))) / 12.0
    if order in (5, 6):
        f6 = u * (37.0 * (s(0) + s(-1)) - 8.0 * (s(1) + s(-2)) + (s(2) + s(-3))) / 60.0
        if order == 6:
            return f6
        return f6 - au * (10.0 * (s(0) - s(-1)) - 5.0 * (s(1) - s(-2)) + (s(2) - s(-3))) / 60.0
    raise ValueError(f"unsupported advection order {order}")


def _zero_boundary_vertical_flux(flux_w):
    """Zero mass flux through the surface (k=0 face) and model top (k=nz)."""
    nzp1 = flux_w.shape[-3]
    k = jnp.arange(nzp1).reshape(-1, 1, 1)
    return jnp.where((k == 0) | (k == nzp1 - 1), 0.0, flux_w)



def _as_col(rho):
    """Density-like coefficient: [nz] column profile -> [nz,1,1]; [ny,nx]
    column mass (the mu-coupling of the mass-coordinate core) -> [1,ny,nx];
    3-D passes through."""
    rho = jnp.asarray(rho)
    if rho.ndim == 1:
        return rho.reshape(-1, 1, 1)
    if rho.ndim == 2:
        return rho[None]
    return rho

def face_fluxes(q, rho_u, rho_v, rho_w, h_order: int, v_order: int,
                bc_x: str = "periodic", bc_y: str = "periodic"):
    """High-order tracer fluxes on all faces.

    q: [*, nz, ny, nx]; rho_u/rho_v: mass fluxes at owner x/y faces
    [nz, ny, nx] (broadcast over leading axes); rho_w: [nz+1, ny, nx].
    Returns (fx [*, nz, ny, nx], fy [*, nz, ny, nx], fz [*, nz+1, ny, nx]).
    """
    fx = _upwind_face_flux(q, rho_u, h_order, AXIS_X, bc_x)
    fy = _upwind_face_flux(q, rho_v, h_order, AXIS_Y, bc_y)
    # vertical: face k sits between cells k-1 and k; _upwind_face_flux on the
    # nz cell levels yields faces 0..nz-1 (clamped one-sided near the ends);
    # the top face (k = nz) is appended and both boundary faces zeroed.
    vo = "weno3" if isinstance(v_order, str) else min(v_order, 3)
    fz_low = _upwind_face_flux(q, rho_w[..., :-1, :, :], vo, AXIS_Z, "clamp")
    fz = jnp.concatenate([fz_low, jnp.zeros_like(fz_low[..., :1, :, :])], axis=-3)
    fz = _zero_boundary_vertical_flux(fz)
    return fx, fy, fz


def flux_divergence(fx, fy, fz, rdx: float, rdy: float, rdz):
    """div(F) at cell centers.  rdz: [nz] 1/dz (base-state layer depths)."""
    dfx = (shift(fx, 1, AXIS_X) - fx) * rdx
    dfy = (shift(fy, 1, AXIS_Y) - fy) * rdy
    dfz = (fz[..., 1:, :, :] - fz[..., :-1, :, :]) * rdz.reshape(-1, 1, 1)
    return dfx + dfy + dfz


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class OutflowProbs:
    """Per-cell, per-face fractions of tracer mass leaving during dt — the
    move probabilities the stochastic transport consumes (the quantity the
    reference reconstructs in ``compute_advect_probs_wrf``,
    ``wrf_pmc_trans.F90:205-284``).  Shapes [*, nz, ny, nx]."""

    xm: jax.Array   # through my west face, moving -x
    xp: jax.Array   # through east face, +x
    ym: jax.Array
    yp: jax.Array
    zm: jax.Array   # downward through bottom face
    zp: jax.Array   # upward through top face


def advect_pd(q, rho_u, rho_v, rho_w, rho, dt, rdx, rdy, rdz,
              h_order: int = 5, v_order: int = 3,
              bc_x: str = "periodic", bc_y: str = "periodic",
              w_prob_cap: float = 0.95, q_stage=None, rho_new=None):
    """Positive-definite flux-limited advection step with flux capture.

    q: [*, nz, ny, nx] mixing ratio at time t (the field updated and the PD
    donor-mass reference); ``q_stage``: the field the high-order fluxes are
    evaluated at (the RK3 stage-2 estimate q**; defaults to q for a plain
    forward step).  rho: [nz] base density (the mu-coupling analogue).
    Returns (q_new, OutflowProbs).

    Scheme (advect_scalar_pd): 1st-order monotone fluxes of q^t give a
    transported-diffused field q_td >= 0; the high-order antidiffusive
    correction is renormalized per donor cell so q stays >= 0 (Skamarock
    2006).  The final total face fluxes, converted to outflow-only fractions
    of each donor cell's tracer mass, are the captured transport
    probabilities.
    """
    if q_stage is None:
        q_stage = q
    rho_c = _as_col(rho)
    rho_n = rho_c if rho_new is None else _as_col(rho_new)
    fx_h, fy_h, fz_h = face_fluxes(q_stage, rho_u, rho_v, rho_w, h_order, v_order, bc_x, bc_y)
    fx_l, fy_l, fz_l = face_fluxes(q, rho_u, rho_v, rho_w, 1, 1, bc_x, bc_y)
    fz_l = _zero_boundary_vertical_flux(fz_l)

    # (rho_n q_td - rho_c q)/dt = -div F_low: exact discrete mass continuity
    # when the mass fluxes satisfy (rho_n - rho_c)/dt = -div(mass)
    q_td = (rho_c * q - dt * flux_divergence(fx_l, fy_l, fz_l, rdx, rdy, rdz)) / rho_n
    q_td = jnp.maximum(q_td, 0.0)   # guard roundoff

    ax, ay, az = fx_h - fx_l, fy_h - fy_l, fz_h - fz_l

    # antidiffusive mass leaving each donor cell (per unit time)
    def outgoing(a_face, axis, geom):
        # flux at owner face: positive => leaves cell i-1 (+dir), negative =>
        # leaves cell i (-dir)
        out_lo = jnp.maximum(-a_face, 0.0) * geom          # leaves cell i
        out_hi = jnp.maximum(shift(a_face, 1, axis), 0.0) * geom  # leaves i via +face
        return out_lo + out_hi

    out_x = outgoing(ax, AXIS_X, rdx)
    out_y = outgoing(ay, AXIS_Y, rdy)
    out_z = (jnp.maximum(az[..., 1:, :, :], 0.0)
             + jnp.maximum(-az[..., :-1, :, :], 0.0)) * rdz.reshape(-1, 1, 1)
    out_total = out_x + out_y + out_z                       # [*, nz, ny, nx]

    avail = rho_n * q_td / dt
    scale = jnp.where(out_total > 0.0, jnp.minimum(1.0, avail / jnp.maximum(out_total, 1e-30)), 1.0)

    def limit(a_face, axis):
        don_pos = shift(scale, -1, axis)    # donor for positive flux = cell i-1
        don_neg = scale                      # donor for negative flux = cell i
        return jnp.where(a_face > 0.0, a_face * don_pos, a_face * don_neg)

    ax = limit(ax, AXIS_X)
    ay = limit(ay, AXIS_Y)
    # vertical: face k donor is cell k-1 (positive/up) or cell k (negative)
    sc_pad = jnp.concatenate([scale[..., :1, :, :], scale, scale[..., -1:, :, :]], axis=-3)
    az = jnp.where(az > 0.0, az * sc_pad[..., :-1, :, :], az * sc_pad[..., 1:, :, :])
    az = _zero_boundary_vertical_flux(az)

    q_new = q_td - dt * flux_divergence(ax, ay, az, rdx, rdy, rdz) / rho_n

    fx_t, fy_t, fz_t = fx_l + ax, fy_l + ay, fz_l + az
    probs = capture_outflow_probs(q, fx_t, fy_t, fz_t, rho, dt, rdx, rdy, rdz,
                                  w_prob_cap)
    return q_new, probs


def rk3_advect_pd(q, rho_u, rho_v, rho_w, rho, dt, rdx, rdy, rdz,
                  h_order: int = 5, v_order: int = 3,
                  bc_x: str = "periodic", bc_y: str = "periodic",
                  w_prob_cap: float = 0.95, rho_new=None):
    """Wicker-Skamarock RK3 scalar advection with PD limiting + flux capture
    on the final stage — the chem/moist advection path of one solve_em step
    (``solve_em.F:2514-2645``: per-RK-stage rk_scalar_tend, PD on the last).

    Stages 1-2 are plain high-order flux-divergence estimates (dt/3, dt/2);
    stage 3 applies the PD-limited full-dt update to q^t using stage-2 fluxes.
    """
    rho_c = _as_col(rho)

    def tend(qs):
        fx, fy, fz = face_fluxes(qs, rho_u, rho_v, rho_w, h_order, v_order, bc_x, bc_y)
        return -flux_divergence(fx, fy, fz, rdx, rdy, rdz) / rho_c

    q1 = q + (dt / 3.0) * tend(q)
    q2 = q + (dt / 2.0) * tend(q1)
    return advect_pd(q, rho_u, rho_v, rho_w, rho, dt, rdx, rdy, rdz,
                     h_order, v_order, bc_x, bc_y, w_prob_cap, q_stage=q2,
                     rho_new=rho_new)


def advect_mono(q, rho_u, rho_v, rho_w, rho, dt, rdx, rdy, rdz,
                h_order: int = 5, v_order: int = 3,
                bc_x: str = "periodic", bc_y: str = "periodic",
                w_prob_cap: float = 0.95, q_stage=None, rho_new=None):
    """Monotonic flux-limited advection step with flux capture — the
    ``advect_scalar_mono`` path (``module_advect_em.F:9569-10865``,
    selected by chem_adv_opt=2 in the PartMC test namelists).

    Zalesak/FCT limiter: the 1st-order monotone update q_td sets the
    transported-diffused state; antidiffusive corrections are limited per
    face so the result stays within the local [min, max] envelope of
    (q, q_td) over the 6-neighbor stencil — no new extrema, positivity
    included (strictly stronger than the PD limiter).
    """
    if q_stage is None:
        q_stage = q
    rho_c = _as_col(rho)
    rho_n = rho_c if rho_new is None else _as_col(rho_new)
    fx_h, fy_h, fz_h = face_fluxes(q_stage, rho_u, rho_v, rho_w, h_order,
                                   v_order, bc_x, bc_y)
    fx_l, fy_l, fz_l = face_fluxes(q, rho_u, rho_v, rho_w, 1, 1, bc_x, bc_y)
    fz_l = _zero_boundary_vertical_flux(fz_l)

    q_td = (rho_c * q - dt * flux_divergence(fx_l, fy_l, fz_l, rdx, rdy, rdz)) / rho_n
    q_td = jnp.maximum(q_td, 0.0)

    ax, ay, az = fx_h - fx_l, fy_h - fy_l, fz_h - fz_l
    az = _zero_boundary_vertical_flux(az)

    # local extrema envelope over both time levels and the 6-point stencil
    def minmax(f):
        def nb(a, axis, bc):
            return jnp.stack([shift(a, 1, axis, bc), shift(a, -1, axis, bc)])
        z_lo = jnp.concatenate([q_td[..., :1, :, :],
                                q_td[..., :-1, :, :]], axis=-3)
        z_hi = jnp.concatenate([q_td[..., 1:, :, :],
                                q_td[..., -1:, :, :]], axis=-3)
        cand = jnp.stack([q, q_td, z_lo, z_hi,
                          shift(q_td, 1, AXIS_X, bc_x),
                          shift(q_td, -1, AXIS_X, bc_x),
                          shift(q_td, 1, AXIS_Y, bc_y),
                          shift(q_td, -1, AXIS_Y, bc_y)])
        return f(cand, axis=0)

    q_max = minmax(jnp.max)
    q_min = jnp.maximum(minmax(jnp.min), 0.0)

    # incoming (P+) and outgoing (P-) antidiffusive mass rates per cell
    def in_out(a_face, axis, geom):
        inc = (jnp.maximum(a_face, 0.0)
               + jnp.maximum(-shift(a_face, 1, axis), 0.0)) * geom
        out = (jnp.maximum(-a_face, 0.0)
               + jnp.maximum(shift(a_face, 1, axis), 0.0)) * geom
        return inc, out

    in_x, out_x = in_out(ax, AXIS_X, rdx)
    in_y, out_y = in_out(ay, AXIS_Y, rdy)
    rdz_c = rdz.reshape(-1, 1, 1)
    in_z = (jnp.maximum(az[..., :-1, :, :], 0.0)
            + jnp.maximum(-az[..., 1:, :, :], 0.0)) * rdz_c
    out_z = (jnp.maximum(-az[..., :-1, :, :], 0.0)
             + jnp.maximum(az[..., 1:, :, :], 0.0)) * rdz_c
    p_in = in_x + in_y + in_z
    p_out = out_x + out_y + out_z

    r_in = jnp.where(p_in > 0.0,
                     jnp.minimum(1.0, rho_n * (q_max - q_td)
                                 / (dt * jnp.maximum(p_in, 1e-30))), 1.0)
    r_out = jnp.where(p_out > 0.0,
                      jnp.minimum(1.0, rho_n * (q_td - q_min)
                                  / (dt * jnp.maximum(p_out, 1e-30))), 1.0)
    r_in = jnp.clip(r_in, 0.0, 1.0)
    r_out = jnp.clip(r_out, 0.0, 1.0)

    # face factor: min(receiver r_in, donor r_out) by flux sign
    def limit(a_face, axis):
        rin_lo, rout_lo = r_in, r_out                     # cell i (this side)
        rin_hi = shift(r_in, -1, axis)                    # cell i-1
        rout_hi = shift(r_out, -1, axis)
        fac = jnp.where(a_face > 0.0, jnp.minimum(rin_lo, rout_hi),
                        jnp.minimum(rin_hi, rout_lo))
        return a_face * fac

    ax = limit(ax, AXIS_X)
    ay = limit(ay, AXIS_Y)
    # vertical faces: face k between cells k-1 (below) and k (above);
    # positive flux (upward... sign convention: flux toward +z) donor k-1
    pad = lambda a: jnp.concatenate([a[..., :1, :, :], a, a[..., -1:, :, :]],
                                    axis=-3)
    rin_p, rout_p = pad(r_in), pad(r_out)
    fac_z = jnp.where(az > 0.0,
                      jnp.minimum(rin_p[..., 1:, :, :], rout_p[..., :-1, :, :]),
                      jnp.minimum(rin_p[..., :-1, :, :], rout_p[..., 1:, :, :]))
    az = az * fac_z
    az = _zero_boundary_vertical_flux(az)

    q_new = q_td - dt * flux_divergence(ax, ay, az, rdx, rdy, rdz) / rho_n

    fx_t, fy_t, fz_t = fx_l + ax, fy_l + ay, fz_l + az
    probs = capture_outflow_probs(q, fx_t, fy_t, fz_t, rho, dt, rdx, rdy,
                                  rdz, w_prob_cap)
    return q_new, probs


def rk3_advect_mono(q, rho_u, rho_v, rho_w, rho, dt, rdx, rdy, rdz,
                    h_order: int = 5, v_order: int = 3,
                    bc_x: str = "periodic", bc_y: str = "periodic",
                    w_prob_cap: float = 0.95, rho_new=None):
    """RK3 scalar advection with the monotonic limiter on the final stage
    (chem_adv_opt=2: ``solve_em.F:2525-2552`` -> advect_scalar_mono)."""
    rho_c = _as_col(rho)

    def tend(qs):
        fx, fy, fz = face_fluxes(qs, rho_u, rho_v, rho_w, h_order, v_order,
                                 bc_x, bc_y)
        return -flux_divergence(fx, fy, fz, rdx, rdy, rdz) / rho_c

    q1 = q + (dt / 3.0) * tend(q)
    q2 = q + (dt / 2.0) * tend(q1)
    return advect_mono(q, rho_u, rho_v, rho_w, rho, dt, rdx, rdy, rdz,
                       h_order, v_order, bc_x, bc_y, w_prob_cap, q_stage=q2,
                       rho_new=rho_new)


def capture_outflow_probs(q, fx, fy, fz, rho, dt, rdx, rdy, rdz,
                          w_prob_cap: float = 0.95, q_eps: float = 1e-30):
    """Convert total face fluxes to per-cell outflow fractions.

    P(face) = outgoing tracer mass through the face / cell tracer mass, with
    the reference's guards: outflow-only sign selection, w-face cap, and
    renormalization when the total exceeds 1 (``wrf_pmc_trans.F90:236-284``).
    """
    cell_mass_rate = _as_col(rho) * jnp.maximum(q, q_eps) / dt  # per dx-units
    inv = 1.0 / cell_mass_rate

    xm = jnp.maximum(-fx, 0.0) * rdx * inv
    xp = jnp.maximum(shift(fx, 1, AXIS_X), 0.0) * rdx * inv
    ym = jnp.maximum(-fy, 0.0) * rdy * inv
    yp = jnp.maximum(shift(fy, 1, AXIS_Y), 0.0) * rdy * inv
    rdz_c = rdz.reshape(-1, 1, 1)
    zm = jnp.maximum(-fz[..., :-1, :, :], 0.0) * rdz_c * inv
    zp = jnp.maximum(fz[..., 1:, :, :], 0.0) * rdz_c * inv

    zm = jnp.minimum(zm, w_prob_cap)
    zp = jnp.minimum(zp, w_prob_cap)
    total = xm + xp + ym + yp + zm + zp
    fac = jnp.where(total > 1.0, 1.0 / jnp.maximum(total, 1e-30), 1.0)
    zero_q = q <= q_eps
    fix = lambda p: jnp.where(zero_q, 0.0, jnp.clip(p * fac, 0.0, 1.0))
    return OutflowProbs(xm=fix(xm), xp=fix(xp), ym=fix(ym), yp=fix(yp),
                        zm=fix(zm), zp=fix(zp))
