"""The dycore timestep — RK3 time-split integration with acoustic substeps.

TPU-native equivalent of ``dyn_em/solve_em.F``: the 3-stage Wicker-Skamarock
RK loop (``solve_em.F:510-545``), split-explicit acoustic substeps with
forward-backward horizontal momentum and a vertically-implicit w-p solve
(``advance_uv``/``advance_mu_t``/``advance_w``,
``dyn_em/module_small_step_em.F``), divergence damping and forward
off-centering (smdiv/epssm), followed by RK3 positive-definite scalar
advection with per-class flux capture (``solve_em.F:2514-2645``) — all as
fused jnp/XLA stencil ops over [nz, ny, nx] fields.

Deliberate round-1 simplifications vs the reference (documented for parity
tracking): flat terrain (no map factors / terrain metric terms), a
quasi-compressible linearized pressure equation dp'/dtau = -rho_b c_s^2 div(v)
in place of the full mass-coordinate geopotential prognostic, and buoyancy
g theta'/theta_b frozen over each stage's acoustic loop.  The frozen-dynamics
transport-verification mode (``constant_velocity``) reproduces
``-DPMC_CONSTANT_VEL`` (``solve_em.F:535,1326,1548``) exactly: only scalars
advance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ... import constants as c
from ...config import Config
from ...grid import Grid
from ...ops.advection import (OutflowProbs, face_fluxes, flux_divergence,
                              rk3_advect_mono, rk3_advect_pd)
from ...ops.stencil import AXIS_X, AXIS_Y, shift
from ...ops.tridiag import solve as tridiag_solve
from .state import DycoreState, base_profiles, replace


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepDiag:
    """Per-step diagnostics consumed by the particle transport."""

    probs: OutflowProbs      # per-class outflow probabilities [n_class, ...]
    xkhh: jax.Array          # horizontal eddy diffusivity [nz, ny, nx]
    rho_u: jax.Array         # time-averaged mass-flux winds (sumflux analogue)
    rho_v: jax.Array
    rho_w: jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _SlowTend:
    u: jax.Array
    v: jax.Array
    w: jax.Array
    theta: jax.Array


def _bc_pair(cfg: Config):
    bx = "periodic" if cfg.boundary.periodic_x else "clamp"
    by = "periodic" if cfg.boundary.periodic_y else "clamp"
    return bx, by


def _rho_faces(rho_b):
    """Base density at w levels [nz+1] (edge-extrapolated)."""
    mid = 0.5 * (rho_b[1:] + rho_b[:-1])
    return jnp.concatenate([rho_b[:1], mid, rho_b[-1:]])


def _advective_tendency(f, mfx, mfy, mfz, rho_col, rdx, rdy, rdz, h_order,
                        v_order, bc_x, bc_y):
    """Advective-form tendency -v.grad(f) computed as flux form minus
    f * mass-divergence (exact for any velocity field)."""
    fx, fy, fz = face_fluxes(f, mfx, mfy, mfz, h_order, v_order, bc_x, bc_y)
    div_f = flux_divergence(fx, fy, fz, rdx, rdy, rdz)
    div_m = ((shift(mfx, 1, AXIS_X, bc_x) - mfx) * rdx
             + (shift(mfy, 1, AXIS_Y, bc_y) - mfy) * rdy
             + (mfz[..., 1:, :, :] - mfz[..., :-1, :, :]) * rdz.reshape(-1, 1, 1))
    return -(div_f - f * div_m) / rho_col


def _laplacian_h(f, rdx, rdy, bc_x, bc_y):
    return ((shift(f, 1, AXIS_X, bc_x) - 2 * f + shift(f, -1, AXIS_X, bc_x)) * rdx ** 2
            + (shift(f, 1, AXIS_Y, bc_y) - 2 * f + shift(f, -1, AXIS_Y, bc_y)) * rdy ** 2)


def deformation_mag(state: DycoreState, grid: Grid, cfg: Config):
    """Horizontal deformation magnitude |D| = sqrt(D11^2 + D22^2 + 2 D12^2)
    at cell centers (module_diffusion_em horizontal strain)."""
    bx, by = _bc_pair(cfg)
    rdx, rdy = grid.rdx, grid.rdy
    u_c = 0.5 * (state.u + shift(state.u, 1, AXIS_X, bx))
    v_c = 0.5 * (state.v + shift(state.v, 1, AXIS_Y, by))
    d11 = (shift(state.u, 1, AXIS_X, bx) - state.u) * rdx
    d22 = (shift(state.v, 1, AXIS_Y, by) - state.v) * rdy
    dudy = (shift(u_c, 1, AXIS_Y, by) - shift(u_c, -1, AXIS_Y, by)) * 0.5 * rdy
    dvdx = (shift(v_c, 1, AXIS_X, bx) - shift(v_c, -1, AXIS_X, bx)) * 0.5 * rdx
    d12 = 0.5 * (dudy + dvdx)
    return jnp.sqrt(d11 ** 2 + d22 ** 2 + 2.0 * d12 ** 2)


def smagorinsky_khh(state: DycoreState, grid: Grid, cfg: Config):
    """2-D Smagorinsky first-order closure (module_diffusion_em horizontal
    path, km_opt=4): K = (c_s dx)^2 |D|."""
    return (cfg.dynamics.smag_cs * grid.dx) ** 2 * deformation_mag(state, grid, cfg)


def brunt_vaisala_sq(state: DycoreState, grid: Grid):
    """Moist-free N^2 = (g/theta) dtheta/dz at cell centers [nz, ny, nx]."""
    _, theta_b, _ = base_profiles(grid)
    th = theta_b.reshape(-1, 1, 1) + state.theta_p
    zh = grid.z_half
    # spacing matched to the dth stencil: one-sided at ends, centered interior
    dz_f = jnp.concatenate([zh[1:2] - zh[0:1],
                            0.5 * (zh[2:] - zh[:-2]),
                            zh[-1:] - zh[-2:-1]])
    dth = jnp.concatenate([th[1:2] - th[0:1],
                           0.5 * (th[2:] - th[:-2]),
                           th[-1:] - th[-2:-1]], axis=0)
    dthdz = dth / dz_f.reshape(-1, 1, 1)
    return (c.GRAV / th) * dthdz


def tke_eddy_coeffs(state: DycoreState, grid: Grid, cfg: Config):
    """Eddy viscosities from the prognostic subgrid TKE (km_opt=2, the
    1.5-order closure of ``module_diffusion_em``): K_m = c_k l sqrt(e) with
    the stability-limited mixing length l = min(Delta, 0.76 sqrt(e/N^2)),
    K_h = (1 + 2 l / Delta) K_m (Deardorff 1980)."""
    e = jnp.maximum(state.tke, cfg.dynamics.tke_seed)
    delta = (grid.dx * grid.dy * grid.dz.reshape(-1, 1, 1).mean()) ** (1.0 / 3.0)
    n2 = brunt_vaisala_sq(state, grid)
    l_stable = 0.76 * jnp.sqrt(e / jnp.maximum(n2, 1e-10))
    length = jnp.where(n2 > 1e-10, jnp.minimum(delta, l_stable), delta)
    km = 0.10 * length * jnp.sqrt(e)
    kh = (1.0 + 2.0 * length / delta) * km
    return km, kh, length, delta


def tke_advance(state: DycoreState, grid: Grid, cfg: Config, dt: float):
    """One forward step of the prognostic TKE equation:
    de/dt = -v.grad(e) + P_shear + P_buoy - dissipation + diffusion.

    P_shear = K_m |D|^2, P_buoy = -K_h N^2, eps = C_e e^(3/2)/l with
    C_e = 1.9 stable-limit blend (Deardorff); e floored at tke_seed."""
    bx, by = _bc_pair(cfg)
    rho_b, _, _ = base_profiles(grid)
    rho_c = rho_b.reshape(-1, 1, 1)
    rho_f = _rho_faces(rho_b)
    rdz = 1.0 / grid.dz
    km, kh, length, delta = tke_eddy_coeffs(state, grid, cfg)
    adv = _advective_tendency(state.tke, rho_c * state.u, rho_c * state.v,
                              rho_f.reshape(-1, 1, 1) * state.w, rho_c,
                              grid.rdx, grid.rdy, rdz, 2, 2, bx, by)
    p_shear = km * deformation_mag(state, grid, cfg) ** 2
    p_buoy = -kh * brunt_vaisala_sq(state, grid)
    c_eps = 1.9 * (0.93 + 0.07 * length / delta)   # WRF's l/Delta blend shape
    e = jnp.maximum(state.tke, 0.0)
    diss = c_eps * e ** 1.5 / jnp.maximum(length, 1e-3)
    diff = 2.0 * km * _laplacian_h(e, grid.rdx, grid.rdy, bx, by)
    e_new = e + dt * (adv + p_shear + p_buoy - diss + diff)
    return jnp.maximum(e_new, cfg.dynamics.tke_seed), kh


def _slow_tendencies(s: DycoreState, grid: Grid, cfg: Config) -> _SlowTend:
    """Advection + mixing tendencies of the dynamic variables at the RK stage
    argument state (rk_tendency, ``solve_em.F:866``)."""
    dyn = cfg.dynamics
    bx, by = _bc_pair(cfg)
    rho_b, theta_b, _ = base_profiles(grid)
    rho_f = _rho_faces(rho_b)
    rdx, rdy = grid.rdx, grid.rdy
    rdz = 1.0 / grid.dz
    rho_c = rho_b.reshape(-1, 1, 1)
    rho_fc = rho_f.reshape(-1, 1, 1)
    ho, vo = dyn.h_adv_order, dyn.v_adv_order

    rho_u = rho_c * s.u
    rho_v = rho_c * s.v
    rho_w = rho_fc * s.w

    # --- u tendency (u-grid: faces between u-points are mass centers) ---
    mfx_u = 0.5 * (rho_u + shift(rho_u, -1, AXIS_X, bx))
    mfy_u = 0.5 * (rho_v + shift(rho_v, -1, AXIS_X, bx))
    mfz_u = 0.5 * (rho_w + shift(rho_w, -1, AXIS_X, bx))
    t_u = _advective_tendency(s.u, mfx_u, mfy_u, mfz_u, rho_c, rdx, rdy, rdz,
                              ho, vo, bx, by)

    # --- v tendency ---
    mfx_v = 0.5 * (rho_u + shift(rho_u, -1, AXIS_Y, by))
    mfy_v = 0.5 * (rho_v + shift(rho_v, -1, AXIS_Y, by))
    mfz_v = 0.5 * (rho_w + shift(rho_w, -1, AXIS_Y, by))
    t_v = _advective_tendency(s.v, mfx_v, mfy_v, mfz_v, rho_c, rdx, rdy, rdz,
                              ho, vo, bx, by)

    # --- w tendency (2nd-order advective form on w levels) ---
    u_c = 0.5 * (s.u + shift(s.u, 1, AXIS_X, bx))          # cell centers
    v_c = 0.5 * (s.v + shift(s.v, 1, AXIS_Y, by))
    u_w = jnp.concatenate([u_c[:1], 0.5 * (u_c[1:] + u_c[:-1]), u_c[-1:]], axis=0)
    v_w = jnp.concatenate([v_c[:1], 0.5 * (v_c[1:] + v_c[:-1]), v_c[-1:]], axis=0)
    dwdx = (shift(s.w, 1, AXIS_X, bx) - shift(s.w, -1, AXIS_X, bx)) * 0.5 * rdx
    dwdy = (shift(s.w, 1, AXIS_Y, by) - shift(s.w, -1, AXIS_Y, by)) * 0.5 * rdy
    dz_f = jnp.concatenate([grid.dz[:1], 0.5 * (grid.dz[1:] + grid.dz[:-1]),
                            grid.dz[-1:]]).reshape(-1, 1, 1)
    # dwdz at w-level k: centered over neighbouring w levels
    dwdz = jnp.concatenate([jnp.zeros_like(s.w[:1]),
                            0.5 * (s.w[2:] - s.w[:-2]) / dz_f[1:-1],
                            jnp.zeros_like(s.w[:1])], axis=0)
    t_w = -(u_w * dwdx + v_w * dwdy + s.w * dwdz)

    # --- theta tendency (flux form advective) ---
    t_th = _advective_tendency(s.theta_p, rho_u, rho_v, rho_w, rho_c,
                               rdx, rdy, rdz, ho, vo, bx, by)

    # --- mixing ---
    if dyn.diff_opt == 1 and dyn.khdif > 0:
        t_u = t_u + dyn.khdif * _laplacian_h(s.u, rdx, rdy, bx, by)
        t_v = t_v + dyn.khdif * _laplacian_h(s.v, rdx, rdy, bx, by)
        t_th = t_th + dyn.khdif * _laplacian_h(s.theta_p, rdx, rdy, bx, by)
    elif dyn.diff_opt == 2:
        if dyn.km_opt == 2:
            _, kh, _, _ = tke_eddy_coeffs(s, grid, cfg)
        else:
            kh = smagorinsky_khh(s, grid, cfg)
        t_u = t_u + kh * _laplacian_h(s.u, rdx, rdy, bx, by)
        t_v = t_v + kh * _laplacian_h(s.v, rdx, rdy, bx, by)
        t_th = t_th + kh * _laplacian_h(s.theta_p, rdx, rdy, bx, by)

    return _SlowTend(u=t_u, v=t_v, w=t_w, theta=t_th)


def _acoustic_integrate(state_t: DycoreState, tend: _SlowTend, theta_stage,
                        grid: Grid, cfg: Config, dts, ns: int):
    """Split-explicit acoustic integration over one RK stage interval.

    Forward-backward horizontal momentum; vertically implicit w-p column
    solve with off-centering beta = (1 + epssm)/2 (advance_w equivalent).
    """
    dyn = cfg.dynamics
    bx, by = _bc_pair(cfg)
    rho_b, theta_b, cs2 = base_profiles(grid)
    alpha_b = grid.alpha_base
    rdx, rdy = grid.rdx, grid.rdy
    dz = grid.dz
    nz = grid.nz
    dtau = dts / ns
    beta = 0.5 * (1.0 + dyn.epssm)

    rho_c = rho_b.reshape(-1, 1, 1)
    cs2_c = cs2.reshape(-1, 1, 1)
    rhocs2 = (rho_b * cs2).reshape(-1, 1, 1)
    alpha_c = alpha_b.reshape(-1, 1, 1)

    # interior w faces k = 1..nz-1
    dzf = (grid.z_half[1:] - grid.z_half[:-1]).reshape(-1, 1, 1)       # [nz-1]
    alpha_f = (0.5 * (alpha_b[1:] + alpha_b[:-1])).reshape(-1, 1, 1)   # [nz-1]
    th_b_f = (0.5 * (theta_b[1:] + theta_b[:-1])).reshape(-1, 1, 1)
    th_f = 0.5 * (theta_stage[1:] + theta_stage[:-1])
    buoy = c.GRAV * th_f / th_b_f                                      # [nz-1]

    # tridiagonal coefficients (time-invariant within the stage)
    A = (dtau ** 2) * (beta ** 2) * alpha_f / dzf                      # [nz-1,1,1]
    rc_up = (rho_b * cs2 / grid.dz).reshape(-1, 1, 1)                  # [nz]
    b_diag = 1.0 + A * (rc_up[1:] + rc_up[:-1])
    c_diag = -A * rc_up[1:]
    a_diag = -A * rc_up[:-1]

    def substep(carry, _):
        u, v, w, pp, pp_prev = carry
        pe = pp + dyn.smdiv * (pp - pp_prev)       # divergence-damped p for grads

        # forward: horizontal momentum
        dpdx = (pe - shift(pe, -1, AXIS_X, bx)) * rdx
        dpdy = (pe - shift(pe, -1, AXIS_Y, by)) * rdy
        u = u + dtau * (-alpha_c * dpdx + tend.u)
        v = v + dtau * (-alpha_c * dpdy + tend.v)

        # backward: implicit w-p
        div_h = ((shift(u, 1, AXIS_X, bx) - u) * rdx
                 + (shift(v, 1, AXIS_Y, by) - v) * rdy)
        dzw = (w[1:] - w[:-1]) / dz.reshape(-1, 1, 1)
        p_tilde = pp - dtau * rhocs2 * (div_h + (1.0 - beta) * dzw)
        p_bar = beta * p_tilde + (1.0 - beta) * pp
        dpdz_f = (p_bar[1:] - p_bar[:-1]) / dzf
        w_int = w[1:-1]
        rhs = (w_int + dtau * (buoy + tend.w[1:-1]) - dtau * alpha_f * dpdz_f)
        w_new_int = tridiag_solve(a_diag, b_diag, c_diag, rhs)
        zeros = jnp.zeros_like(w[:1])
        w = jnp.concatenate([zeros, w_new_int, zeros], axis=0)
        dzw_new = (w[1:] - w[:-1]) / dz.reshape(-1, 1, 1)
        pp_new = p_tilde - dtau * beta * rhocs2 * dzw_new
        return (u, v, w, pp_new, pp), None

    carry0 = (state_t.u, state_t.v, state_t.w, state_t.p_p, state_t.p_p)
    (u, v, w, pp, _), _ = jax.lax.scan(substep, carry0, None, length=ns)
    return u, v, w, pp


def dyn_step(state: DycoreState, grid: Grid, cfg: Config) -> DycoreState:
    """RK3 update of the dynamic variables (u, v, w, theta', p')."""
    dyn = cfg.dynamics
    dt = dyn.dt

    def stage(arg: DycoreState, frac: float, ns: int) -> DycoreState:
        tend = _slow_tendencies(arg, grid, cfg)
        u, v, w, pp = _acoustic_integrate(state, tend, arg.theta_p, grid, cfg,
                                          dt * frac, ns)
        theta = state.theta_p + dt * frac * tend.theta
        return replace(state, u=u, v=v, w=w, p_p=pp, theta_p=theta)

    ns = max(1, dyn.n_sound)
    s1 = stage(state, 1.0 / 3.0, 1)
    s2 = stage(s1, 0.5, max(1, ns // 2))
    s3 = stage(s2, 1.0, ns)

    # upper-level implicit Rayleigh damping on w (damp_opt=3,
    # ``dyn_em/module_damping_em.F`` / Klemp et al. 2008): tau(z) ramps as
    # sin^2 over the top zdamp meters; w <- w / (1 + dt tau)
    if dyn.damp_opt:
        ztop = grid.z_full[-1]
        zd = jnp.asarray(grid.z_full).reshape(-1, 1, 1)
        frac = jnp.clip((zd - (ztop - dyn.zdamp)) / max(dyn.zdamp, 1.0),
                        0.0, 1.0)
        tau = dyn.dampcoef * jnp.sin(0.5 * jnp.pi * frac) ** 2
        s3 = replace(s3, w=s3.w / (1.0 + dt * tau))
    return s3


def solve_step(state: DycoreState, grid: Grid, cfg: Config):
    """One full dycore timestep: dynamics + scalar families with per-class
    flux capture.  Returns (new_state, StepDiag).

    Dispatches on ``dynamics.dyn_opt``: "arw" (full mass-coordinate core,
    the production path) requires state.mu/state.ph; "linear" is the round-1
    flat-terrain quasi-compressible core kept for parity tests."""
    if cfg.dynamics.dyn_opt == "arw" and state.mu is not None:
        from .arw import solve_step_arw

        return solve_step_arw(state, grid, cfg)
    dyn = cfg.dynamics
    bx, by = _bc_pair(cfg)
    rho_b, _, _ = base_profiles(grid)
    rho_f = _rho_faces(rho_b)
    rdz = 1.0 / grid.dz

    if dyn.constant_velocity:
        new = state          # PMC_CONSTANT_VEL: dynamics frozen
    else:
        new = dyn_step(state, grid, cfg)

    # time-averaged mass-flux winds for scalar transport (sumflux analogue,
    # solve_em.F:1617)
    rho_u = rho_b.reshape(-1, 1, 1) * 0.5 * (state.u + new.u)
    rho_v = rho_b.reshape(-1, 1, 1) * 0.5 * (state.v + new.v)
    rho_w = rho_f.reshape(-1, 1, 1) * 0.5 * (state.w + new.w)

    def adv(q, opt):
        fn = rk3_advect_mono if opt == "mono" else rk3_advect_pd
        return fn(q, rho_u, rho_v, rho_w, rho_b, dyn.dt, grid.rdx, grid.rdy,
                  rdz, dyn.h_adv_order, dyn.v_adv_order, bx, by,
                  w_prob_cap=cfg.partmc.w_prob_cap)

    moist, _ = adv(state.moist, dyn.moist_adv_opt)
    chem, _ = adv(state.chem, dyn.chem_adv_opt)
    num_conc, probs = adv(state.num_conc, dyn.chem_adv_opt)

    if dyn.diff_opt == 2 and dyn.km_opt == 2:
        tke_new, xkhh = tke_advance(new, grid, cfg, dyn.dt)
        new = replace(new, tke=tke_new)
    elif dyn.diff_opt == 2:
        xkhh = smagorinsky_khh(new, grid, cfg)
    else:
        xkhh = jnp.full((grid.nz, grid.ny, grid.nx), dyn.khdif, jnp.float32)

    new = replace(new, moist=moist, chem=chem, num_conc=num_conc)

    # microphysics adjustment at the end of the step (solve_em.F:3760)
    if dyn.mp_physics == 1:
        from ..physics.microphysics import kessler_step

        new = kessler_step(new, grid, dyn.dt)
    elif dyn.mp_physics == 2:
        from ..physics.microphysics import wsm5_step

        new = wsm5_step(new, grid, dyn.dt)
    elif dyn.mp_physics == 10:
        from ..physics.morrison import morrison_step

        new = morrison_step(new, grid, dyn.dt)
    return new, StepDiag(probs=probs, xkhh=xkhh, rho_u=rho_u, rho_v=rho_v,
                         rho_w=rho_w)
