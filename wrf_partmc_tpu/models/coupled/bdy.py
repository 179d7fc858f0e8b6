"""Specified + relaxation lateral boundary conditions (the wrfbdy contract).

Equivalent of ``share/module_bc.F`` ``spec_bdy_scalar``/``relax_bdy_scalar``
applied at ``solve_em.F:2586-2614``: real-data runs force the lateral
boundaries from a time series of boundary values (wrfbdy file) — the
outermost ``spec_zone`` points are set to the (time-interpolated) boundary
value; the next ``relax_zone`` points are Davies-relaxed toward it with
weights decaying into the interior.  NUM_CONC tracers are excluded, as in
the reference (``ic < p_NUM_CONC_a01`` guard, ``solve_em.F:2667``) — they
are re-derived from the particle field each step.

TPU-native arrangement: the boundary time series is carried as four
fixed-width edge slabs per variable (static shapes), the zone weights are a
precomputed [ny, nx] field, and the application is one elementwise blend per
variable after the dycore update — no tendency-splitting, which for the
weights used here is equivalent to the reference's tendency form to O(dt).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...grid import Grid
from ..dycore.state import DycoreState


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BdyData:
    """Boundary time series.  Each entry of ``slabs`` maps a variable name
    ("u", "v", "theta_p", "moist", "chem") to its four edge slabs:

      xs: [T, *lead, nz, ny, W]   west   (x = 0..W-1)
      xe: [T, *lead, nz, ny, W]   east   (x = nx-W..nx-1)
      ys: [T, *lead, nz, W, nx]   south
      ye: [T, *lead, nz, W, nx]   north

    with ``*lead`` the variable's leading axes (moist: n_moist; chem: G)."""

    times: jax.Array                  # [T] seconds since run start
    slabs: dict

    @property
    def width(self) -> int:
        return next(iter(self.slabs.values()))["xs"].shape[-1]


def slabs_from_state(dyn: DycoreState, width: int, chem: bool = True):
    """Edge slabs of one state (the writer-side helper)."""
    def four(f):
        return {"xs": f[..., :, :width], "xe": f[..., :, -width:],
                "ys": f[..., :width, :], "ye": f[..., -width:, :]}

    out = {"u": four(dyn.u), "v": four(dyn.v), "theta_p": four(dyn.theta_p),
           "moist": four(dyn.moist)}
    # the reference's wrfbdy also forces MU and PH (U_B/V_B/T_B/MU_B/PH_B/
    # QVAPOR_B, share/wrf_bdyin.F): without a mass-field boundary target,
    # gravity/acoustic energy reflects at the open boundary and the mu
    # field grows without bound (observed e-folding ~2 steps at the CARES
    # shape before this was added)
    if dyn.mu is not None:
        out["mu"] = four(dyn.mu)
    if dyn.ph is not None:
        out["ph"] = four(dyn.ph)
    if chem and dyn.chem is not None:
        out["chem"] = four(dyn.chem)
    return out


def make_bdy(times, states, width: int = 5, chem: bool = True) -> BdyData:
    """Build a BdyData from a sequence of full states at ``times``."""
    slabs_t = [slabs_from_state(s, width, chem) for s in states]
    names = slabs_t[0].keys()
    slabs = {n: {e: jnp.stack([st[n][e] for st in slabs_t])
                 for e in ("xs", "xe", "ys", "ye")} for n in names}
    return BdyData(times=jnp.asarray(times, jnp.float32), slabs=slabs)


def zone_weights(grid: Grid, cfg: Config, dt: float):
    """[ny, nx] per-step blend weight toward the boundary value:
    1 in the spec zone; Davies relaxation weights decaying linearly x
    exponentially across the relax zone (the shape of module_bc.F's
    fcx/gcx with spec_exp), scaled so the spec-zone e-folding is one step
    and the innermost relax point ~50 steps."""
    ns, nr = cfg.boundary.spec_zone, cfg.boundary.relax_zone
    W = ns + nr
    ny, nx = grid.ny, grid.nx
    ii = np.arange(nx)
    jj = np.arange(ny)
    dist = np.minimum.outer(np.minimum(jj, ny - 1 - jj),
                            np.minimum(ii, nx - 1 - ii))   # [ny, nx] 0-based
    n = dist + 1                                           # 1-based like WRF
    in_spec = n <= ns
    in_relax = (n > ns) & (n <= W)
    frac = np.clip((W - n) / max(nr, 1), 0.0, 1.0)         # 1 at inner spec edge
    w_relax = 0.2 * frac * np.exp(-(n - ns - 1) / 2.0)
    w = np.where(in_spec, 1.0, np.where(in_relax, w_relax, 0.0))
    return jnp.asarray(w, jnp.float32)


def _interp_slabs(bdy: BdyData, name: str, t):
    sl = bdy.slabs[name]
    times = bdy.times
    T = times.shape[0]
    i1 = jnp.clip(jnp.searchsorted(times, t, side="right"), 1, T - 1)
    i0 = i1 - 1
    f = jnp.clip((t - times[i0]) / jnp.maximum(times[i1] - times[i0], 1e-6),
                 0.0, 1.0)
    return {e: (1.0 - f) * sl[e][i0] + f * sl[e][i1]
            for e in ("xs", "xe", "ys", "ye")}


def _target_field(field, edges, width: int):
    """Paint the four (time-interpolated) edge slabs onto a copy of the
    field; corners take the later (y) paint — weights there are identical.

    Realized as pad + iota-mask blends rather than ``.at[slice].set``:
    edge-strip dynamic-update-slices on ('y','x')-sharded fields made GSPMD
    all-gather the whole variable (a 17.7 MB/step gather of the chem array
    at the CARES shape, MULTICHIP_r05); pads and elementwise selects
    partition cleanly."""
    ny, nx = field.shape[-2], field.shape[-1]
    ii = jnp.arange(nx)
    jj = jnp.arange(ny)[:, None]
    nd = field.ndim

    def padx(sl, left):
        w = [(0, 0)] * (nd - 1) + [(nx - width, 0) if left
                                   else (0, nx - width)]
        return jnp.pad(sl, w)

    def pady(sl, low):
        w = [(0, 0)] * (nd - 2) + [(ny - width, 0) if low
                                   else (0, ny - width), (0, 0)]
        return jnp.pad(sl, w)

    tgt = jnp.where(ii < width, padx(edges["xs"], False), field)
    tgt = jnp.where(ii >= nx - width, padx(edges["xe"], True), tgt)
    tgt = jnp.where(jj < width, pady(edges["ys"], False), tgt)
    tgt = jnp.where(jj >= ny - width, pady(edges["ye"], True), tgt)
    return tgt


def apply_specified_relax(dyn: DycoreState, bdy: BdyData, t, grid: Grid,
                          cfg: Config) -> DycoreState:
    """One post-step specified+relax application to u/v/theta_p/moist/chem
    (NUM_CONC excluded per ``solve_em.F:2667``)."""
    w2 = zone_weights(grid, cfg, cfg.dynamics.dt)           # [ny, nx]
    width = bdy.width

    def blend(field, name):
        edges = _interp_slabs(bdy, name, t)
        tgt = _target_field(field, edges, width)
        return field + w2 * (tgt - field)

    upd = {"u": blend(dyn.u, "u"), "v": blend(dyn.v, "v"),
           "theta_p": blend(dyn.theta_p, "theta_p"),
           "moist": blend(dyn.moist, "moist")}
    if "mu" in bdy.slabs and dyn.mu is not None:
        upd["mu"] = blend(dyn.mu, "mu")
    if "ph" in bdy.slabs and dyn.ph is not None:
        upd["ph"] = blend(dyn.ph, "ph")
    if "chem" in bdy.slabs and dyn.chem is not None:
        upd["chem"] = blend(dyn.chem, "chem")
    return dataclasses.replace(dyn, **upd)
