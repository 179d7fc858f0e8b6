"""Single-column large-scale forcing.

Equivalent of ``dyn_em/module_force_scm.F`` (Ghan et al. 1999 upstream
relaxation; drives the em_scm_xy GABLS-II coupling test,
``test/em_scm_xy/README.scm:18-21``): relax u, v, theta (and optionally qv)
toward prescribed profiles with a relaxation timescale, plus optional
subsidence (vertical advection by a prescribed w_ls).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...grid import Grid
from ..dycore.state import DycoreState


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ScmForcing:
    u_target: jax.Array       # [nz]
    v_target: jax.Array       # [nz]
    theta_target: jax.Array   # [nz] perturbation theta
    qv_target: jax.Array      # [nz]
    tau: float = dataclasses.field(metadata=dict(static=True), default=3600.0)
    w_subsidence: float = dataclasses.field(metadata=dict(static=True), default=0.0)


def make_scm_forcing(grid: Grid, u=5.0, v=0.0, theta_p=0.0, qv=0.0,
                     tau=3600.0, w_subsidence=0.0) -> ScmForcing:
    prof = lambda v0: jnp.full((grid.nz,), v0, jnp.float32)
    return ScmForcing(u_target=prof(u), v_target=prof(v),
                      theta_target=prof(theta_p), qv_target=prof(qv),
                      tau=tau, w_subsidence=w_subsidence)


def apply_scm_forcing(dyn: DycoreState, f: ScmForcing, grid: Grid,
                      dt) -> DycoreState:
    """Relaxation (+ subsidence on theta) applied after the dynamics step."""
    w = 1.0 - jnp.exp(-dt / f.tau)
    col = lambda a: a.reshape(-1, 1, 1)
    u = dyn.u + w * (col(f.u_target) - dyn.u)
    v = dyn.v + w * (col(f.v_target) - dyn.v)
    th = dyn.theta_p + w * (col(f.theta_target) - dyn.theta_p)
    if f.w_subsidence != 0.0:
        dthdz = jnp.gradient(th, axis=0) / grid.dz.reshape(-1, 1, 1)
        th = th - dt * f.w_subsidence * dthdz
    qv = dyn.moist[0] + w * (col(f.qv_target) - dyn.moist[0])
    moist = dyn.moist.at[0].set(qv)
    return dataclasses.replace(dyn, u=u, v=v, theta_p=th, moist=moist)
