"""Batched tridiagonal (Thomas) column solver.

The vertically-implicit acoustic w-solve (``advance_w``,
``dyn_em/module_small_step_em.F``) and the implicit vertical-diffusion
probability build (``wrf_pmc_trans.F90:472-493``) are both column
tridiagonal systems.  Layout: the z axis leads, carrying [ny, nx] planes
through a ``lax.scan`` — every column in the domain is solved in lockstep on
the VPU (the TPU replacement for WRF's per-column Fortran loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def solve(dl, d, du, b):
    """Solve tridiagonal systems A x = b for each trailing-batch column.

    dl, d, du, b: [n, ...] — sub-, main-, super-diagonal and RHS; dl[0] and
    du[n-1] are ignored.  Diagonals may carry broadcastable batch dims (e.g.
    [n, 1, 1] coefficients against an [n, ny, nx] RHS).  Returns x: [n, ...].

    On TPU this dispatches to the VMEM-resident Pallas kernel
    (``ops/pallas_tridiag.py``) — one HBM pass instead of 2n scanned plane
    round-trips; elsewhere (CPU tests, non-TPU backends) it runs the
    reference ``lax.scan`` Thomas recurrence below.
    """
    if jax.default_backend() == "tpu":
        from .pallas_tridiag import solve_pallas

        return solve_pallas(dl, d, du, b)
    return solve_scan(dl, d, du, b)


def solve_scan(dl, d, du, b):
    """Pure-XLA Thomas recurrence (reference path; any backend)."""
    shape = jnp.broadcast_shapes(dl.shape, d.shape, du.shape, b.shape)
    dl, d, du, b = (jnp.broadcast_to(a, shape) for a in (dl, d, du, b))
    n = d.shape[0]

    def fwd(carry, t):
        cp_prev, dp_prev = carry
        a, bb, c, r = t
        denom = bb - a * cp_prev
        cp = c / denom
        dp = (r - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    (_, _), (cps, dps) = lax.scan(fwd, (zeros, zeros), (dl, d, du, b))

    def bwd(x_next, t):
        cp, dp = t
        x = dp - cp * x_next
        return x, x

    _, xs = lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return xs
