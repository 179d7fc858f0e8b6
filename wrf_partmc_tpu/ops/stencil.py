"""Neighbor-access primitives for finite-volume stencils.

These are the building blocks every advection/diffusion operator uses instead
of Fortran index arithmetic (``i-2:i+3`` loops in ``dyn_em/module_advect_em.F``).
They operate on *global* [..., nz, ny, nx] arrays; under jit+NamedSharding,
XLA GSPMD turns the rolls/slices into halo collective-permutes on the device
mesh (replacing generated HALO_*.inc exchanges).

Convention: ``shift(a, s, axis)[..., i] == a[..., i + s]`` (value of the
neighbor ``s`` cells in the +direction).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

AXIS_Z, AXIS_Y, AXIS_X = -3, -2, -1


def shift(a, s: int, axis: int, bc: str = "periodic"):
    """Neighbor fetch: result[i] = a[i+s].  bc: 'periodic' | 'clamp'."""
    if s == 0:
        return a
    if bc == "periodic":
        return jnp.roll(a, -s, axis=axis)
    if bc == "clamp":
        n = a.shape[axis]
        if s > 0:
            body = lax.slice_in_dim(a, s, n, axis=axis)
            edge = lax.slice_in_dim(a, n - 1, n, axis=axis)
            reps = [1] * a.ndim
            reps[axis] = s
            return jnp.concatenate([body, jnp.tile(edge, reps)], axis=axis)
        else:
            body = lax.slice_in_dim(a, 0, n + s, axis=axis)
            edge = lax.slice_in_dim(a, 0, 1, axis=axis)
            reps = [1] * a.ndim
            reps[axis] = -s
            return jnp.concatenate([jnp.tile(edge, reps), body], axis=axis)
    raise ValueError(f"unknown bc {bc!r}")


def make_taps(a, lo: int, hi: int, axis: int, bc: str = "periodic"):
    """Return ``tap(s)`` giving a[..., i+s] for s in [lo, hi], backed by ONE
    halo-extended buffer.

    Performance: ``shift`` lowers each tap to its own roll (a concatenate
    that materializes a full copy of ``a`` in HBM — ~50 such copies per step
    across the stencil operators dominated round-1's advection cost).  Here
    the extension is materialized once and every tap is a *slice* of it,
    which XLA fuses into the consuming arithmetic as an offset read."""
    if lo == 0 and hi == 0:
        return lambda s: a
    n = a.shape[axis]
    parts = []
    if lo < 0:
        if bc == "periodic":
            parts.append(lax.slice_in_dim(a, n + lo, n, axis=axis))
        else:
            edge = lax.slice_in_dim(a, 0, 1, axis=axis)
            reps = [1] * a.ndim
            reps[axis] = -lo
            parts.append(jnp.tile(edge, reps))
    parts.append(a)
    if hi > 0:
        if bc == "periodic":
            parts.append(lax.slice_in_dim(a, 0, hi, axis=axis))
        else:
            edge = lax.slice_in_dim(a, n - 1, n, axis=axis)
            reps = [1] * a.ndim
            reps[axis] = hi
            parts.append(jnp.tile(edge, reps))
    ext = jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]

    def tap(s: int):
        if s < lo or s > hi:
            raise ValueError(f"tap {s} outside [{lo}, {hi}]")
        return lax.slice_in_dim(ext, s - lo, s - lo + n, axis=axis)

    return tap


def diff_at_faces(a, axis: int, bc: str = "periodic"):
    """face-centered difference: d[i] = a[i] - a[i-1] (at owner-face i)."""
    return a - shift(a, -1, axis, bc)


def avg_to_faces(a, axis: int, bc: str = "periodic"):
    """2-pt average onto owner faces: f[i] = (a[i] + a[i-1]) / 2."""
    return 0.5 * (a + shift(a, -1, axis, bc))
