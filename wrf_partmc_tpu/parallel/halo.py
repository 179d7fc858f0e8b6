"""Explicit halo exchange for shard_map-ed kernels.

TPU-native replacement for RSL_LITE's pack/exchange/unpack halo engine
(``external/RSL_LITE/c_code.c``, ``f_pack.F90``; generated ``HALO_EM_*.inc``
included ~50x in ``solve_em.F``).  Most solver code in this package does NOT
call this: it is written as global-array stencils under ``jit`` + NamedSharding
and XLA GSPMD inserts the halo collectives automatically.  This module exists
for the manually-scheduled paths (shard_map particle-migration buffers, future
Pallas kernels with overlapped ICI RDMA).

All functions here must be called *inside* ``jax.shard_map`` with the mesh
axis names bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _axis_size(axis_name: str) -> int:
    return lax.psum(1, axis_name)


def _clamp_face(x, h: int, axis: int, lo: bool):
    """Replicated edge slice used to fill halos at open (non-periodic) global
    boundaries — the analogue of WRF's boundary extrapolation fills."""
    n = x.shape[axis]
    sl = lax.slice_in_dim(x, 0, 1, axis=axis) if lo else lax.slice_in_dim(x, n - 1, n, axis=axis)
    reps = [1] * x.ndim
    reps[axis] = h
    return jnp.tile(sl, reps)


def exchange_axis(x, h: int, axis: int, axis_name: str, periodic: bool = True):
    """Pad local block ``x`` with ``h`` halo points on both sides of ``axis``,
    filled from the neighbouring shards along mesh axis ``axis_name`` via
    ``lax.ppermute`` (ICI collective-permute).

    Non-periodic global edges are clamp-filled (edge replication).
    Returns an array whose ``axis`` extent is ``x.shape[axis] + 2*h``.
    """
    n = _axis_size(axis_name)
    size = x.shape[axis]
    if h > size:
        raise ValueError(f"halo width {h} > local extent {size}")
    hi_face = lax.slice_in_dim(x, size - h, size, axis=axis)   # my east/top edge
    lo_face = lax.slice_in_dim(x, 0, h, axis=axis)             # my west/bottom edge

    if periodic:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [((i + 1) % n, i) for i in range(n)]
    else:
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]

    lo_halo = lax.ppermute(hi_face, axis_name, fwd)   # from my -1 neighbour
    hi_halo = lax.ppermute(lo_face, axis_name, bwd)   # from my +1 neighbour

    if not periodic:
        idx = lax.axis_index(axis_name)
        lo_halo = jnp.where(idx == 0, _clamp_face(x, h, axis, lo=True), lo_halo)
        hi_halo = jnp.where(idx == n - 1, _clamp_face(x, h, axis, lo=False), hi_halo)

    return jnp.concatenate([lo_halo, x, hi_halo], axis=axis)


def exchange_2d(x, h: int, periodic=(True, True), axes=(-2, -1), axis_names=("y", "x")):
    """Halo-pad the (y, x) axes of a local block (order: y then x, so corner
    halos are correct — same effect as WRF's two-pass corner handling)."""
    x = exchange_axis(x, h, axes[0] % x.ndim, axis_names[0], periodic[0])
    x = exchange_axis(x, h, axes[1] % x.ndim, axis_names[1], periodic[1])
    return x


def neighbor_shift(x, shift: int, axis_name: str, periodic: bool = True):
    """Whole-block ppermute by ``shift`` shards along ``axis_name`` (used to
    route particle-migration face buffers, replacing the MPI_isend/irecv of
    packed aero_states in ``wrf_pmc_trans_aero.F90:545-675``)."""
    n = _axis_size(axis_name)
    if periodic:
        perm = [(i, (i + shift) % n) for i in range(n)]
    else:
        perm = [(i, i + shift) for i in range(n) if 0 <= i + shift < n]
    return lax.ppermute(x, axis_name, perm)
