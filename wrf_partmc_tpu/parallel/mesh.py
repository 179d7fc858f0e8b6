"""Device mesh + sharding policy.

TPU-native replacement for RSL_LITE's 2-D process decomposition
(``external/RSL_LITE/module_dm.F:124-951``: MPASPECT px*py factorization +
patch_domain_rsl_lite patch dims).  Here the same policy is one
``jax.sharding.Mesh`` over axes ``('y', 'x')`` plus NamedShardings; XLA GSPMD
inserts the halo collectives that gen_comms.c-generated HALO_*.inc code did
by hand.

Layout contract (see grid.py): fields are [nz, ny, nx] -> P(None, 'y', 'x');
per-cell particle tensors are [nz, ny, nx, P, ...] -> P(None, 'y', 'x', ...).
The vertical is never decomposed, matching the reference (columns are the
implicit-solve unit, SURVEY 5.7).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_2d(n: int) -> tuple[int, int]:
    """Split n devices into the most-square (py, px) factorization — the
    MPASPECT policy (``module_dm.F:124-159``)."""
    best = (1, n)
    for py in range(1, int(math.isqrt(n)) + 1):
        if n % py == 0:
            best = (py, n // py)
    return best


def make_mesh(devices=None, shape: tuple[int, int] | None = None) -> Mesh:
    """2-D ('y', 'x') device mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = factor_2d(n)
    py, px = shape
    if py * px != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(py, px)
    return Mesh(dev_array, axis_names=("y", "x"))


def field_spec(extra_dims: int = 0) -> P:
    """PartitionSpec for a [nz, ny, nx, ...] array (extra_dims trailing)."""
    return P(None, "y", "x", *([None] * extra_dims))


def field_sharding(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    return NamedSharding(mesh, field_spec(extra_dims))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_field(x, mesh: Mesh):
    """Place a [nz, ny, nx, ...] array onto the mesh."""
    return jax.device_put(x, field_sharding(mesh, extra_dims=x.ndim - 3))
