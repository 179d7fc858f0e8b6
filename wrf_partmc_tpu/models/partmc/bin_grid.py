"""Logarithmic diameter bin grid for diagnostics.

Equivalent of PartMC's ``bin_grid`` module
(``bin_grid_make(BIN_GRID_TYPE_LOG, 100, 1d-9, 1d-3)`` at
``wrf_pmc_driver.F90:783``; histograms at ``:851-857``).

Binning is implemented as a one-hot [P, B] matmul-style reduction so the
histogram of a whole cell batch is a single contraction (MXU-friendly),
instead of the reference's per-particle scalar loop.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BinGrid:
    edges: jax.Array     # [B+1] diameters [m], log-spaced
    centers: jax.Array   # [B]
    n_bin: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def log_width(self) -> jax.Array:
        """d(ln D) per bin (constant for log grids)."""
        return jnp.log(self.edges[1] / self.edges[0])


def make_bin_grid(n_bin: int, d_min: float, d_max: float) -> BinGrid:
    edges = jnp.logspace(jnp.log10(d_min), jnp.log10(d_max), n_bin + 1)
    centers = jnp.sqrt(edges[:-1] * edges[1:])
    return BinGrid(edges=edges.astype(jnp.float32),
                   centers=centers.astype(jnp.float32), n_bin=n_bin)


def bin_index(bg: BinGrid, diam):
    """Bin index of each diameter (log-uniform grid -> closed form, no
    searchsorted).  Out-of-range values are clamped to the end bins."""
    i = jnp.floor(jnp.log(diam / bg.edges[0]) / bg.log_width).astype(jnp.int32)
    return jnp.clip(i, 0, bg.n_bin - 1)


def histogram(bg: BinGrid, diam, weight):
    """Weighted histogram over the particle axis.

    diam, weight: [..., P] -> [..., B].  Equivalent of
    ``bin_grid_histogram_1d`` (``wrf_pmc_driver.F90:851``); result is a
    density per unit ln(D) when divided by log_width (done by callers).
    """
    idx = bin_index(bg, diam)                       # [..., P]
    onehot = jax.nn.one_hot(idx, bg.n_bin, dtype=weight.dtype)  # [..., P, B]
    return jnp.einsum("...p,...pb->...b", weight, onehot)
