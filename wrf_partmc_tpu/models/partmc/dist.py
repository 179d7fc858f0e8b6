"""Multi-mode aerosol size distributions and particle sampling.

Equivalent of PartMC's ``aero_dist``/``aero_mode`` modules
(``AERO_MODE_TYPE_LOG_NORMAL`` construction at ``wrf_pmc_init.F90:766``;
``aero_state_add_aero_dist_sample`` Poisson sampling used for ICs
``wrf_pmc_init.F90:1047`` and emissions ``wrf_pmc_driver.F90:1920-1922``).

TPU redesign: a dist is a stacked [M]-mode struct; sampling draws a *fixed*
number E of computational particles per cell and splits the represented
physical number across them (equal multiplicities), rather than drawing a
Poisson-random particle count — statistically equivalent in all population
moments, and shape-static.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .aero_data import AeroData, diam_to_vol


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AeroDist:
    """[M] stacked log-normal modes.

    num_conc: [..., M] number conc per mode [# m-3] (leading cell batch dims
    allowed, e.g. per-level IC profiles); geom_mean_diam: [..., M] [m];
    log_geom_std: [..., M] (natural log of sigma_g); vol_frac: [..., M, S];
    source/w_class: [M] int32.
    """

    num_conc: jax.Array
    geom_mean_diam: jax.Array
    log_geom_std: jax.Array
    vol_frac: jax.Array
    source: jax.Array
    w_class: jax.Array

    @property
    def n_mode(self) -> int:
        return self.num_conc.shape[-1]


def make_mode(num_conc, gmd, gsd, vol_frac, source=0, w_class=0) -> AeroDist:
    """Single log-normal mode (gsd = geometric std dev, not its log)."""
    a = lambda v: jnp.asarray(v, jnp.float32)
    return AeroDist(num_conc=a([num_conc]), geom_mean_diam=a([gmd]),
                    log_geom_std=jnp.log(a([gsd])),
                    vol_frac=a([vol_frac]) / jnp.sum(a([vol_frac])),
                    source=jnp.asarray([source], jnp.int32),
                    w_class=jnp.asarray([w_class], jnp.int32))


def from_sampled(diam_edges, num_conc, vol_frac, source=0, w_class=0) -> AeroDist:
    """AERO_MODE_TYPE_SAMPLED (``wrf_pmc_driver.F90:1855``): a binned
    (histogram) size distribution.

    TPU realization: each bin becomes one narrow "mode" — log-uniform within
    the bin is represented by a log-normal with the same mean and variance in
    ln D (sigma_ln = bin_width / sqrt(12)), so the stacked-mode sampling and
    analytic-density machinery apply unchanged.

    diam_edges: [B+1] bin edges [m]; num_conc: [B] number conc per bin
    [# m-3]; vol_frac: [S] or [B, S].
    """
    e = jnp.asarray(diam_edges, jnp.float32)
    nc = jnp.asarray(num_conc, jnp.float32)
    B = nc.shape[-1]
    gmd = jnp.sqrt(e[:-1] * e[1:])
    sig = jnp.log(e[1:] / e[:-1]) / jnp.sqrt(12.0)
    vf = jnp.asarray(vol_frac, jnp.float32)
    if vf.ndim == 1:
        vf = jnp.broadcast_to(vf, (B, vf.shape[0]))
    vf = vf / jnp.maximum(jnp.sum(vf, axis=-1, keepdims=True), 1e-30)
    mk = lambda v, d: jnp.full((B,), v, d)
    return AeroDist(num_conc=nc, geom_mean_diam=gmd,
                    log_geom_std=jnp.maximum(sig, 1e-3), vol_frac=vf,
                    source=mk(source, jnp.int32), w_class=mk(w_class, jnp.int32))


def concat_dists(dists) -> AeroDist:
    cat = lambda f: jnp.concatenate([getattr(d, f) for d in dists], axis=-1)
    return AeroDist(num_conc=cat("num_conc"), geom_mean_diam=cat("geom_mean_diam"),
                    log_geom_std=cat("log_geom_std"),
                    vol_frac=jnp.concatenate([d.vol_frac for d in dists], axis=-2),
                    source=cat("source"), w_class=cat("w_class"))


def dist_number_conc(dist: AeroDist) -> jax.Array:
    return jnp.sum(dist.num_conc, axis=-1)


def dist_num_density(dist: AeroDist, diam) -> jax.Array:
    """dN/dlnD [# m-3] at diameters diam[...]: analytic log-normal sum
    (ground truth for sampling tests)."""
    ln_d = jnp.log(diam)[..., None]
    mu = jnp.log(dist.geom_mean_diam)
    sig = dist.log_geom_std
    pdf = jnp.exp(-0.5 * ((ln_d - mu) / sig) ** 2) / (sig * jnp.sqrt(2 * jnp.pi))
    return jnp.sum(dist.num_conc * pdf, axis=-1)


def sample_particles(key, dist: AeroDist, aero_data: AeroData, n_sample: int,
                     volume, cell_shape=()):
    """Draw ``n_sample`` computational particles per cell representing the full
    dist in physical volume ``volume`` [m3] (broadcastable over cell_shape).

    Returns (vol [*cell, S, E], num [*cell, E], source [*cell, E],
    w_class [*cell, E]).  Total represented number == sum(num_conc) * volume
    exactly (deterministic multiplicities; composition/mode/size stochastic).
    """
    E = n_sample
    k_mode, k_diam = jax.random.split(key)
    logits = jnp.log(jnp.maximum(dist.num_conc, 1e-300))
    # broadcast mode params over cells
    b = lambda a: jnp.broadcast_to(a, (*cell_shape, *a.shape[-1:]))
    logits_bc = jnp.broadcast_to(logits[..., None, :],
                                 (*cell_shape, E, dist.n_mode))
    m_idx = jax.random.categorical(k_mode, logits_bc, axis=-1)
    take = lambda a: jnp.take_along_axis(b(a), m_idx, axis=-1)
    gmd = take(dist.geom_mean_diam)
    sig = take(dist.log_geom_std)
    z = jax.random.normal(k_diam, (*cell_shape, E))
    diam = gmd * jnp.exp(sig * z)
    pvol = diam_to_vol(diam)                                     # [..., E]
    vf = jnp.broadcast_to(dist.vol_frac, (*cell_shape, dist.n_mode, aero_data.n_spec))
    vfrac = jnp.take_along_axis(vf, m_idx[..., None], axis=-2)    # [..., E, S]
    vol = jnp.swapaxes(vfrac * pvol[..., None], -1, -2)           # [..., S, E]
    total = dist_number_conc(dist) * jnp.asarray(volume)          # [...] or scalar
    num = jnp.broadcast_to(jnp.asarray(total / E, jnp.float32)[..., None],
                           (*cell_shape, E))
    source = jnp.take_along_axis(jnp.broadcast_to(
        dist.source, (*cell_shape, dist.n_mode)), m_idx, axis=-1)
    w_class = jnp.take_along_axis(jnp.broadcast_to(
        dist.w_class, (*cell_shape, dist.n_mode)), m_idx, axis=-1)
    return vol, num, source, w_class
