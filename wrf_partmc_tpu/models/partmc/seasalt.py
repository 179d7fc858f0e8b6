"""Sea-salt surface emissions.

Equivalent of the reference's wind-speed-driven sea-salt source
(``seasalt_emissions``, ``wrf_pmc_driver.F90:212-223`` with implementations
at ``:1767-1997``): Gong (2003, Global Biogeochem. Cycles 17:1097)
whitecap source function (partmc_seasalt_param=1) and the Ovadnevaite et
al. (2014) flux variant (=2, here approximated by the Gong shape with the
O14 wind-speed scaling).

The continuous dF/dr spectrum is discretized onto a fixed log radius grid;
each chem step, edge... surface water cells receive a fixed-slot sample with
multiplicities matching the integrated number flux (same static-shape
strategy as emissions elsewhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .aero_data import AeroData, diam_to_vol


def gong03_dFdr(r_um, u10):
    """Number flux spectrum dF/dr [# m-2 s-1 um-1] at 80% RH radius r [um].

    Gong (2003) eq. 2 (extension of Monahan et al. 1986 to r < 0.2 um),
    Theta = 30.
    """
    r = jnp.asarray(r_um)
    theta = 30.0
    A = 4.7 * (1.0 + theta * r) ** (-0.017 * r ** -1.44)
    B = (0.433 - jnp.log10(r)) / 0.433
    dFdr = (1.373 * u10 ** 3.41 * r ** (-A)
            * (1.0 + 0.057 * r ** 3.45)
            * 10.0 ** (1.607 * jnp.exp(-(B ** 2))))
    return dFdr


def seasalt_number_fluxes(u10, n_bins: int = 8, r_min=0.05, r_max=5.0,
                          param: int = 1):
    """Integrated number flux per log-radius bin.

    Returns (r_centers_um [B], flux [..., B] [# m-2 s-1]).  u10 may carry
    cell dims.  Dry radii are taken as r80/2 (standard 80%-RH to dry
    conversion factor ~2).
    """
    edges = np.logspace(np.log10(r_min), np.log10(r_max), n_bins + 1)
    centers = np.sqrt(edges[:-1] * edges[1:])
    widths = np.diff(edges)
    u = jnp.asarray(u10)[..., None]
    flux = gong03_dFdr(jnp.asarray(centers, jnp.float32), u) * jnp.asarray(
        widths, jnp.float32)
    if param == 2:   # Ovadnevaite-style stronger wind dependence at high u10
        flux = flux * jnp.clip((u / 9.0) ** 0.5, 0.3, 3.0)
    return jnp.asarray(centers, jnp.float32), flux


def sample_seasalt(key, aero_data: AeroData, u10, area, dt, n_slots: int,
                   cell_shape=(), param: int = 1, source: int = 0,
                   w_class: int = 0, w_class_spume: int | None = None,
                   r80_split_um: float = 10.0):
    """Fixed-slot sea-salt particle sample for the surface-layer cells.

    area: surface area per cell [m2]; returns (vol [..., S, E], num [..., E],
    source, w_class) for add_particles.  Composition: pure Na+Cl at sea-salt
    density; dry diameter = 2 * (r80/2).

    The reference dedicates two hardcoded weight classes to sea salt
    (``wrf_pmc_init.F90:1291-1431``); when ``w_class_spume`` is given,
    droplets with r80 above ``r80_split_um`` (spume drops, Monahan split)
    get that class, the rest ``w_class`` (film/jet).
    """
    centers_um, flux = seasalt_number_fluxes(u10, param=param)   # [..., B]
    B = centers_um.shape[0]
    E = n_slots
    total = jnp.sum(flux, axis=-1) * jnp.asarray(area) * dt       # [...] number
    logits = jnp.log(jnp.maximum(flux, 1e-30))
    logits = jnp.broadcast_to(logits[..., None, :], (*cell_shape, E, B))
    b_idx = jax.random.categorical(key, logits, axis=-1)          # [..., E]
    r80_um = jnp.asarray(centers_um)[b_idx]
    d_dry = (r80_um / 2.0) * 2.0 * 1e-6                           # [m]
    pvol = diam_to_vol(d_dry)
    i_na = aero_data.spec_by_name("Na")
    i_cl = aero_data.spec_by_name("Cl")
    vol = jnp.zeros((*cell_shape, E, aero_data.n_spec), jnp.float32)
    vol = vol.at[..., i_na].set(0.4 * pvol)
    vol = vol.at[..., i_cl].set(0.6 * pvol)
    vol = jnp.swapaxes(vol, -1, -2)                                # [..., S, E]
    num = jnp.broadcast_to((total / E)[..., None], (*cell_shape, E)).astype(jnp.float32)
    src = jnp.full((*cell_shape, E), source, jnp.int32)
    if w_class_spume is None:
        wcl = jnp.full((*cell_shape, E), w_class, jnp.int32)
    else:
        wcl = jnp.where(r80_um >= r80_split_um, w_class_spume, w_class
                        ).astype(jnp.int32)
    return vol, num, src, wcl
