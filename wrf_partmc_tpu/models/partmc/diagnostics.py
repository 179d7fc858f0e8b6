"""Gridded aerosol diagnostics.

Equivalent of the reference's ``partmc_process`` diagnostic suite
(``wrf_pmc_driver.F90:671-1290``; output fields registered in
``Registry/registry.partmc_process``): binned number/mass distributions
(``:851-857``), per-species bulk masses (``:865-936``), mixing-state metrics
chi / D_alpha / D_gamma (``:941-1041``), CCN activation spectra
(``:1043-1100``), PM1/PM2.5/PM10 (``:1152-1157``).

All metrics are closed-form reductions over the particle axis — one fused
pass per cell batch on the VPU, no per-particle loops.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .aero_data import AeroData, particle_mass, vol_to_diam, particle_volume
from .aero_state import AeroState
from .bin_grid import BinGrid, bin_index, histogram
from .condense import ccn_conc, equilib_water
from .env_state import EnvState


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AeroDiagnostics:
    num_dist: jax.Array      # [..., B] dN/dlnD [# m-3]
    mass_dist: jax.Array     # [..., B] dM/dlnD [kg m-3]
    spec_mass: jax.Array     # [..., S] bulk mass conc per species [kg m-3]
    num_conc: jax.Array      # [...] total number conc [# m-3]
    chi: jax.Array           # [...] mixing-state index [0-1]
    d_alpha: jax.Array       # [...] avg particle species diversity
    d_gamma: jax.Array       # [...] bulk species diversity
    chi_sub: jax.Array       # [...] chi of the submicron (D_dry <= 1 um) cut
    ccn: jax.Array           # [..., K] CCN conc at the supersat levels
    pm1: jax.Array           # [...] [kg m-3]
    pm25: jax.Array
    pm10: jax.Array
    # advanced (do_advanced_process) optical/counterfactual diagnostics:
    # bulk scattering/absorption [m-1] for the actual (externally mixed)
    # population and for the composition-averaged internally-mixed
    # counterfactual (bin_average_comp + condense_equilib_particles +
    # optics, ``wrf_pmc_driver.F90:1180-1252``); CCN spectrum of the same
    # counterfactual (``:1043-1100``).
    b_scat: jax.Array        # [...]
    b_abs: jax.Array         # [...]
    b_scat_mix: jax.Array    # [...]
    b_abs_mix: jax.Array     # [...]
    ccn_mix: jax.Array       # [..., K]


def mixing_state_metrics(state: AeroState, aero_data: AeroData,
                         group_masks=None, particle_mask=None):
    """chi, D_alpha, D_gamma after Riemer & West (2013, ACP 13:11423) —
    reference implementation at ``wrf_pmc_driver.F90:941-1041``.

    Uses dry per-species masses.  ``group_masks`` ([G, S] 0/1) optionally
    aggregates species into surrogate groups before computing diversities
    (the reference's "grouped" variants); default is per-species.
    ``particle_mask`` ([..., P] 0/1) optionally restricts the population —
    the reference's size-cut variants (submicron chi, ``:941-1041``).
    """
    rho = aero_data.density[..., :, None]
    dry = aero_data.dry_mask[..., :, None]
    mass_sp = state.vol * rho * dry                          # [..., S, P]
    if group_masks is not None:
        mass_sp = jnp.einsum("gs,...sp->...gp", jnp.asarray(group_masks, mass_sp.dtype),
                             mass_sp)
    if particle_mask is not None:
        state = dataclasses.replace(
            state, num=state.num * jnp.asarray(particle_mask, state.num.dtype))
    w = state.num[..., None, :]                              # [..., 1, P]
    mass_a = jnp.sum(mass_sp, axis=-2)                       # [..., P] per-particle
    mu_tot = jnp.sum(mass_a * state.num, axis=-1)            # [...] total mass
    p_i = mass_a * state.num / jnp.maximum(mu_tot[..., None], 1e-300)
    # per-particle mass fractions p_ia and Shannon diversities
    p_ia = mass_sp / jnp.maximum(mass_a[..., None, :], 1e-300)
    H_i = -jnp.sum(jnp.where(p_ia > 0, p_ia * jnp.log(p_ia), 0.0), axis=-2)
    H_alpha = jnp.sum(p_i * H_i, axis=-1)
    d_alpha = jnp.exp(H_alpha)
    # bulk fractions
    P_a = jnp.sum(mass_sp * w, axis=-1) / jnp.maximum(mu_tot[..., None], 1e-300)
    H_gamma = -jnp.sum(jnp.where(P_a > 0, P_a * jnp.log(P_a), 0.0), axis=-1)
    d_gamma = jnp.exp(H_gamma)
    chi = (d_alpha - 1.0) / jnp.maximum(d_gamma - 1.0, 1e-10)
    chi = jnp.clip(jnp.where(d_gamma > 1.0 + 1e-6, chi, 1.0), 0.0, 1.0)
    return chi, d_alpha, d_gamma


def pm_mass(state: AeroState, aero_data: AeroData, cutoff_diam, cell_volume):
    d = state.dry_diameter(aero_data)
    m = particle_mass(state.vol, aero_data, dry=True)
    sel = (d <= cutoff_diam) & state.alive
    return jnp.sum(jnp.where(sel, m * state.num, 0.0), axis=-1) / cell_volume


def bin_average_comp(state: AeroState, aero_data: AeroData,
                     bg: BinGrid) -> AeroState:
    """Composition-averaging counterfactual (``aero_state_bin_average_comp``):
    every particle's dry composition is replaced by its size bin's
    volume-weighted mean composition, preserving each particle's total dry
    volume (and therefore the size distribution exactly).  Water is zeroed;
    re-equilibrate with :func:`~.condense.equilib_water` before using the
    result for optics/CCN.  This is the "what if the population were
    internally mixed" reference state of the chi / optics / CCN comparisons
    (``wrf_pmc_driver.F90:1043-1100, :1180-1252``)."""
    d = state.dry_diameter(aero_data)
    idx = bin_index(bg, d)
    onehot = jax.nn.one_hot(idx, bg.n_bin, dtype=state.vol.dtype)   # [..., P, B]
    w = jnp.where(state.alive, state.num, 0.0)
    dry_vol_sp = state.vol * aero_data.dry_mask[..., :, None]        # [..., S, P]
    v_sb = jnp.einsum("...sp,...pb->...sb", dry_vol_sp * w[..., None, :],
                      onehot)
    v_b = jnp.sum(v_sb, axis=-2)                                     # [..., B]
    frac_sb = v_sb / jnp.maximum(v_b[..., None, :], 1e-30)           # [..., S, B]
    frac_p = jnp.einsum("...sb,...pb->...sp", frac_sb, onehot)       # [..., S, P]
    v_dry_p = jnp.sum(dry_vol_sp, axis=-2)                           # [..., P]
    vol_new = frac_p * v_dry_p[..., None, :]
    return dataclasses.replace(state, vol=vol_new)


def process(state: AeroState, aero_data: AeroData, env: EnvState, bg: BinGrid,
            supersats=(0.001, 0.003, 0.006, 0.01),
            advanced: bool = True) -> AeroDiagnostics:
    """The partmc_process equivalent: every gridded diagnostic in one pass.

    ``advanced`` adds the do_advanced_process optical + internally-mixed
    counterfactual diagnostics (zeros when off)."""
    from .optics import scat_abs_coeffs

    V = jnp.asarray(env.cell_volume)
    d = state.dry_diameter(aero_data)
    d = jnp.where(state.alive, d, bg.centers[0])
    w_num = state.num / V[..., None]
    m = particle_mass(state.vol, aero_data, dry=True)
    num_dist = histogram(bg, d, w_num) / bg.log_width
    mass_dist = histogram(bg, d, w_num * m) / bg.log_width
    spec_mass = jnp.einsum("...sp,...p->...s",
                           state.vol * aero_data.density[..., :, None],
                           w_num)
    chi, d_alpha, d_gamma = mixing_state_metrics(state, aero_data)
    chi_sub, _, _ = mixing_state_metrics(
        state, aero_data, particle_mask=(d <= 1e-6) & state.alive)
    ss = jnp.asarray(supersats, jnp.float32)
    ccn = ccn_conc(state, aero_data, env, ss)
    if advanced:
        b_scat, b_abs = scat_abs_coeffs(state, aero_data, V)
        mixed = equilib_water(bin_average_comp(state, aero_data, bg),
                              aero_data, env)
        b_scat_mix, b_abs_mix = scat_abs_coeffs(mixed, aero_data, V)
        ccn_mix = ccn_conc(mixed, aero_data, env, ss)
    else:
        zero = jnp.zeros_like(chi)
        b_scat = b_abs = b_scat_mix = b_abs_mix = zero
        ccn_mix = jnp.zeros_like(ccn)
    return AeroDiagnostics(
        num_dist=num_dist, mass_dist=mass_dist, spec_mass=spec_mass,
        num_conc=state.num_conc(V), chi=chi, d_alpha=d_alpha, d_gamma=d_gamma,
        chi_sub=chi_sub, ccn=ccn,
        pm1=pm_mass(state, aero_data, 1e-6, V),
        pm25=pm_mass(state, aero_data, 2.5e-6, V),
        pm10=pm_mass(state, aero_data, 1e-5, V),
        b_scat=b_scat, b_abs=b_abs,
        b_scat_mix=b_scat_mix, b_abs_mix=b_abs_mix, ccn_mix=ccn_mix,
    )
