"""Per-particle aerosol optical properties and bulk radiation feedback.

Equivalent of the reference's ``do_optical`` pathway: MOSAIC's shell-core
Mie optics per particle (``mosaic_aero_optical_single_wavelength``,
``wrf_pmc_driver.F90:1205``) aggregated into the bulk ``tauaer/gaer/waer``
fields fed to RRTMG (``compute_bulk_optical_props`` ``:2025-2097``).

Three per-particle efficiency backends:

* ``method="mie"``: exact Mie efficiencies from the precomputed
  (size parameter x, n, k) lookup table in :mod:`.mie`, trilinearly
  interpolated on device — the fidelity of the reference's per-particle
  MOSAIC Mie (``mosaic_aero_optical_single_wavelength``,
  ``wrf_pmc_driver.F90:1205``) at table-gather cost; default for
  diagnostics and the particle-restart schema.
* ``method="mie_fit"``: the gather-free Chebyshev x poly(n, k) surrogate
  of the same table (``mie.fit_lookup``, 5-7% per-particle rms) — default
  for the every-step bulk radiation/photolysis coupling, where the exact
  table's corner gathers cost ~11 s/step at the CARES shape.
* ``method="adt"``: the round-1 anomalous diffraction theory closure
  (van de Hulst 1957) — kept as the cheap fallback and for the documented
  Mie-vs-ADT delta test (``tests/test_radiation.py``).

BC mixing: volume rule by default; ``maxwell_garnett=True`` treats BC as
inclusions in the volume-mixed host (the MOSAIC shell-core stand-in).

Species refractive indices at 550 nm from the OPAC database (Hess et al.
1998) by species class.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .aero_data import AeroData, particle_volume, vol_to_diam
from .aero_state import AeroState

# default wavelengths [m] matching the 4 shortwave bands the reference
# couples (tauaer1-4)
WAVELENGTHS = (3.0e-7, 4.0e-7, 6.0e-7, 1.0e-6)


def species_refractive_index(aero_data: AeroData):
    """(n, k) arrays [S] at visible wavelengths (OPAC-class values)."""
    n = np.full(aero_data.n_spec, 1.45, np.float32)
    k = np.zeros(aero_data.n_spec, np.float32)
    for i, name in enumerate(aero_data.names):
        if name == "BC":
            n[i], k[i] = 1.82, 0.74        # soot
        elif name == "H2O":
            n[i], k[i] = 1.33, 0.0
        elif name in ("OC", "ARO1", "ARO2", "ALK1", "OLE1",
                      "API1", "API2", "LIM1", "LIM2"):
            n[i], k[i] = 1.53, 0.006       # organic carbon
        elif name in ("Na", "Cl"):
            n[i], k[i] = 1.50, 0.0         # sea salt
        elif name in ("OIN", "CO3", "Ca"):
            n[i], k[i] = 1.53, 0.008       # mineral dust-ish
        else:
            n[i], k[i] = 1.43, 0.0         # sulfate/nitrate/ammonium
    return jnp.asarray(n), jnp.asarray(k)


def particle_refractive_index(state: AeroState, aero_data: AeroData,
                              maxwell_garnett: bool = False):
    """(n, k) per particle [..., P].

    Default: volume mixing rule over all species.  ``maxwell_garnett``:
    treat BC as spherical inclusions in the volume-mixed non-BC host
    (Maxwell-Garnett effective medium) — the standard stand-in for
    MOSAIC's shell-core BC optics (``wrf_pmc_driver.F90:1205``); volume
    mixing mildly overestimates BC absorption relative to it."""
    n_s, k_s = species_refractive_index(aero_data)
    vtot = particle_volume(state.vol)
    safe = jnp.maximum(vtot, 1e-30)          # f32-safe; 1e-300 underflows
    empty = vtot <= 0.0
    if not maxwell_garnett:
        n = jnp.einsum("...sp,s->...p", state.vol, n_s) / safe
        k = jnp.einsum("...sp,s->...p", state.vol, k_s) / safe
        return jnp.where(empty, 1.45, n), jnp.where(empty, 0.0, k)

    i_bc = aero_data.spec_by_name("BC")
    v_bc = state.vol[..., i_bc, :]
    f = jnp.clip(v_bc / safe, 0.0, 0.999)
    host_v = jnp.maximum(vtot - v_bc, 1e-30)
    n_h = (jnp.einsum("...sp,s->...p", state.vol, n_s)
           - v_bc * n_s[i_bc]) / host_v
    k_h = (jnp.einsum("...sp,s->...p", state.vol, k_s)
           - v_bc * k_s[i_bc]) / host_v
    m_h = (n_h + 1j * k_h).astype(jnp.complex64)
    m_i = jnp.complex64(complex(float(n_s[i_bc]), float(k_s[i_bc])))
    eps_m = m_h * m_h
    eps_i = m_i * m_i
    num = eps_i + 2.0 * eps_m + 2.0 * f * (eps_i - eps_m)
    den = eps_i + 2.0 * eps_m - f * (eps_i - eps_m)
    m_eff = jnp.sqrt(eps_m * num / den)
    # principal branch with positive imaginary part (passive medium)
    n = jnp.abs(jnp.real(m_eff))
    k = jnp.abs(jnp.imag(m_eff))
    return jnp.where(empty, 1.45, n), jnp.where(empty, 0.0, k)


def adt_efficiencies(diam, n, k, wavelength):
    """ADT extinction/absorption efficiencies Q_ext, Q_abs [...].

    rho = 2 x (n - 1) phase shift, with the absorbing extension
    (van de Hulst; Ackerman & Stephens 1987 form).
    """
    x = jnp.pi * diam / wavelength
    rho = 2.0 * x * jnp.maximum(n - 1.0, 1e-6)
    beta = jnp.arctan2(k, jnp.maximum(n - 1.0, 1e-6))
    cosb = jnp.cos(beta)
    e = jnp.exp(-rho * jnp.tan(beta))
    q_ext = (2.0 - 4.0 * e * (cosb / rho) * jnp.sin(rho - beta)
             - 4.0 * e * (cosb / rho) ** 2 * jnp.cos(rho - 2.0 * beta)
             + 4.0 * (cosb / rho) ** 2 * jnp.cos(2.0 * beta))
    q_ext = jnp.clip(q_ext, 0.0, 6.0)
    # absorption: ADT closed form
    z = 4.0 * x * k
    q_abs = 1.0 + 2.0 * jnp.exp(-z) / z + 2.0 * (jnp.exp(-z) - 1.0) / (z * z)
    q_abs = jnp.where(z > 1e-6, q_abs, z * 2.0 / 3.0)
    q_abs = jnp.clip(q_abs, 0.0, 1.0)
    q_abs = jnp.minimum(q_abs, q_ext)
    return q_ext, q_abs


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BulkOptics:
    tauaer: jax.Array    # [W, nz, ny, nx] layer optical depth per band
    waer: jax.Array      # [W, nz, ny, nx] single-scattering albedo
    gaer: jax.Array      # [W, nz, ny, nx] asymmetry parameter


def particle_efficiencies(diam, n, k, wavelength, method="mie",
                          mie_table=None):
    """Per-particle (q_ext, q_sca, g) at one wavelength by the selected
    backend (shapes follow ``diam``)."""
    if method == "mie":
        from .mie import make_mie_table, table_lookup

        table = mie_table if mie_table is not None else make_mie_table()
        x = jnp.pi * diam / wavelength
        return table_lookup(table, x, n, k)
    if method == "mie_fit":
        from .mie import fit_lookup

        return fit_lookup(jnp.pi * diam / wavelength, n, k)
    q_ext, q_abs = adt_efficiencies(diam, n, k, wavelength)
    x = jnp.pi * diam / wavelength
    g = jnp.clip(0.85 * (1.0 - jnp.exp(-x / 2.0)), 0.0, 0.9)
    return q_ext, q_ext - q_abs, g


def per_particle_optics(state: AeroState, aero_data: AeroData,
                        wavelengths=WAVELENGTHS, method="mie",
                        mie_table=None, maxwell_garnett: bool = False):
    """Per-particle scattering/absorption cross-sections [m2] + asymmetry
    per band: ([W, ..., P] c_sca, c_abs, g) — the aero_particle optics state
    the reference stores and restarts (``wrf_pmc_init.F90:1111-1272``:
    absorb/scatter cross-sections, asymmetry, refractive index).  Here it is
    derived state: recomputing from the Mie table costs less than carrying
    it through every transport gather, and is bit-reproducible, so the
    output/restart schema (``utils/io.py::write_particle_netcdf``) records
    it while the transported payload does not."""
    diam = jnp.maximum(state.wet_diameter(), 1e-9)
    n, k = particle_refractive_index(state, aero_data,
                                     maxwell_garnett=maxwell_garnett)
    area = (jnp.pi / 4.0) * diam * diam
    c_sca, c_abs, gs = [], [], []
    for wl in wavelengths:
        q_ext, q_sca, g = particle_efficiencies(diam, n, k, wl, method,
                                                mie_table)
        c_sca.append(q_sca * area)
        c_abs.append((q_ext - q_sca) * area)
        gs.append(g)
    return jnp.stack(c_sca), jnp.stack(c_abs), jnp.stack(gs)


def bulk_optical_props(state: AeroState, aero_data: AeroData, dz,
                       cell_volume, wavelengths=WAVELENGTHS,
                       method="mie_fit", mie_table=None,
                       maxwell_garnett: bool = False) -> BulkOptics:
    """Aggregate per-particle cross-sections to layer tauaer/waer/gaer
    (compute_bulk_optical_props equivalent).  dz: [nz] layer depths.

    Default backend is the gather-free fitted Mie surrogate
    (``mie.fit_lookup`` — 5-7% per-particle rms vs the exact table, which
    averages down further in these population sums): this path runs every
    coupled step inside the radiation + photolysis feedbacks, where the
    exact table's corner gathers cost ~11 s/step at the CARES shape.
    Diagnostics and the restart schema keep the exact table
    (``per_particle_optics`` default method="mie")."""
    c_sca, c_abs, g_i = per_particle_optics(state, aero_data, wavelengths,
                                            method, mie_table,
                                            maxwell_garnett=maxwell_garnett)
    V = jnp.asarray(cell_volume)
    live_num = jnp.where(state.alive, state.num, 0.0)
    b_sca = jnp.sum(c_sca * live_num, axis=-1) / V          # [W, nz, ny, nx]
    b_ext = b_sca + jnp.sum(c_abs * live_num, axis=-1) / V
    tau = b_ext * dz.reshape(1, -1, 1, 1)
    w0 = b_sca / jnp.maximum(b_ext, 1e-30)
    g = (jnp.sum(c_sca * g_i * live_num, axis=-1)
         / jnp.maximum(jnp.sum(c_sca * live_num, axis=-1), 1e-30))
    return BulkOptics(tauaer=tau, waer=w0, gaer=g)

def scat_abs_coeffs(state: AeroState, aero_data: AeroData, cell_volume,
                    wavelength: float = 5.5e-7, method="mie", mie_table=None):
    """Bulk scattering/absorption coefficients [m-1] at one wavelength —
    the per-population reduction behind the reference's optical diagnostic
    fields (``wrf_pmc_driver.F90:1180-1252``, MOSAIC optics per particle
    summed to gridded scattering/absorption)."""
    c_sca, c_abs, _ = per_particle_optics(state, aero_data, (wavelength,),
                                          method, mie_table)
    V = jnp.asarray(cell_volume)
    live_num = jnp.where(state.alive, state.num, 0.0)
    b_sca = jnp.sum(c_sca[0] * live_num, axis=-1) / V
    b_abs = jnp.sum(c_abs[0] * live_num, axis=-1) / V
    return b_sca, b_abs
