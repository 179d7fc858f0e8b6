"""CBM-Z-class gas-phase photochemistry over the exact 77-species wrf_partmc
gas list, batched over grid cells for TPU.

Reference parity: MOSAIC's gas-phase mechanism is CBM-Z (Zaveri & Peters
1999), invoked per cell from ``mosaic_timestep`` (reference
``interface/wrf_pmc_driver.F90:232-237``); the species universe is the
chem_opt==777 package list (``WRFV3/Registry/registry.chem:3986``).  MOSAIC
itself is a *private* submodule upstream, so this module re-derives a
CBM-Z-structured condensed mechanism (regime-complete: inorganic NOx/Ox/HOx,
C1-C2, lumped CBM higher organics, isoprene, monoterpene & aromatic SOA
precursors, and the DMS marine-sulfur block) with rate data re-derived from
the public kinetics literature (JPL/IUPAC-style Arrhenius + Troe forms).
It is a clean-room TPU implementation, not a port.

TPU-first design, instead of the reference's per-cell LSODE regime-split
solver:

* concentrations live in a dense ``[..., G]`` ppb tensor over all cells;
* one fixed-shape 2-stage Rosenbrock (ROS2, Verwer et al. 1999 — the
  standard CTM chemistry integrator) advances *every* cell in lockstep with
  a batched dense 77x77 Jacobian solve — XLA maps the Jacobian contraction
  and the LU solves onto the MXU;
* the Jacobian is assembled analytically as two one-hot contractions
  (``einsum('...r,rt,rs->...ts')``) — no autodiff tracing of the mechanism,
  no scatter ops;
* photolysis is a clear-sky zenith-angle power-law parameterization
  (J = a * cos(chi)^b), matching how the reference's TUV-less runs are
  typically configured.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ... import constants as c

# ---------------------------------------------------------------------------
# The 77-species gas registry (names exactly as Registry/registry.chem:3986,
# molecular weights kg/mol)
# ---------------------------------------------------------------------------
CBMZ_GASES = (
    ("H2SO4", 98.0e-3), ("HNO3", 63.0e-3), ("HCl", 36.5e-3), ("NH3", 17.0e-3),
    ("NO", 30.0e-3), ("NO2", 46.0e-3), ("NO3", 62.0e-3), ("N2O5", 108.0e-3),
    ("HONO", 47.0e-3), ("HNO4", 79.0e-3), ("O3", 48.0e-3), ("O1D", 16.0e-3),
    ("O3P", 16.0e-3), ("OH", 17.0e-3), ("HO2", 33.0e-3), ("H2O2", 34.0e-3),
    ("CO", 28.0e-3), ("SO2", 64.0e-3), ("CH4", 16.0e-3), ("C2H6", 30.0e-3),
    ("CH3O2", 47.0e-3), ("ETHP", 61.0e-3), ("HCHO", 30.0e-3),
    ("CH3OH", 32.0e-3), ("ANOL", 46.0e-3), ("CH3OOH", 48.0e-3),
    ("ETHOOH", 62.0e-3), ("ALD2", 44.0e-3), ("HCOOH", 46.0e-3),
    ("RCOOH", 60.0e-3), ("C2O3", 75.0e-3), ("PAN", 121.0e-3),
    ("ARO1", 150.0e-3), ("ARO2", 150.0e-3), ("ALK1", 140.0e-3),
    ("OLE1", 140.0e-3), ("API1", 184.0e-3), ("API2", 184.0e-3),
    ("LIM1", 200.0e-3), ("LIM2", 200.0e-3), ("PAR", 14.0e-3),
    ("AONE", 58.0e-3), ("MGLY", 72.0e-3), ("ETH", 28.0e-3),
    ("OLET", 27.0e-3), ("OLEI", 27.0e-3), ("TOL", 92.0e-3), ("XYL", 106.0e-3),
    ("CRES", 108.0e-3), ("TO2", 173.0e-3), ("CRO", 107.0e-3),
    ("OPEN", 84.0e-3), ("ONIT", 119.0e-3), ("ROOH", 62.0e-3),
    ("RO2", 47.0e-3), ("ANO2", 89.0e-3), ("NAP", 119.0e-3), ("XO2", 47.0e-3),
    ("XPAR", 14.0e-3), ("ISOP", 68.0e-3), ("ISOPRD", 70.0e-3),
    ("ISOPP", 117.0e-3), ("ISOPN", 147.0e-3), ("ISOPO2", 117.0e-3),
    ("API", 136.0e-3), ("LIM", 136.0e-3), ("DMS", 62.0e-3), ("MSA", 96.0e-3),
    ("DMSO", 78.0e-3), ("DMSO2", 94.0e-3), ("CH3SO2H", 80.0e-3),
    ("CH3SCH2OO", 93.0e-3), ("CH3SO2", 79.0e-3), ("CH3SO3", 95.0e-3),
    ("CH3SO2OO", 111.0e-3), ("CH3SO2CH2OO", 125.0e-3), ("SULFHOX", 98.0e-3),
)

# number of N atoms carried by each NOy species (mechanism-integrity test
# checks conservation of this sum in every reaction; NH3 is NHx, not NOy,
# and NAP is a nitrate-*forming* peroxy that picks its N up from NO)
N_ATOMS = {
    "HNO3": 1, "NO": 1, "NO2": 1, "NO3": 1, "N2O5": 2, "HONO": 1,
    "HNO4": 1, "PAN": 1, "ONIT": 1, "ISOPN": 1,
}


# ---------------------------------------------------------------------------
# Rate-expression builders.  Each returns f(T, M, H2O, J) -> k with T in K,
# M (air) and H2O in molec/cm3, J a dict of photolysis frequencies [1/s].
# Second-order rate constants are in cm3/molec/s (unit conversion to ppb
# happens in the solver); first-order in 1/s.
# ---------------------------------------------------------------------------
def ARR(A, C=0.0, B=0.0):
    return lambda T, M, H2O, J: A * (T / 300.0) ** B * jnp.exp(-C / T)


def ARR_M(A, C=0.0, B=0.0):
    """Arrhenius times [M] (third-body folded in) -> effectively 1 order less."""
    return lambda T, M, H2O, J: A * (T / 300.0) ** B * jnp.exp(-C / T) * M


def ARR_H2O(A, C=0.0):
    return lambda T, M, H2O, J: A * jnp.exp(-C / T) * H2O


def TROE(k0_300, n, kinf_300, m):
    def f(T, M, H2O, J):
        k0 = k0_300 * (T / 300.0) ** (-n) * M
        kinf = kinf_300 * (T / 300.0) ** (-m)
        pr = k0 / kinf
        logf = 1.0 / (1.0 + jnp.log10(pr) ** 2)
        return k0 / (1.0 + pr) * 0.6 ** logf
    return f


def TROE_REV(k0_300, n, kinf_300, m, A_eq, B_eq):
    """Thermal decomposition: k_troe / K_eq (K_eq = A_eq exp(B_eq/T) cm3)."""
    troe = TROE(k0_300, n, kinf_300, m)
    return lambda T, M, H2O, J: troe(T, M, H2O, J) / (A_eq * jnp.exp(B_eq / T))


def PHOTO(name, scale=1.0):
    return lambda T, M, H2O, J: scale * J[name]


def K_OH_HNO3(T, M, H2O, J):
    # three-term pressure-dependent OH + HNO3 (JPL form)
    k0 = 2.4e-14 * jnp.exp(460.0 / T)
    k2 = 2.7e-17 * jnp.exp(2199.0 / T)
    k3m = 6.5e-34 * jnp.exp(1335.0 / T) * M
    return k0 + k3m / (1.0 + k3m / k2)


def K_HO2_HO2(T, M, H2O, J):
    # water-vapor-enhanced HO2 self-reaction
    k = 3.0e-13 * jnp.exp(460.0 / T) + 2.1e-33 * M * jnp.exp(920.0 / T)
    return k * (1.0 + 1.4e-21 * H2O * jnp.exp(2200.0 / T))


def K_CO_OH(T, M, H2O, J):
    return 1.5e-13 * (1.0 + 2.44e-20 * M)


def K_DMS_OH_ADD(T, M, H2O, J):
    # O2-dependent OH-addition channel (IUPAC form); O2 = 0.21 M
    o2 = 0.21 * M
    num = 1.7e-42 * jnp.exp(7810.0 / T) * o2
    den = 1.0 + 5.5e-31 * jnp.exp(7460.0 / T) * o2
    return num / den


def K_O3P_O2(T, M, H2O, J):
    # O3P + O2 + M -> O3 folded to first order in O3P
    return 6.0e-34 * (T / 300.0) ** (-2.4) * M * 0.21 * M


# clear-sky photolysis parameterization J = a * max(cos chi, 0)^b
_J_PARAMS = {
    "no2":    (9.0e-3, 0.8),
    "no3":    (2.0e-1, 0.2),
    "hono":   (1.8e-3, 0.8),
    "hno3":   (7.0e-7, 1.5),
    "hno4":   (5.0e-6, 1.5),
    "n2o5":   (3.0e-5, 1.5),
    "o3p":    (5.0e-4, 0.8),
    "o1d":    (3.5e-5, 2.0),
    "h2o2":   (7.0e-6, 1.2),
    "ooh":    (5.0e-6, 1.2),
    "hchoa":  (3.0e-5, 1.4),   # radical channel
    "hchob":  (4.5e-5, 1.1),   # molecular channel
    "ald2":   (5.0e-6, 1.6),
    "open":   (2.7e-4, 1.4),
    "mgly":   (1.7e-4, 1.2),
    "aone":   (1.0e-6, 1.8),
    "isoprd": (1.0e-5, 1.4),
    "onit":   (1.5e-6, 1.5),
}


def photolysis_rates(cosz, j_scale=None):
    """J-values [1/s] for every photolysis channel from cos(solar zenith).

    ``j_scale``: optional per-cell actinic-flux factor (aerosol/cloud
    attenuation of the photolysis field, e.g.
    ``physics.radiation.photolysis_aerosol_factor`` — the TUV aerosol
    coupling of the reference's MOSAIC photolysis)."""
    mu = jnp.maximum(jnp.asarray(cosz), 0.0)
    if j_scale is not None:
        return {name: a * mu ** b * j_scale
                for name, (a, b) in _J_PARAMS.items()}
    return {name: a * mu ** b for name, (a, b) in _J_PARAMS.items()}


def cos_zenith(lat_deg, lon_deg, day_of_year, utc_sec):
    """Cosine of the solar zenith angle (standard declination formula)."""
    lat = jnp.deg2rad(jnp.asarray(lat_deg))
    decl = jnp.deg2rad(23.45) * jnp.sin(
        2.0 * jnp.pi * (284.0 + day_of_year) / 365.0)
    hour = (utc_sec / 3600.0 + jnp.asarray(lon_deg) / 15.0) % 24.0
    ha = jnp.deg2rad(15.0 * (hour - 12.0))
    return (jnp.sin(lat) * jnp.sin(decl)
            + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(ha))


# ---------------------------------------------------------------------------
# The mechanism table: (rate_fn, reactant1, reactant2|None, {product: yield})
# ---------------------------------------------------------------------------
def _mechanism_table():
    R = []
    A = R.append
    # --- photolysis ---
    A((PHOTO("no2"), "NO2", None, {"NO": 1, "O3P": 1}))
    A((PHOTO("no3"), "NO3", None, {"NO2": 0.89, "O3P": 0.89, "NO": 0.11}))
    A((PHOTO("hono"), "HONO", None, {"OH": 1, "NO": 1}))
    A((PHOTO("hno3"), "HNO3", None, {"OH": 1, "NO2": 1}))
    A((PHOTO("hno4"), "HNO4", None, {"HO2": 1, "NO2": 1}))
    A((PHOTO("n2o5"), "N2O5", None, {"NO2": 1, "NO3": 1}))
    A((PHOTO("o3p"), "O3", None, {"O3P": 1}))
    A((PHOTO("o1d"), "O3", None, {"O1D": 1}))
    A((PHOTO("h2o2"), "H2O2", None, {"OH": 2}))
    # --- Ox / HOx / NOx inorganic core ---
    A((K_O3P_O2, "O3P", None, {"O3": 1}))
    A((ARR(6.5e-12, -120.0), "O3P", "NO2", {"NO": 1}))
    A((TROE(9.0e-32, 2.0, 2.2e-11, 0.0), "O3P", "NO2", {"NO3": 1}))
    A((TROE(9.0e-32, 1.5, 3.0e-11, 0.0), "O3P", "NO", {"NO2": 1}))
    A((ARR_M(2.38e-11, -100.0), "O1D", None, {"O3P": 1}))
    A((ARR_H2O(2.2e-10), "O1D", None, {"OH": 2}))
    A((ARR(3.0e-12, 1500.0), "O3", "NO", {"NO2": 1}))
    A((ARR(1.2e-13, 2450.0), "O3", "NO2", {"NO3": 1}))
    A((ARR(1.7e-12, 940.0), "O3", "OH", {"HO2": 1}))
    A((ARR(1.0e-14, 490.0), "O3", "HO2", {"OH": 1}))
    A((TROE(1.8e-30, 3.0, 2.8e-11, 0.0), "OH", "NO2", {"HNO3": 1}))
    A((TROE(7.0e-31, 2.6, 3.6e-11, 0.1), "OH", "NO", {"HONO": 1}))
    A((ARR(1.8e-11, 390.0), "OH", "HONO", {"NO2": 1}))
    A((K_OH_HNO3, "OH", "HNO3", {"NO3": 1}))
    A((ARR(1.3e-12, -380.0), "OH", "HNO4", {"NO2": 1}))
    A((ARR(4.8e-11, -250.0), "OH", "HO2", {}))
    A((ARR(1.8e-12), "OH", "H2O2", {"HO2": 1}))
    A((ARR(3.5e-12, -250.0), "HO2", "NO", {"OH": 1, "NO2": 1}))
    A((TROE(2.0e-31, 3.4, 2.9e-12, 1.1), "HO2", "NO2", {"HNO4": 1}))
    A((TROE_REV(2.0e-31, 3.4, 2.9e-12, 1.1, 2.1e-27, 10900.0),
       "HNO4", None, {"HO2": 1, "NO2": 1}))
    A((K_HO2_HO2, "HO2", "HO2", {"H2O2": 1}))
    A((ARR(1.5e-11, -170.0), "NO3", "NO", {"NO2": 2}))
    A((TROE(2.4e-30, 3.0, 1.6e-12, -0.1), "NO3", "NO2", {"N2O5": 1}))
    A((TROE_REV(2.4e-30, 3.0, 1.6e-12, -0.1, 2.7e-27, 11000.0),
       "N2O5", None, {"NO3": 1, "NO2": 1}))
    A((ARR_H2O(2.5e-22), "N2O5", None, {"HNO3": 2}))
    A((ARR(3.5e-12), "NO3", "HO2", {"OH": 0.7, "NO2": 0.7, "HNO3": 0.3}))
    A((ARR(8.5e-13, 2450.0), "NO3", "NO3", {"NO2": 2}))
    A((K_CO_OH, "CO", "OH", {"HO2": 1}))
    A((TROE(3.0e-31, 3.3, 1.5e-12, 0.0), "SO2", "OH",
       {"H2SO4": 1, "HO2": 1}))
    A((ARR(7.8e-12, 250.0), "HCl", "OH", {}))          # Cl chemistry lumped out
    A((ARR(1.7e-12, 710.0), "NH3", "OH", {}))
    # --- C1-C2 ---
    A((ARR(2.45e-12, 1775.0), "CH4", "OH", {"CH3O2": 1}))
    A((ARR(7.66e-12, 1020.0), "C2H6", "OH", {"ETHP": 1}))
    A((ARR(2.8e-12, -300.0), "CH3O2", "NO", {"HCHO": 1, "HO2": 1, "NO2": 1}))
    A((ARR(2.6e-12, -365.0), "ETHP", "NO", {"ALD2": 1, "HO2": 1, "NO2": 1}))
    A((ARR(1.3e-12), "CH3O2", "NO3", {"HCHO": 1, "HO2": 1, "NO2": 1}))
    A((ARR(4.1e-13, -750.0), "CH3O2", "HO2", {"CH3OOH": 1}))
    A((ARR(7.5e-13, -700.0), "ETHP", "HO2", {"ETHOOH": 1}))
    A((ARR(9.5e-14, -390.0), "CH3O2", "CH3O2",
       {"HCHO": 1.6, "HO2": 1.2, "CH3OH": 0.4}))
    A((PHOTO("ooh"), "CH3OOH", None, {"HCHO": 1, "HO2": 1, "OH": 1}))
    A((PHOTO("ooh"), "ETHOOH", None, {"ALD2": 1, "HO2": 1, "OH": 1}))
    A((ARR(3.8e-12, -200.0), "CH3OOH", "OH",
       {"CH3O2": 0.7, "HCHO": 0.3, "OH": 0.3}))
    A((ARR(3.8e-12, -200.0), "ETHOOH", "OH",
       {"ETHP": 0.5, "ALD2": 0.5, "OH": 0.5}))
    A((PHOTO("hchoa"), "HCHO", None, {"HO2": 2, "CO": 1}))
    A((PHOTO("hchob"), "HCHO", None, {"CO": 1}))
    A((ARR(5.5e-12, -125.0), "HCHO", "OH", {"HO2": 1, "CO": 1}))
    A((ARR(5.8e-16), "HCHO", "NO3", {"HNO3": 1, "HO2": 1, "CO": 1}))
    A((ARR(2.9e-12, 345.0), "CH3OH", "OH", {"HCHO": 1, "HO2": 1}))
    A((ARR(3.2e-12), "ANOL", "OH", {"ALD2": 1, "HO2": 1}))
    A((ARR(5.6e-12, -270.0), "ALD2", "OH", {"C2O3": 1}))
    A((ARR(1.4e-12, 1900.0), "ALD2", "NO3", {"C2O3": 1, "HNO3": 1}))
    A((PHOTO("ald2"), "ALD2", None, {"CH3O2": 1, "HO2": 1, "CO": 1}))
    A((ARR(8.1e-12, -270.0), "C2O3", "NO", {"CH3O2": 1, "NO2": 1}))
    A((TROE(9.7e-29, 5.6, 9.3e-12, 1.5), "C2O3", "NO2", {"PAN": 1}))
    A((TROE_REV(9.7e-29, 5.6, 9.3e-12, 1.5, 9.0e-29, 14000.0),
       "PAN", None, {"C2O3": 1, "NO2": 1}))
    A((ARR(4.3e-13, -1040.0), "C2O3", "HO2", {"RCOOH": 0.75, "O3": 0.25}))
    A((ARR(2.9e-12, -500.0), "C2O3", "C2O3", {"CH3O2": 2}))
    A((ARR(1.3e-12, -640.0), "C2O3", "CH3O2",
       {"HCHO": 1, "HO2": 1, "CH3O2": 1}))
    A((ARR(4.5e-13), "HCOOH", "OH", {"HO2": 1}))
    A((ARR(7.0e-13), "RCOOH", "OH", {"C2O3": 1}))
    # --- lumped higher organics (CBM structure) ---
    A((ARR(8.1e-13), "PAR", "OH",
       {"XO2": 0.87, "NAP": 0.13, "RO2": 0.76, "ALD2": 0.11, "HO2": 0.11,
        "XPAR": 0.2, "ALK1": 0.001}))
    A((ARR(2.7e-12, -360.0), "RO2", "NO",
       {"NO2": 0.9, "HO2": 0.9, "ALD2": 0.54, "AONE": 0.36, "ONIT": 0.1}))
    A((ARR(1.9e-13, -1300.0), "RO2", "HO2", {"ROOH": 1}))
    A((ARR(2.6e-12, -365.0), "XO2", "NO", {"NO2": 1}))
    A((ARR(7.5e-13, -700.0), "XO2", "HO2", {"ROOH": 1}))
    A((ARR(6.8e-14), "XO2", "XO2", {}))
    A((ARR(2.6e-12, -365.0), "NAP", "NO", {"ONIT": 1}))
    A((ARR(7.5e-13, -700.0), "NAP", "HO2", {"ROOH": 1}))
    A((ARR(8.0e-11), "XPAR", "PAR", {}))
    A((ARR(1.0e-4), "XPAR", None, {}))
    A((ARR(2.0e-12, -411.0), "ETH", "OH",
       {"XO2": 1, "HCHO": 1.56, "ALD2": 0.22, "HO2": 1}))
    A((ARR(1.2e-14, 2630.0), "ETH", "O3",
       {"HCHO": 1, "CO": 0.43, "HO2": 0.26, "OH": 0.12, "HCOOH": 0.37}))
    A((ARR(5.2e-12, -504.0), "OLET", "OH",
       {"XO2": 1, "HCHO": 1, "ALD2": 1, "HO2": 1, "XPAR": 1, "OLE1": 0.008}))
    A((ARR(1.0e-11, -550.0), "OLEI", "OH",
       {"XO2": 1, "ALD2": 2, "HO2": 1, "XPAR": 1}))
    A((ARR(6.5e-15, 1900.0), "OLET", "O3",
       {"ALD2": 0.5, "HCHO": 0.74, "CO": 0.33, "HO2": 0.44, "XO2": 0.22,
        "OH": 0.1, "HCOOH": 0.2, "RCOOH": 0.06, "XPAR": 1}))
    A((ARR(8.5e-15, 1520.0), "OLEI", "O3",
       {"ALD2": 1.0, "AONE": 0.3, "CO": 0.33, "HO2": 0.44, "OH": 0.1,
        "XPAR": 1}))
    A((ARR(1.1e-13), "OLET", "NO3",
       {"ONIT": 0.91, "XO2": 0.09, "NO2": 0.09, "ALD2": 0.09, "XPAR": 1}))
    A((ARR(3.2e-13), "OLEI", "NO3",
       {"ONIT": 0.91, "XO2": 0.09, "NO2": 0.09, "ALD2": 0.09, "XPAR": 1}))
    A((ARR(2.1e-12, -322.0), "TOL", "OH",
       {"HO2": 0.44, "XO2": 0.08, "CRES": 0.36, "TO2": 0.56, "ARO1": 0.07}))
    A((ARR(1.7e-11, -116.0), "XYL", "OH",
       {"HO2": 0.7, "XO2": 0.5, "CRES": 0.2, "MGLY": 0.8, "PAR": 1.1,
        "TO2": 0.3, "ARO2": 0.04}))
    A((ARR(8.1e-12), "TO2", "NO",
       {"NO2": 0.9, "HO2": 0.9, "OPEN": 0.9, "ONIT": 0.1}))
    A((ARR(4.1e-11), "CRES", "OH",
       {"CRO": 0.4, "XO2": 0.6, "HO2": 0.6, "OPEN": 0.3}))
    A((ARR(2.2e-11), "CRES", "NO3", {"CRO": 1, "HNO3": 1}))
    A((ARR(1.4e-11), "CRO", "NO2", {"ONIT": 1}))
    A((PHOTO("open"), "OPEN", None, {"C2O3": 1, "HO2": 1, "CO": 1}))
    A((ARR(3.0e-11), "OPEN", "OH",
       {"XO2": 1, "CO": 2, "HO2": 2, "HCHO": 1, "C2O3": 1}))
    A((ARR(5.4e-17, 500.0), "OPEN", "O3",
       {"ALD2": 0.03, "C2O3": 0.62, "HCHO": 0.7, "XO2": 0.03, "CO": 0.69,
        "OH": 0.08, "HO2": 0.76, "MGLY": 0.2}))
    A((PHOTO("mgly"), "MGLY", None, {"C2O3": 1, "HO2": 1, "CO": 1}))
    A((ARR(1.7e-11), "MGLY", "OH", {"XO2": 1, "C2O3": 1}))
    A((PHOTO("aone"), "AONE", None, {"C2O3": 1, "CH3O2": 1}))
    A((ARR(8.8e-12, 1320.0), "AONE", "OH", {"ANO2": 1}))
    A((ARR(2.6e-12, -365.0), "ANO2", "NO",
       {"C2O3": 1, "HCHO": 1, "NO2": 1}))
    A((ARR(7.5e-13, -700.0), "ANO2", "HO2", {"ROOH": 1}))
    A((ARR(1.5e-12), "ONIT", "OH", {"NO2": 1, "XO2": 1, "ALD2": 1}))
    A((PHOTO("onit"), "ONIT", None, {"NO2": 1, "HO2": 1, "ALD2": 1}))
    A((ARR(3.8e-12, -200.0), "ROOH", "OH",
       {"RO2": 0.6, "ALD2": 0.4, "OH": 0.4}))
    A((PHOTO("ooh"), "ROOH", None, {"OH": 1, "HO2": 1, "ALD2": 1}))
    # --- isoprene ---
    A((ARR(2.54e-11, -410.0), "ISOP", "OH", {"ISOPP": 1}))
    A((ARR(7.86e-15, 1913.0), "ISOP", "O3",
       {"HCHO": 0.6, "ISOPRD": 0.65, "OH": 0.27, "HO2": 0.07, "C2O3": 0.2,
        "ALD2": 0.15, "XO2": 0.2, "CO": 0.07}))
    A((ARR(3.03e-12, 448.0), "ISOP", "NO3", {"ISOPN": 1}))
    A((ARR(3.6e-11), "ISOP", "O3P", {"ISOPRD": 0.75, "HCHO": 0.25}))
    A((ARR(2.6e-12, -365.0), "ISOPP", "NO",
       {"ISOPRD": 0.91, "HO2": 0.91, "NO2": 0.91, "ONIT": 0.09}))
    A((ARR(7.5e-13, -700.0), "ISOPP", "HO2", {"ROOH": 1}))
    A((ARR(2.6e-12, -365.0), "ISOPN", "NO", {"ISOPRD": 1, "NO2": 2}))
    A((ARR(7.5e-13, -700.0), "ISOPN", "HO2", {"ONIT": 1}))
    A((ARR(3.36e-11), "ISOPRD", "OH", {"ISOPO2": 0.5, "C2O3": 0.5}))
    A((ARR(7.1e-18), "ISOPRD", "O3",
       {"OH": 0.27, "HO2": 0.1, "C2O3": 0.11, "XO2": 0.07, "MGLY": 0.05,
        "ALD2": 0.39, "CO": 0.36, "HCHO": 0.15}))
    A((PHOTO("isoprd"), "ISOPRD", None,
       {"C2O3": 0.97, "HO2": 0.33, "CO": 0.33, "CH3O2": 0.7}))
    A((ARR(1.0e-15), "ISOPRD", "NO3", {"HNO3": 1, "C2O3": 1}))
    A((ARR(2.6e-12, -365.0), "ISOPO2", "NO",
       {"NO2": 1, "HO2": 1, "CO": 0.59, "ALD2": 0.55, "HCHO": 0.25,
        "MGLY": 0.34}))
    A((ARR(7.5e-13, -700.0), "ISOPO2", "HO2", {"ROOH": 1}))
    # --- monoterpene SOA precursors ---
    A((ARR(1.21e-11, -444.0), "API", "OH",
       {"API1": 0.8, "API2": 0.2, "XO2": 1, "HO2": 1}))
    A((ARR(1.01e-15, 732.0), "API", "O3",
       {"API1": 0.6, "API2": 0.4, "OH": 0.85, "HO2": 0.1}))
    A((ARR(1.19e-12, -490.0), "API", "NO3", {"ONIT": 1}))
    A((ARR(4.2e-11), "LIM", "OH",
       {"LIM1": 0.6, "LIM2": 0.4, "XO2": 1, "HO2": 1}))
    A((ARR(2.95e-15, 783.0), "LIM", "O3",
       {"LIM1": 0.5, "LIM2": 0.5, "OH": 0.85, "HO2": 0.1}))
    A((ARR(1.22e-11), "LIM", "NO3", {"ONIT": 1}))
    # --- DMS marine sulfur block ---
    A((ARR(1.2e-11, 260.0), "DMS", "OH", {"CH3SCH2OO": 1}))
    A((K_DMS_OH_ADD, "DMS", "OH", {"DMSO": 1}))
    A((ARR(1.9e-13, -520.0), "DMS", "NO3", {"CH3SCH2OO": 1, "HNO3": 1}))
    A((ARR(2.6e-12, -365.0), "CH3SCH2OO", "NO",
       {"HCHO": 1, "CH3SO2": 1, "NO2": 1}))
    A((ARR(7.5e-13, -700.0), "CH3SCH2OO", "HO2",
       {"CH3SO2H": 1, "HCHO": 1}))
    A((ARR(8.7e-11), "DMSO", "OH", {"CH3SO2H": 0.95, "DMSO2": 0.05}))
    A((ARR(1.0e-13), "DMSO2", "OH", {"CH3SO2CH2OO": 1}))
    A((ARR(2.6e-12, -365.0), "CH3SO2CH2OO", "NO",
       {"NO2": 1, "HCHO": 1, "CH3SO2": 1}))
    A((ARR(9.0e-11), "CH3SO2H", "OH", {"CH3SO2": 1}))
    A((ARR(5.0e13, 9673.0), "CH3SO2", None, {"SO2": 1, "CH3O2": 1}))
    A((ARR(6.3e-13), "CH3SO2", "O3", {"CH3SO3": 1}))
    A((ARR(2.2e-11), "CH3SO2", "NO2", {"CH3SO3": 1, "NO": 1}))
    A((ARR_M(5.5e-19), "CH3SO2", None, {"CH3SO2OO": 1}))   # +O2 folded
    A((ARR(3.5e10, 3560.0), "CH3SO2OO", None, {"CH3SO2": 1}))
    A((ARR(1.0e-11), "CH3SO2OO", "NO", {"CH3SO3": 1, "NO2": 1}))
    A((ARR(2.2e-11), "CH3SO2OO", "HO2", {"CH3SO3": 1, "OH": 1}))
    A((ARR(1.6e-15), "CH3SO3", "HCHO", {"MSA": 1, "HO2": 1, "CO": 1}))
    A((ARR(5.0e-11), "CH3SO3", "HO2", {"MSA": 1}))
    A((ARR(1.1e3, 6100.0), "CH3SO3", None, {"SULFHOX": 1, "CH3O2": 1}))
    return R


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Mechanism:
    """Static mechanism tables (built once, closed over by jit)."""
    net: jax.Array       # [R, S] net stoichiometry (products - reactants)
    e1: jax.Array        # [R, S] one-hot of reactant 1
    e2: jax.Array        # [R, S] one-hot of reactant 2 (zero row if none)
    i1: jax.Array        # [R] index of reactant 1
    i2: jax.Array        # [R] index of reactant 2 (0 if none)
    has2: jax.Array      # [R] bool second reactant present
    rate_fns: tuple = dataclasses.field(metadata=dict(static=True),
                                        default=())
    names: tuple = dataclasses.field(metadata=dict(static=True), default=())

    @property
    def n_rxn(self) -> int:
        return len(self.rate_fns)

    @property
    def n_spec(self) -> int:
        return len(self.names)


def build_mechanism(gas_names=None) -> Mechanism:
    names = tuple(gas_names) if gas_names is not None else tuple(
        g[0] for g in CBMZ_GASES)
    idx = {n: i for i, n in enumerate(names)}
    table = _mechanism_table()
    S, R = len(names), len(table)
    net = np.zeros((R, S), np.float32)
    e1 = np.zeros((R, S), np.float32)
    e2 = np.zeros((R, S), np.float32)
    i1 = np.zeros(R, np.int32)
    i2 = np.zeros(R, np.int32)
    has2 = np.zeros(R, bool)
    for r, (fn, r1, r2, prods) in enumerate(table):
        i1[r] = idx[r1]
        e1[r, idx[r1]] = 1.0
        net[r, idx[r1]] -= 1.0
        if r2 is not None:
            i2[r] = idx[r2]
            e2[r, idx[r2]] = 1.0
            net[r, idx[r2]] -= 1.0
            has2[r] = True
        for p, y in prods.items():
            net[r, idx[p]] += y
    # keep tables as host numpy so a cached Mechanism never captures tracers
    # (it may be first built inside a traced branch); XLA constant-folds them
    return Mechanism(net=net, e1=e1, e2=e2, i1=i1, i2=i2, has2=has2,
                     rate_fns=tuple(t[0] for t in table), names=names)


# ---------------------------------------------------------------------------
# Batched ROS2 solver (all cells advance in lockstep; dense MXU Jacobian)
# ---------------------------------------------------------------------------
def rate_coefficients(mech: Mechanism, temp, pressure, rh, cosz,
                      j_scale=None):
    """Per-cell rate coefficients in ppb-space: k2nd * M * 1e-9 for
    two-reactant rows, k as-is for first-order rows.  Returns [..., R].
    ``j_scale``: per-cell actinic-flux factor applied to every photolysis
    channel (see :func:`photolysis_rates`)."""
    T = jnp.asarray(temp, jnp.float32)
    p = jnp.asarray(pressure, jnp.float32)
    M = p / (c.BOLTZMANN * T) * 1e-6          # molec/cm3
    # water vapor number density from RH (Tetens over liquid)
    esat = 610.78 * jnp.exp(17.27 * (T - 273.15) / (T - 35.85))
    H2O = jnp.asarray(rh) * esat / (c.BOLTZMANN * T) * 1e-6
    # CRITICAL: without this barrier XLA constant-folds the Boltzmann-scale
    # factors of M/H2O into the rate-constant prefactors of the formulas
    # below; products like 6.0e-34 * 0.21 * 1e-6 * 1e-6 underflow f32 to
    # exact 0, silently zeroing O3P+O2->O3 (and halving the HO2+HO2 water
    # enhancement) in jitted-with-traced-env runs while eager/constant-env
    # paths stayed correct (found via urban-plume trajectory validation:
    # daytime O3 collapsed under jit only)
    T, M, H2O = jax.lax.optimization_barrier((T, M, H2O))
    J = photolysis_rates(cosz, j_scale)
    ks = [fn(T, M, H2O, J) for fn in mech.rate_fns]
    k = jnp.stack([jnp.broadcast_to(ki, T.shape) for ki in ks], axis=-1)
    conv = jnp.where(mech.has2, M[..., None] * 1e-9, 1.0)
    return (k * conv).astype(jnp.float32)


def production_rates(mech: Mechanism, conc, k_ppb):
    """dc/dt [ppb/s] for conc [..., S]."""
    c1 = jnp.take(conc, mech.i1, axis=-1)
    c2 = jnp.where(mech.has2, jnp.take(conc, mech.i2, axis=-1), 1.0)
    vel = k_ppb * c1 * c2
    return vel @ mech.net


def jacobian(mech: Mechanism, conc, k_ppb):
    """Analytic [..., S, S] Jacobian d(dc/dt)/dc via one-hot contractions."""
    c1 = jnp.take(conc, mech.i1, axis=-1)
    c2 = jnp.where(mech.has2, jnp.take(conc, mech.i2, axis=-1), 1.0)
    g1 = k_ppb * c2                                   # d vel / d c[i1]
    g2 = jnp.where(mech.has2, k_ppb * c1, 0.0)        # d vel / d c[i2]
    J = (jnp.einsum("...r,rt,rs->...ts", g1, mech.net, mech.e1)
         + jnp.einsum("...r,rt,rs->...ts", g2, mech.net, mech.e2))
    return J


_ROS_GAMMA = 1.0 + 1.0 / math.sqrt(2.0)


def _gj_inv_small(A):
    """Unrolled Gauss-Jordan inverse with partial pivoting for small
    [..., S, S] blocks (S <= ~20): S fused sweeps over a [..., S, 2S]
    tableau, the pivot row selected per batch element by a masked argmax
    and swapped in with where-masks (no dynamic-shape gathers).
    ``jnp.linalg.inv``'s batched pivoted LU costs ~100 ms for a
    [16k, 16, 16] batch on one chip (sequential host-driven pivoting);
    this is bandwidth-trivial and keeps LU-grade stability — Schur
    complements of the chemistry operator are NOT diagonally dominant, so
    a no-pivot sweep catastrophically loses the inverse."""
    S = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(S, dtype=A.dtype), A.shape)
    M = jnp.concatenate([A, eye], axis=-1)                 # [..., S, 2S]
    rows = jnp.arange(S)
    for i in range(S):
        col = jnp.abs(M[..., :, i])                        # [..., S]
        col = jnp.where(rows >= i, col, -1.0)
        r = jnp.argmax(col, axis=-1)                       # [...]
        sel = (rows == r[..., None])[..., :, None]         # [..., S, 1]
        row_r = jnp.sum(jnp.where(sel, M, 0.0), axis=-2, keepdims=True)
        row_i = M[..., i:i + 1, :]
        M = jnp.where(sel, row_i, M)                       # old row i -> r
        piv = row_r / row_r[..., :, i:i + 1]               # [..., 1, 2S]
        M = M - M[..., :, i:i + 1] * piv
        M = M.at[..., i, :].set(piv[..., 0, :])
    return M[..., S:]


def _block_inv(A, min_block: int = 16):
    """Batched inverse of [..., S, S] by recursive 2x2 block (Schur
    complement) elimination — every step is a batched matmul the MXU
    executes at full rate, where the pivoted LU behind ``jnp.linalg.inv``
    lowers to S sequential latency-bound row eliminations (measured 540 ms
    for 16k x 77x77 on one chip; this path is ~20x faster).

    No pivoting: valid here because A = I - gamma h J of a production-form
    chemistry Jacobian is strongly diagonally dominated by the identity +
    first-order loss terms.  One Newton-Schulz refinement in the caller
    mops up the residual, and the Rosenbrock-W substeps only require an
    APPROXIMATE inverse for order anyway (Verwer et al. 1999 sec. 4)."""
    S = A.shape[-1]
    if S <= min_block:
        return _gj_inv_small(A)
    # full-f32 matmuls: the TPU default (bf16 inputs, f32 accumulate)
    # loses the Schur-complement conditioning and the inverse with it
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    k = S // 2
    A11, A12 = A[..., :k, :k], A[..., :k, k:]
    A21, A22 = A[..., k:, :k], A[..., k:, k:]
    iA11 = _block_inv(A11, min_block)
    S22 = A22 - mm(A21, mm(iA11, A12))
    iS22 = _block_inv(S22, min_block)
    iA11_A12 = mm(iA11, A12)
    B12 = -mm(iA11_A12, iS22)
    B21 = -mm(iS22, mm(A21, iA11))
    B11 = iA11 - mm(iA11_A12, B21)
    return jnp.concatenate(
        [jnp.concatenate([B11, B12], axis=-1),
         jnp.concatenate([B21, iS22], axis=-1)], axis=-2)


def fast_inv(A, ns_iters: int = 1):
    """MXU-friendly batched inverse: block-Schur elimination + ``ns_iters``
    Newton-Schulz refinements X <- X (2I - A X)."""
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    X = _block_inv(A)
    eye2 = 2.0 * jnp.eye(A.shape[-1], dtype=A.dtype)
    for _ in range(ns_iters):
        X = mm(X, eye2 - mm(A, X))
    return X


def ros2_substep(mech: Mechanism, conc, k_ppb, h):
    """One L-stable 2-stage Rosenbrock step (Verwer et al. 1999)."""
    S = conc.shape[-1]
    J = jacobian(mech, conc, k_ppb)
    A = jnp.eye(S, dtype=conc.dtype) - _ROS_GAMMA * h * J
    f1 = production_rates(mech, conc, k_ppb)
    k1 = jnp.linalg.solve(A, f1[..., None])[..., 0]
    f2 = production_rates(mech, jnp.maximum(conc + h * k1, 0.0), k_ppb)
    k2 = jnp.linalg.solve(A, (f2 - 2.0 * k1)[..., None])[..., 0]
    out = conc + 1.5 * h * k1 + 0.5 * h * k2
    return jnp.maximum(out, 0.0)


def ros2_substep_w(mech: Mechanism, conc, k_ppb, h, a_inv):
    """ROS2 stage update against a FROZEN inverted operator (Rosenbrock-W:
    the order-2 conditions of this scheme hold for an approximate Jacobian
    — Verwer et al. 1999 sec. 4; KPP's W-variants do the same).  The
    per-cell 77x77 operator is inverted once per chemistry macro-step and
    each stage solve becomes one batched [S,S]@[S] matvec — a pure MXU
    contraction, where pivoted triangular lu_solve substitution lowered to
    a sequential per-row loop the TPU executes poorly."""
    f1 = production_rates(mech, conc, k_ppb)
    k1 = jnp.einsum("...ts,...s->...t", a_inv, f1)
    f2 = production_rates(mech, jnp.maximum(conc + h * k1, 0.0), k_ppb)
    k2 = jnp.einsum("...ts,...s->...t", a_inv, f2 - 2.0 * k1)
    out = conc + 1.5 * h * k1 + 0.5 * h * k2
    return jnp.maximum(out, 0.0)


def cbmz_step(mech: Mechanism, gas_ppb, temp, pressure, rh, cosz, dt,
              n_sub: int = 6, w_method: bool = True,
              cell_block: int = 8192, j_scale=None):
    """Advance the gas mechanism by dt over every cell.

    gas_ppb: [..., S] (S = mech.n_spec); temp/pressure/rh/cosz: [...] or
    scalars broadcast over cells.  Returns updated [..., S] ppb.

    ``w_method`` (default): Rosenbrock-W — the (I - gamma h J) operator is
    built and LU-factored ONCE per macro-step from the initial state and
    reused by every substep's two stage solves (order preserved for
    approximate Jacobians; L-stability held by the frozen operator).  The
    classic per-substep refactorization is kept for reference
    (w_method=False) and agrees to within the solver tolerance on the
    golden photochemistry tests.

    ``cell_block``: cells are solved in blocks of this size under
    ``lax.map``, so the dense per-cell [S, S] operators (23 KB/cell at
    S = 77 — 2.9 GB per live buffer at a CARES-shaped 75k cells, the r4
    single-chip HBM ceiling) only ever exist for one block at a time.
    Chemistry is embarrassingly parallel over cells, so blocking costs only
    ``lax.map`` sequencing on the 1-in-m chem-dt steps.
    """
    cell = gas_ppb.shape[:-1]
    S = gas_ppb.shape[-1]
    T = jnp.broadcast_to(jnp.asarray(temp, jnp.float32), cell)
    P = jnp.broadcast_to(jnp.asarray(pressure, jnp.float32), cell)
    RH = jnp.broadcast_to(jnp.asarray(rh, jnp.float32), cell)
    MU = jnp.broadcast_to(jnp.asarray(cosz, jnp.float32), cell)
    h = jnp.asarray(dt, jnp.float32) / n_sub
    N = 1
    for s in cell:
        N *= s

    def solve_block(args):
        conc0, Tb, Pb, RHb, MUb, JSb = args
        k_ppb = rate_coefficients(mech, Tb, Pb, RHb, MUb, j_scale=JSb)
        if w_method:
            J = jacobian(mech, conc0, k_ppb)
            A = jnp.eye(S, dtype=conc0.dtype) - _ROS_GAMMA * h * J
            a_inv = fast_inv(A)
            body = lambda i, conc: ros2_substep_w(mech, conc, k_ppb, h,
                                                  a_inv)
        else:
            body = lambda i, conc: ros2_substep(mech, conc, k_ppb, h)
        return jax.lax.fori_loop(0, n_sub, body, conc0)

    conc0 = gas_ppb.astype(jnp.float32).reshape(N, S)
    JS = jnp.broadcast_to(jnp.asarray(
        1.0 if j_scale is None else j_scale, jnp.float32), cell)
    flat = (conc0, T.reshape(N), P.reshape(N), RH.reshape(N), MU.reshape(N),
            JS.reshape(N))
    if N <= cell_block:
        return solve_block(flat).reshape(*cell, S)
    nb = -(-N // cell_block)
    padn = nb * cell_block - N
    stacked = tuple(jnp.pad(x, ((0, padn),) + ((0, 0),) * (x.ndim - 1))
                    .reshape(nb, cell_block, *x.shape[1:]) for x in flat)
    out = jax.lax.map(solve_block, stacked)
    return out.reshape(nb * cell_block, S)[:N].reshape(*cell, S)
