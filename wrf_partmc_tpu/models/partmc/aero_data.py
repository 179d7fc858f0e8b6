"""Aerosol species table and source/weight-class registries.

TPU-native equivalent of PartMC's ``aero_data`` module (reference call sites:
``wrf_pmc_init.F90:138-155`` reads ``aero_data.dat``; species columns are
name / density / num_ions / molec-weight / kappa, e.g.
``WRFV3/test/em_real/aero_data.dat:1-21``).  Species properties live in [S]
arrays so per-particle composition math vectorizes over the species axis.

Array-layout contract for all particle tensors in this package:
``vol: [..., S, P]`` (species axis -2, particle-slot axis last so the P axis
maps onto TPU lanes), ``num/id/...: [..., P]``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# (name, density [kg/m3], num_ions, molec weight [kg/mol], kappa)
# Standard PartMC-MOSAIC 20-species set; property values from the open
# literature (Zaveri et al. 2008 MOSAIC; Petters & Kreidenweis 2007 kappas).
DEFAULT_SPECIES = (
    ("SO4",  1800.0, 0, 96.0e-3,  0.65),
    ("NO3",  1800.0, 0, 62.0e-3,  0.65),
    ("Cl",   2200.0, 0, 35.5e-3,  1.1),
    ("NH4",  1800.0, 0, 18.0e-3,  0.65),
    ("MSA",  1800.0, 0, 95.0e-3,  0.53),
    ("ARO1", 1400.0, 0, 150.0e-3, 0.1),
    ("ARO2", 1400.0, 0, 150.0e-3, 0.1),
    ("ALK1", 1400.0, 0, 140.0e-3, 0.1),
    ("OLE1", 1400.0, 0, 140.0e-3, 0.1),
    ("API1", 1400.0, 0, 184.0e-3, 0.1),
    ("API2", 1400.0, 0, 184.0e-3, 0.1),
    ("LIM1", 1400.0, 0, 200.0e-3, 0.1),
    ("LIM2", 1400.0, 0, 200.0e-3, 0.1),
    ("CO3",  2600.0, 0, 60.0e-3,  0.53),
    ("Na",   2200.0, 0, 23.0e-3,  1.1),
    ("Ca",   2600.0, 0, 40.0e-3,  0.53),
    ("OIN",  2600.0, 0, 1.0e-3,   0.1),
    ("OC",   1000.0, 0, 1.0e-3,   0.001),
    ("BC",   1800.0, 0, 1.0e-3,   0.0),
    ("H2O",  1000.0, 0, 18.0e-3,  0.0),
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AeroData:
    """Species property table (+ registries grown at init time, like the
    reference's ``aero_data_source_by_name`` / ``weight_class_by_name``,
    ``wrf_pmc_init.F90:1339-1429``)."""

    density: jax.Array          # [S] kg m-3
    num_ions: jax.Array         # [S]
    molec_weight: jax.Array     # [S] kg mol-1
    kappa: jax.Array            # [S] hygroscopicity
    names: tuple = dataclasses.field(metadata=dict(static=True), default=())
    sources: tuple = dataclasses.field(metadata=dict(static=True), default=())
    weight_classes: tuple = dataclasses.field(metadata=dict(static=True), default=())

    @property
    def n_spec(self) -> int:
        return len(self.names)

    @property
    def i_water(self) -> int:
        return self.names.index("H2O")

    def spec_by_name(self, name: str) -> int:
        return self.names.index(name)

    def source_by_name(self, name: str) -> "tuple[AeroData, int]":
        """Return (possibly grown) AeroData and the source index."""
        if name in self.sources:
            return self, self.sources.index(name)
        return dataclasses.replace(self, sources=self.sources + (name,)), len(self.sources)

    def weight_class_by_name(self, name: str) -> "tuple[AeroData, int]":
        if name in self.weight_classes:
            return self, self.weight_classes.index(name)
        return (dataclasses.replace(self, weight_classes=self.weight_classes + (name,)),
                len(self.weight_classes))

    @property
    def dry_mask(self) -> jax.Array:
        """[S] 1.0 for every species except water (for dry diameter/mass)."""
        m = np.ones(self.n_spec, np.float32)
        m[self.i_water] = 0.0
        return jnp.asarray(m)


def make_aero_data(species=DEFAULT_SPECIES) -> AeroData:
    names = tuple(s[0] for s in species)
    f32 = lambda i: jnp.asarray([s[i] for s in species], jnp.float32)
    return AeroData(density=f32(1), num_ions=f32(2), molec_weight=f32(3),
                    kappa=f32(4), names=names)


def parse_aero_data_dat(text: str) -> AeroData:
    """Parse the reference's ``aero_data.dat`` spec-file format
    (``partmc`` spec_file: '#'-comment lines; rows of
    ``name density num_ions molec_weight kappa``)."""
    rows = []
    for line in text.splitlines():
        line = line.split("#")[0].strip()
        if not line:
            continue
        parts = line.split()
        rows.append((parts[0], float(parts[1]), int(float(parts[2])),
                     float(parts[3]), float(parts[4])))
    if not rows:
        raise ValueError("no species rows found")
    return make_aero_data(tuple(rows))


# --- per-particle property helpers (PartMC aero_particle equivalents) ---

def particle_volume(vol, dry: bool = False, aero_data: AeroData | None = None):
    """Total per-particle volume [..., P] from [..., S, P] composition."""
    if dry:
        return jnp.sum(vol * aero_data.dry_mask[..., :, None], axis=-2)
    return jnp.sum(vol, axis=-2)


def particle_mass(vol, aero_data: AeroData, dry: bool = False):
    rho = aero_data.density[..., :, None]
    if dry:
        rho = rho * aero_data.dry_mask[..., :, None]
    return jnp.sum(vol * rho, axis=-2)


def vol_to_diam(v):
    """Geometric (spherical) volume -> diameter; fractal_set_spherical is the
    reference configuration (``wrf_pmc_init.F90:150``)."""
    return jnp.cbrt(6.0 * v / jnp.pi)


def diam_to_vol(d):
    return (jnp.pi / 6.0) * d ** 3


def particle_density(vol, aero_data: AeroData):
    """Mean density of each particle [..., P]."""
    v = particle_volume(vol)
    m = particle_mass(vol, aero_data)
    return m / jnp.maximum(v, 1e-300)


def solute_kappa(vol, aero_data: AeroData):
    """Volume-weighted mean hygroscopicity over dry species [..., P]
    (kappa-Koehler mixing rule, Petters & Kreidenweis 2007; reference
    ``aero_state crit_rel_humids``)."""
    dry = aero_data.dry_mask[..., :, None]
    vd = jnp.sum(vol * dry, axis=-2)
    kv = jnp.sum(vol * dry * aero_data.kappa[..., :, None], axis=-2)
    return kv / jnp.maximum(vd, 1e-300)
