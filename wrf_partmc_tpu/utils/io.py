"""History / restart I/O.

Equivalent of the reference's I/O stack for the streams PartMC actually uses
(SURVEY L9, 5.4): WRF history+restart writes (``share/output_wrf.F``,
``wrf_restartout.F``) and the full particle-state files that double as
restarts (``output_column_to_file_new``, ``wrf_pmc_driver.F90:1292-1662``;
read back by ``init_read_in_restart``, ``wrf_pmc_init.F90:1084-1286``).

TPU-native redesign: one NetCDF (classic, via scipy) file per stream per
write, whole-domain arrays (the reference writes one file per column from
each rank; with device-global arrays a single gather-and-write is the
natural layout).  The particle restart schema carries the complete SoA
population including ``next_id`` so restarts are exact.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np

from ..models.coupled.driver import CoupledState


def _nc(path):
    from scipy.io import netcdf_file
    return netcdf_file(path, "w", version=2)


def write_history(path: str, cs: CoupledState, grid, cfg, diag=None) -> None:
    """WRF-style history file: prognostic fields + PartMC gridded
    diagnostics when provided (med_before_solve_io / partmc_process)."""
    f = _nc(path)
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    f.createDimension("z", nz)
    f.createDimension("z_stag", nz + 1)
    f.createDimension("y", ny)
    f.createDimension("x", nx)
    f.createDimension("class", cfg.n_class)
    f.createDimension("moist", cs.dyn.moist.shape[0])
    f.createDimension("gas", cs.gas.shape[-1])

    def var(name, dims, data):
        v = f.createVariable(name, "f", dims)
        v[:] = np.asarray(data, np.float32)

    var("U", ("z", "y", "x"), cs.dyn.u)
    var("V", ("z", "y", "x"), cs.dyn.v)
    var("W", ("z_stag", "y", "x"), cs.dyn.w)
    var("T", ("z", "y", "x"), cs.dyn.theta_p)        # theta perturbation (WRF 'T')
    var("P", ("z", "y", "x"), cs.dyn.p_p)
    var("QVAPOR", ("z", "y", "x"), cs.dyn.moist[0])
    var("NUM_CONC", ("class", "z", "y", "x"), cs.dyn.num_conc)
    var("ZH", ("z",), grid.z_half)
    if diag is not None:
        f.createDimension("bin", diag.num_dist.shape[-1])
        f.createDimension("spec", diag.spec_mass.shape[-1])
        f.createDimension("ccn_s", diag.ccn.shape[-1])
        var("num_dist", ("z", "y", "x", "bin"), diag.num_dist)
        var("mass_dist", ("z", "y", "x", "bin"), diag.mass_dist)
        var("spec_mass", ("z", "y", "x", "spec"), diag.spec_mass)
        var("chi", ("z", "y", "x"), diag.chi)
        var("d_alpha", ("z", "y", "x"), diag.d_alpha)
        var("d_gamma", ("z", "y", "x"), diag.d_gamma)
        var("ccn", ("z", "y", "x", "ccn_s"), diag.ccn)
        var("pm1", ("z", "y", "x"), diag.pm1)
        var("pm25", ("z", "y", "x"), diag.pm25)
        var("pm10", ("z", "y", "x"), diag.pm10)
        # do_advanced_process optical fields + internally-mixed counterfactual
        var("b_scat", ("z", "y", "x"), diag.b_scat)
        var("b_abs", ("z", "y", "x"), diag.b_abs)
        var("b_scat_mix", ("z", "y", "x"), diag.b_scat_mix)
        var("b_abs_mix", ("z", "y", "x"), diag.b_abs_mix)
        var("ccn_mix", ("z", "y", "x", "ccn_s"), diag.ccn_mix)
    f.flush()
    f.close()


_PARTICLE_FIELDS = ("vol", "num", "pid", "source", "w_class", "t_create")


def write_restart(path: str, cs: CoupledState, writer=None) -> None:
    """Full coupled-model restart (Eulerian + exact particle state +
    ``next_id``, the two-part restart of SURVEY 5.4) as one npz.

    With ``writer`` (a :class:`~wrf_partmc_tpu.utils.quilt.QuiltWriter`) the
    serialized bytes are handed to the native async quilt thread pool and
    this call returns without blocking on disk."""
    leaves, treedef = jax.tree.flatten(cs)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if writer is not None:
        writer.submit_npz(path, lambda buf: np.savez_compressed(
            buf, n_leaves=len(leaves), **arrs))
    else:
        np.savez_compressed(path, n_leaves=len(leaves), **arrs)


def read_restart(path: str, template: CoupledState) -> CoupledState:
    """Read a restart written by :func:`write_restart`; ``template`` supplies
    the pytree structure (configs/shapes must match, like WRF restarts)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"restart leaf {i} shape {arr.shape} != {np.shape(leaf)}")
        new_leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree.unflatten(treedef, new_leaves)


def write_particle_netcdf(path: str, cs: CoupledState, aero_data, grid,
                          with_optics: bool = False) -> None:
    """Reference-style particle-state NetCDF (the per-column schema of
    ``output_column_to_file_new`` flattened to whole-domain arrays):
    per-particle species masses, ids, weight classes, sources, create times,
    multiplicities, plus gas mix ratios and next_id.

    ``with_optics`` adds the per-particle optical state the reference's
    restart carries (``wrf_pmc_init.F90:1111-1272``: absorb/scatter
    cross-sections, asymmetry parameter, volume-mixed refractive index) —
    here derived from the Mie table at write time, identical to what a
    reader would recompute."""
    f = _nc(path)
    a = cs.aero
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    P = a.capacity
    S = a.vol.shape[-2]
    for name, n in (("z", nz), ("y", ny), ("x", nx), ("part", P), ("spec", S),
                    ("gas", cs.gas.shape[-1]), ("src_comp", a.n_src_comp)):
        f.createDimension(name, n)

    def var(name, dims, data, typ="f"):
        v = f.createVariable(name, typ, dims)
        v[:] = np.asarray(data)

    var("aero_particle_vol", ("z", "y", "x", "spec", "part"), a.vol)
    var("aero_num", ("z", "y", "x", "part"), a.num)
    var("aero_id", ("z", "y", "x", "part"), np.asarray(a.pid, np.int32), "i")
    var("aero_source", ("z", "y", "x", "part"), np.asarray(a.source, np.int32), "i")
    var("aero_weight_class", ("z", "y", "x", "part"),
        np.asarray(a.w_class, np.int32), "i")
    var("aero_create_time", ("z", "y", "x", "part"), a.t_create)
    # fixed-width source-component lists (the aero_component attribution the
    # reference restarts carry, wrf_pmc_init.F90:1111-1272)
    var("aero_comp_source", ("z", "y", "x", "src_comp", "part"),
        np.asarray(a.src_id, np.int32), "i")
    var("aero_comp_vol", ("z", "y", "x", "src_comp", "part"), a.src_vol)
    var("next_id", ("z", "y", "x"), np.asarray(a.next_id, np.int32), "i")
    var("gas_mixrat", ("z", "y", "x", "gas"), cs.gas)
    if with_optics:
        from ..models.partmc.optics import (WAVELENGTHS, per_particle_optics,
                                            particle_refractive_index)

        f.createDimension("band", len(WAVELENGTHS))
        c_sca, c_abs, g = jax.jit(
            lambda s: per_particle_optics(s, aero_data))(a)
        ri_n, ri_k = particle_refractive_index(a, aero_data)
        var("aero_scatter_xsec", ("band", "z", "y", "x", "part"), c_sca)
        var("aero_absorb_xsec", ("band", "z", "y", "x", "part"), c_abs)
        var("aero_asymmetry", ("band", "z", "y", "x", "part"), g)
        var("aero_refract_real", ("z", "y", "x", "part"), ri_n)
        var("aero_refract_imag", ("z", "y", "x", "part"), ri_k)
        f.optics_wavelengths_m = ",".join(str(w) for w in WAVELENGTHS).encode()
    f.aero_species = ",".join(aero_data.names).encode()
    f.flush()
    f.close()
