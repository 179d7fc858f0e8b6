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


class _NcOut:
    """NetCDF writer that either writes straight to ``path`` (writer=None)
    or serializes into memory and hands the bytes to the native async quilt
    pool — the quilting of WRF's dedicated output ranks
    (``frame/module_io_quilt.F``) applied to every output stream."""

    def __init__(self, path, writer=None):
        import io as _io

        from scipy.io import netcdf_file

        self.path = path
        self.writer = writer
        self.buf = _io.BytesIO() if writer is not None else None
        self.f = netcdf_file(self.buf if writer is not None else path,
                             "w", version=2)

    def close(self):
        self.f.flush()
        if self.writer is not None:
            self.writer.submit_bytes(self.path, self.buf.getvalue())
        self.f.close()


def write_history(path: str, cs: CoupledState, grid, cfg, diag=None,
                  writer=None, trans_diag=None) -> None:
    """WRF-style history file: prognostic fields + PartMC gridded
    diagnostics when provided (med_before_solve_io / partmc_process).
    ``trans_diag``: host-accumulated transport saturation counters
    (overflow_class / overflow_free / movers) written as trans_* scalars.
    With ``writer`` the encoded file goes through the async quilt pool."""
    out = _NcOut(path, writer)
    f = out.f
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
    if cs.removals is not None:
        for cause, arr in sorted(cs.removals.items()):
            var(f"removed_num_{cause}", ("z", "y", "x"), arr)
    if trans_diag is not None:
        # cumulative rebucket saturation counters: a production run can see
        # how often the number-conserving overflow paths fired
        for name, val in sorted(trans_diag.items()):
            f.createVariable(f"trans_{name}", "f", ())[...] = float(
                np.asarray(val))
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
        var("chi_sub", ("z", "y", "x"), diag.chi_sub)
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
    out.close()


_PARTICLE_FIELDS = ("vol", "num", "pid", "source", "w_class", "t_create")


def write_aero_removed(path: str, rows, writer=None) -> None:
    """Per-particle removal-record stream (the reference's aero_removed
    output of ``aero_info_array`` entries, action=AERO_INFO_COAG): each row
    is (step, flat cell index, removed particle id, surviving partner id).

    ``rows``: list of [n_i, 4] int arrays accumulated by the runner since
    the last history alarm."""
    all_rows = np.concatenate(rows, axis=0) if rows else np.zeros((0, 4), int)
    out = _NcOut(path, writer)
    f = out.f
    f.createDimension("event", max(all_rows.shape[0], 1))
    pad = np.full((max(all_rows.shape[0], 1), 4), -1, np.int32)
    pad[:all_rows.shape[0]] = all_rows
    for j, name in enumerate(("step", "cell", "removed_id", "other_id")):
        v = f.createVariable(f"aero_removed_{name}", "i", ("event",))
        v[:] = pad[:, j]
    f.n_events = np.int32(all_rows.shape[0])
    f.aero_removed_action = b"coag"
    out.close()


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
                          with_optics: bool = False, writer=None) -> None:
    """Reference-style particle-state NetCDF (the per-column schema of
    ``output_column_to_file_new`` flattened to whole-domain arrays):
    per-particle species masses, ids, weight classes, sources, create times,
    multiplicities, plus gas mix ratios and next_id.

    ``with_optics`` adds the per-particle optical state the reference's
    restart carries (``wrf_pmc_init.F90:1111-1272``: absorb/scatter
    cross-sections, asymmetry parameter, volume-mixed refractive index) —
    here derived from the Mie table at write time, identical to what a
    reader would recompute."""
    out = _NcOut(path, writer)
    f = out.f
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
    var("aero_water_hyst_leg", ("z", "y", "x", "part"),
        np.asarray(a.hyst_leg, np.int32), "i")
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
    out.close()


def read_particle_netcdf(path: str, template, aero_data=None):
    """Particle-state NetCDF -> (AeroState, gas): the portable restart read
    (``init_read_in_restart``, ``wrf_pmc_init.F90:1084-1286``).

    Unlike the npz pytree restart (same-shape only, like WRF binary
    restarts), this reads the *schema*: the template's particle capacity may
    differ from the file's.  Larger capacity pads with dead slots; smaller
    capacity keeps the largest-multiplicity particles per cell and rescales
    the survivors so represented number is exactly conserved (the same
    conservation backstop as transport rebucketing).  Species are matched
    by name against the file's ``aero_species`` attribute when
    ``aero_data`` is given."""
    import dataclasses as _dc

    import jax.numpy as jnp
    from scipy.io import netcdf_file

    f = netcdf_file(path, "r", mmap=False)
    g = lambda n: np.array(f.variables[n][:])
    vol = g("aero_particle_vol")                   # [z, y, x, S, Pf]
    num = g("aero_num")
    pid = g("aero_id")
    source = g("aero_source")
    w_class = g("aero_weight_class")
    t_create = g("aero_create_time")
    src_id = g("aero_comp_source")
    src_vol = g("aero_comp_vol")
    hyst_leg = (g("aero_water_hyst_leg")
                if "aero_water_hyst_leg" in f.variables
                else np.ones_like(np.array(f.variables["aero_num"][:]),
                                  np.int32))  # older files: upper leg
    next_id = g("next_id")
    gas = g("gas_mixrat")
    names_file = getattr(f, "aero_species", b"").decode().split(",")
    f.close()

    if aero_data is not None and names_file and names_file[0]:
        # species permutation by name (missing species -> zero volume)
        S_t = aero_data.n_spec
        vol_t = np.zeros(vol.shape[:-2] + (S_t, vol.shape[-1]), vol.dtype)
        for i_f, name in enumerate(names_file):
            if name in aero_data.names:
                vol_t[..., aero_data.names.index(name), :] = vol[..., i_f, :]
        vol = vol_t

    a = template.aero
    P_t = a.capacity
    P_f = num.shape[-1]
    if P_f != P_t:
        order = np.argsort(-num, axis=-1)          # largest multiplicity first
        take = order[..., :min(P_f, P_t)]
        tot = num.sum(axis=-1)
        vol = np.take_along_axis(vol, take[..., None, :], axis=-1)
        src_id = np.take_along_axis(src_id, take[..., None, :], axis=-1)
        src_vol = np.take_along_axis(src_vol, take[..., None, :], axis=-1)
        num = np.take_along_axis(num, take, axis=-1)
        pid = np.take_along_axis(pid, take, axis=-1)
        source = np.take_along_axis(source, take, axis=-1)
        w_class = np.take_along_axis(w_class, take, axis=-1)
        t_create = np.take_along_axis(t_create, take, axis=-1)
        hyst_leg = np.take_along_axis(hyst_leg, take, axis=-1)
        if P_f > P_t:
            kept = num.sum(axis=-1)
            scale = np.where(kept > 0, tot / np.maximum(kept, 1e-300), 1.0)
            num = num * scale[..., None]
        else:
            pad = P_t - P_f

            def zpad(arr, fill=0):
                w = [(0, 0)] * (arr.ndim - 1) + [(0, pad)]
                return np.pad(arr, w, constant_values=fill)

            vol, num, pid = zpad(vol), zpad(num), zpad(pid)
            source, w_class, t_create = zpad(source), zpad(w_class), zpad(t_create)
            src_id, src_vol = zpad(src_id, -1), zpad(src_vol)
            hyst_leg = zpad(hyst_leg, 1)

    K_t = a.n_src_comp
    K_f = src_id.shape[-2]
    if K_f > K_t:
        src_id, src_vol = src_id[..., :K_t, :], src_vol[..., :K_t, :]
    elif K_f < K_t:
        padk = [(0, 0)] * (src_id.ndim - 2) + [(0, K_t - K_f), (0, 0)]
        src_id = np.pad(src_id, padk, constant_values=-1)
        src_vol = np.pad(src_vol, padk)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    aero = _dc.replace(
        a, vol=f32(vol), num=f32(num), pid=i32(pid), source=i32(source),
        w_class=i32(w_class), t_create=f32(t_create), next_id=i32(next_id),
        src_id=i32(src_id), src_vol=f32(src_vol), hyst_leg=i32(hyst_leg))
    return aero, f32(gas)


_DYN_RESTART_FIELDS = ("u", "v", "w", "theta_p", "p_p", "moist", "chem",
                       "num_conc", "tke", "mu", "ph")


def write_restart_netcdf(path: str, cs: CoupledState, aero_data, grid,
                         writer=None) -> None:
    """Portable restart: the particle NetCDF schema plus the named dycore
    prognostics and step counter in one file — readable across particle
    capacities (and, being whole-domain, across decompositions), unlike the
    exact-shape npz.  The reference's restart is the same NetCDF-schema
    design (``wrf_pmc_init.F90:1084-1286``)."""
    write_particle_netcdf(path, cs, aero_data, grid, writer=writer)
    # append dycore fields to the same file (scipy can't append; re-open and
    # rewrite is costlier than writing a sibling) -> one sibling file
    out = _NcOut(path + ".dyn", writer)
    f = out.f
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    for name, n in (("z", nz), ("z_stag", nz + 1), ("y", ny), ("x", nx),
                    ("moist", cs.dyn.moist.shape[0]),
                    ("gas_adv", cs.dyn.chem.shape[0]),
                    ("class", cs.dyn.num_conc.shape[0])):
        f.createDimension(name, n)
    dims3 = {"z": ("z", "y", "x"), "z_stag": ("z_stag", "y", "x")}

    def var(name, dims, data):
        v = f.createVariable(name, "f", dims)
        v[:] = np.asarray(data, np.float32)

    for name in _DYN_RESTART_FIELDS:
        val = getattr(cs.dyn, name)
        if val is None:
            continue
        if name == "moist":
            var(name, ("moist",) + dims3["z"], val)
        elif name == "chem":
            var(name, ("gas_adv",) + dims3["z"], val)
        elif name == "num_conc":
            var(name, ("class",) + dims3["z"], val)
        elif name in ("w", "ph"):
            var(name, dims3["z_stag"], val)
        elif name == "mu":
            var(name, ("y", "x"), val)
        else:
            var(name, dims3["z"], val)
    # physics state: LSM (slab LandState or Noah 4-layer NoahState —
    # serialized generically by dataclass field so every prognostic soil
    # variable round-trips, mirroring the reference's full restart,
    # ``share/wrf_restartin.F``), MYJ TKE, removal accumulators
    if cs.land is not None:
        f.land_type = type(cs.land).__name__.encode()
        f.createDimension("soil", 8)     # generous static soil-layer dim
        for fld in dataclasses.fields(cs.land):
            val = np.asarray(getattr(cs.land, fld.name))
            typ = "i" if val.dtype.kind == "i" else "f"
            if val.ndim == 2:
                v = f.createVariable(f"land_{fld.name}", typ, ("y", "x"))
                v[:] = val
            else:                        # [n_layer, ny, nx]
                v = f.createVariable(f"land_{fld.name}", typ,
                                     ("soil", "y", "x"))
                buf = np.zeros((8, *val.shape[1:]), val.dtype)
                buf[:val.shape[0]] = val
                v[:] = buf
                f.__setattr__(f"land_{fld.name}_nlayer", np.int32(
                    val.shape[0]))
    if cs.pbl_q2 is not None:            # MYJ level-2.5 twice-TKE
        var("pbl_q2", dims3["z_stag"], cs.pbl_q2)
    if cs.removals is not None:          # cumulative removal counters
        for cause, arr in sorted(cs.removals.items()):
            var(f"removed_num_{cause}", dims3["z"], arr)
    f.step = int(cs.step)
    out.close()


def read_restart_netcdf(path: str, template: CoupledState, aero_data=None):
    """Read a :func:`write_restart_netcdf` pair back into a CoupledState
    shaped like ``template`` (particle capacity may differ)."""
    import jax.numpy as jnp
    from scipy.io import netcdf_file

    aero, gas = read_particle_netcdf(path, template, aero_data)
    f = netcdf_file(path + ".dyn", "r", mmap=False)
    dyn = template.dyn
    kw = {}
    for name in _DYN_RESTART_FIELDS:
        if name in f.variables and getattr(dyn, name) is not None:
            kw[name] = jnp.asarray(np.array(f.variables[name][:]),
                                   jnp.float32)
    step = int(getattr(f, "step", 0))
    land = template.land
    if land is not None:
        lkw = {}
        for fld in dataclasses.fields(land):
            name = f"land_{fld.name}"
            legacy = fld.name if fld.name in ("tsk", "t_deep") else None
            if name in f.variables:
                raw = np.array(f.variables[name][:])
            elif legacy and legacy in f.variables:   # pre-r5 slab files
                raw = np.array(f.variables[legacy][:])
            else:
                continue
            tmpl = np.asarray(getattr(land, fld.name))
            if raw.ndim == 3:                        # stored in padded soil dim
                nl = int(getattr(f, f"land_{fld.name}_nlayer", tmpl.shape[0]))
                raw = raw[:nl]
            lkw[fld.name] = jnp.asarray(raw, tmpl.dtype)
        land = dataclasses.replace(land, **lkw)
    pbl_q2 = template.pbl_q2
    if pbl_q2 is not None and "pbl_q2" in f.variables:
        pbl_q2 = jnp.asarray(np.array(f.variables["pbl_q2"][:]), jnp.float32)
    removals = template.removals
    if removals is not None:
        removals = {
            cause: (jnp.asarray(np.array(
                f.variables[f"removed_num_{cause}"][:]), jnp.float32)
                if f"removed_num_{cause}" in f.variables else arr)
            for cause, arr in removals.items()}
    f.close()
    dyn = dataclasses.replace(dyn, **kw)
    return dataclasses.replace(template, dyn=dyn, aero=aero, gas=gas,
                               step=jnp.asarray(step, jnp.int32), land=land,
                               pbl_q2=pbl_q2, removals=removals)
