"""The coupled WRF-PartMC timestep.

TPU-native equivalent of the master loop hooks in
``frame/module_integrate.F:373-424`` and their targets:

  partmc_to_wrf -> solve_em -> partmc_from_wrf -> partmc_timestep
  -> wrf_pmc_trans_driver (+ dry deposition at the surface layer)

(call stack quoted in SURVEY 3.2).  One ``coupled_step`` is a single jittable
function of (CoupledState, step_key); the host loop only handles I/O alarms.

Unit conventions at the coupling surface (matching the reference):
  * chem gas tracers carry ppm; gas states carry ppb (x/1000 conversions at
    ``wrf_pmc_driver.F90:1663,1726``).
  * NUM_CONC class tracers carry number per kg of dry air (the reference's
    N x weight x alt coupling, ``:1710-1716``); particle populations carry
    absolute represented number per cell.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ...config import Config
from ...grid import Grid
from ...utils import rng
from ..dycore.solve import StepDiag, solve_step
from ..dycore.state import DycoreState, base_profiles, temperature, total_pressure
from ..partmc.aero_data import AeroData
from ..partmc.aero_state import AeroState, rebalance, zero_state
from ..partmc.coag import KERNEL_BROWN, coag_step
from ..partmc.condense import equilib_water, equilib_water_hyst
from ..partmc.deposition import aerodynamic_resistance, deposition_velocity
from ..partmc.env_state import EnvState
from ..partmc.gas_data import GasData
from ..partmc.scenario import Scenario, update_aero_state, update_gas_state
from ..physics.thermo import relative_humidity
from .transport import transport_step

import functools


@functools.lru_cache(maxsize=1)
def _cbmz_mechanism():
    from ..partmc.cbmz import build_mechanism

    return build_mechanism()


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CoupledState:
    dyn: DycoreState
    aero: AeroState          # cell shape (nz, ny, nx)
    gas: jax.Array           # [nz, ny, nx, G] ppb
    step: jax.Array          # scalar int32
    # slab-LSM soil state (sf_surface_physics=1); None otherwise
    land: object | None = None
    # cumulative per-cell represented-number removal counters by cause
    # (record_removals / aero_info_array equivalent); None when off
    removals: dict | None = None
    # MYJ level-2.5 prognostic twice-TKE at w levels [nz+1, ny, nx]
    # (bl_physics=2, module_bl_myjpbl.F equivalent); None otherwise
    pbl_q2: jax.Array | None = None


def cell_air_mass(dyn: DycoreState, grid: Grid):
    """[nz, ny, nx] dry-air mass per cell [kg] (get_grid_cell_volume +
    the x alt actual-density coupling, ``wrf_pmc_driver.F90:1710-1716,2002``).
    Under the mass-coordinate core this is exact: m = mu_d deta dA / g."""
    if dyn.mu is not None:
        mu_d = grid.mub + dyn.mu
        from ... import constants as c

        return (mu_d[None] * grid.deta.reshape(-1, 1, 1) / c.GRAV
                * (grid.dx * grid.dy))
    rho_b, _, _ = base_profiles(grid)
    return jnp.broadcast_to((grid.cell_volume * rho_b).reshape(-1, 1, 1),
                            dyn.theta_p.shape)


def cell_volume_3d(dyn: DycoreState, grid: Grid):
    """[nz, ny, nx] actual grid-cell volume [m3] from the geopotential
    (mass-coordinate core) or the base-state layer depths."""
    if dyn.ph is not None:
        from ... import constants as c

        phi = grid.phb + dyn.ph
        dz = (phi[1:] - phi[:-1]) / c.GRAV
        return dz * (grid.dx * grid.dy)
    return jnp.broadcast_to(grid.cell_volume.reshape(-1, 1, 1),
                            dyn.theta_p.shape)


def make_env(dyn: DycoreState, grid: Grid, cfg: Config, step,
             ustar=None) -> EnvState:
    """wrf_to_partmc: per-cell environment from the dycore state
    (``wrf_pmc_driver.F90:576-644``).  Without an explicit ``ustar`` (no
    surface-layer scheme active) the friction velocity is diagnosed from the
    first-level wind with the neutral log law — the reference always feeds a
    real u* from its surface layer (``wrf_pmc_dep.F90:31``)."""
    temp = temperature(dyn, grid)
    pres = total_pressure(dyn, grid)
    rh = relative_humidity(dyn.moist[0], temp, pres)
    vol = cell_volume_3d(dyn, grid).astype(jnp.float32)
    if ustar is None:
        from ... import constants as c
        from ...ops.stencil import AXIS_X, AXIS_Y, shift

        u1 = 0.5 * (dyn.u[0] + shift(dyn.u[0], 1, AXIS_X))
        v1 = 0.5 * (dyn.v[0] + shift(dyn.v[0], 1, AXIS_Y))
        spd = jnp.sqrt(u1 * u1 + v1 * v1)
        logz = jnp.log(jnp.maximum(
            grid.z_half[0] / cfg.dynamics.sfc_z0, 1.1))
        us2d = c.KARMAN * jnp.maximum(spd, 0.1) / logz
        ustar = jnp.broadcast_to(us2d, temp.shape).astype(jnp.float32)
    else:
        ustar = jnp.broadcast_to(jnp.asarray(ustar, jnp.float32), temp.shape)
    if dyn.ph is not None:
        from ... import constants as c

        phi = grid.phb + dyn.ph
        z = (0.5 * (phi[1:] + phi[:-1]) / c.GRAV).astype(jnp.float32)
    else:
        z = jnp.broadcast_to(grid.z_half.reshape(-1, 1, 1), temp.shape)
    return EnvState(temp=temp, pressure=pres, rel_humid=rh, height=z,
                    cell_volume=vol, ustar=ustar,
                    elapsed_time=jnp.asarray(step, jnp.float32) * cfg.dynamics.dt)


def partmc_to_wrf(cs: CoupledState, grid: Grid, cfg: Config) -> DycoreState:
    """Copy particle number (per class) and gases into the Eulerian tracers
    (``partmc_to_wrf``, ``wrf_pmc_driver.F90:1663-1716``).  The number
    tracers are coupled by the *actual* per-cell air mass (the reference's
    N x weight x alt with alt = 1/rho, not base-state density)."""
    air_mass = cell_air_mass(cs.dyn, grid)                        # [nz,ny,nx]
    nbc = cs.aero.num_by_class(cfg.n_class)                       # [nz,ny,nx,C]
    num_tr = jnp.moveaxis(nbc, -1, 0) / air_mass                  # [C,nz,ny,nx] #/kg
    chem = jnp.moveaxis(cs.gas, -1, 0) / 1000.0                   # ppb -> ppm
    return dataclasses.replace(cs.dyn, num_conc=num_tr.astype(jnp.float32),
                               chem=chem.astype(jnp.float32))


def partmc_from_wrf(dyn: DycoreState) -> jax.Array:
    """Advected gases back to the particle model (``:1726``), ppm -> ppb."""
    return jnp.moveaxis(dyn.chem, 0, -1) * 1000.0


def emission_step(aero: AeroState, gas, env: EnvState, aero_data: AeroData,
                  scn: Scenario, cfg: Config, grid: Grid, dyn: DycoreState,
                  t, key) -> tuple[AeroState, jax.Array]:
    """Per-WRF-dt scenario forcing: gas emissions/dilution, aerosol
    emissions/dilution, sea-salt surface source.  The reference applies
    these every WRF dt with ``grid%dt`` (``scenario_update_gas_state`` /
    ``scenario_update_aero_state`` / ``seasalt_emissions``,
    ``wrf_pmc_driver.F90:202-223``) while coagulation/MOSAIC run on
    ``partmc_chem_dt`` — emitting in chem-dt bursts would distort plume
    structure at dt << chem_dt."""
    pc = cfg.partmc
    dt = cfg.dynamics.dt
    k_scn, k_ss = jax.random.split(key)
    gas = update_gas_state(scn, gas, t, dt)
    if pc.do_emission:
        aero = update_aero_state(scn, aero, aero_data, t, dt, k_scn,
                                 pc.n_emit_slots, env.cell_volume)
    if pc.seasalt_param > 0:
        from ...ops.stencil import AXIS_X, AXIS_Y, shift
        from ..partmc.aero_state import add_particles
        from ..partmc.seasalt import sample_seasalt

        u_c = 0.5 * (dyn.u[0] + shift(dyn.u[0], 1, AXIS_X))
        v_c = 0.5 * (dyn.v[0] + shift(dyn.v[0], 1, AXIS_Y))
        u10 = jnp.sqrt(u_c ** 2 + v_c ** 2)                     # [ny, nx]
        cell_shape = aero.cell_shape
        u10_3d = jnp.broadcast_to(u10, cell_shape)
        spume = (cfg.partmc.seasalt_class_spume
                 if cfg.partmc.seasalt_class_spume >= 0 else None)
        vol, num, src, wcl = sample_seasalt(
            k_ss, aero_data, u10_3d, grid.dx * grid.dy, dt,
            pc.n_emit_slots, cell_shape, param=pc.seasalt_param,
            source=pc.seasalt_source,
            w_class=min(cfg.n_class - 1, pc.seasalt_class_film),
            w_class_spume=spume)
        k0 = jax.lax.broadcasted_iota(jnp.int32, num.shape, 0) == 0
        aero = add_particles(aero, vol, jnp.where(k0, num, 0.0), src, wcl,
                             time=t)
    return aero, gas


def microphysics_step(aero: AeroState, gas, env: EnvState, aero_data: AeroData,
                      gas_data: GasData, scn: Scenario, cfg: Config,
                      grid: Grid, dyn: DycoreState, t,
                      key, j_scale=None):
    """partmc_timestep chem-macro-step work (``wrf_pmc_driver.F90:169-254``):
    nucleation (optional), coagulation, gas/aerosol chemistry, water uptake.
    Scenario emissions run per-dt in :func:`emission_step`, not here.
    Returns (aero, gas, coag_removed) with the per-cell represented number
    removed by coagulation specifically (so the removal bookkeeping can
    attribute coag vs other chem causes)."""
    pc = cfg.partmc
    dt_chem = pc.partmc_chem_dt
    k_coag, k_scn, k_ss = jax.random.split(key, 3)
    coag_removed = jnp.zeros(env.temp.shape, jnp.float32)
    events = {}
    if pc.do_nucleation:
        from ..partmc.nucleate import nucleate_step

        aero, gas = nucleate_step(aero, gas, gas_data, aero_data, env.temp,
                                  env.pressure, env.cell_volume, dt_chem)
    if pc.do_coagulation:
        _n0 = aero.total_num()
        if pc.record_aero_info:
            # per-particle aero_info records (id, action=coag, other_id)
            aero, events = coag_step(aero, aero_data, env, dt_chem, k_coag,
                                     kernel=KERNEL_BROWN, return_events=True)
        else:
            aero = coag_step(aero, aero_data, env, dt_chem, k_coag,
                             kernel=KERNEL_BROWN)
        coag_removed = jnp.maximum(_n0 - aero.total_num(), 0.0)
    if pc.do_mosaic:
        if pc.chem_mech == "simple" or gas_data.n_spec < 77:
            from ..partmc.simple_chem import chem_step

            aero, gas = chem_step(aero, gas, gas_data, aero_data, env,
                                  dt_chem)
        else:
            from ..partmc.cbmz import cos_zenith
            from ..partmc.mosaic import mosaic_timestep

            dom = cfg.domain
            utc = dom.gmt * 3600.0 + t
            cosz = cos_zenith(dom.lat0, dom.lon0,
                              dom.julian_day + utc // 86400.0, utc % 86400.0)
            aero, gas = mosaic_timestep(
                _cbmz_mechanism(), aero, gas, gas_data, aero_data, env,
                dt_chem, cosz, n_sub_gas=pc.n_sub_gas,
                n_sub_astem=pc.n_sub_astem, j_scale=j_scale)
    if pc.do_condensation:
        if pc.condense_mode == "dynamic":
            from ..partmc.condense import condense_dynamic

            aero, _s = condense_dynamic(aero, aero_data, env, dt_chem)
        else:
            # hysteresis-aware MESA water path: per-particle leg persists
            # through transport/coag/restart (wrf_pmc_init.F90:1111-1272)
            aero = equilib_water_hyst(aero, aero_data, env)
    return aero, gas, coag_removed, events


def surface_deposition(aero: AeroState, env: EnvState, aero_data: AeroData,
                       grid: Grid, cfg: Config, key,
                       rmol=None, dz1=None) -> AeroState:
    """Dry deposition from the lowest model layer only, stochastic
    per-particle removal (``wrf_pmc_trans.F90:183-198`` -> wrf_pmc_dep*).
    ``rmol`` (1/Monin-Obukhov length, from the surface layer) enables the
    stability-corrected aerodynamic resistance the reference consumes
    (``wrf_pmc_dep.F90:31-101``).  ``dz1`` [ny, nx]: actual (geopotential-
    derived) first-layer depth — consistent with the transport operator over
    terrain; base-state fallback."""
    from ..partmc.aero_data import particle_mass, particle_volume

    diam = jnp.maximum(aero.wet_diameter(), 1e-9)
    pvol = particle_volume(aero.vol)
    mass = particle_mass(aero.vol, aero_data)
    rho_p = mass / jnp.maximum(pvol, 1e-300)
    z_ref = grid.z_half[0]
    r_a = aerodynamic_resistance(env, z_ref, z0=cfg.dynamics.sfc_z0,
                                 rmol=rmol)
    v_d = deposition_velocity(diam, rho_p, env, r_a)
    depth1 = grid.dz[0] if dz1 is None else dz1[None, :, :, None]
    p_rem = jnp.clip(v_d * cfg.dynamics.dt / depth1, 0.0, 1.0)
    k0 = jax.lax.broadcasted_iota(jnp.int32, aero.num.shape, 0) == 0
    p_rem = jnp.where(k0, p_rem, 0.0)
    u = jax.random.uniform(key, aero.num.shape)
    keep = (u >= p_rem) & aero.alive
    return dataclasses.replace(
        aero, num=jnp.where(keep, aero.num, 0.0),
        vol=jnp.where(keep[..., None, :], aero.vol, 0.0))


def _cell_local_sharded(mesh, fn, sharded, repl):
    """Run a cell-local particle op under ``shard_map`` over the 2-D
    ('y','x') mesh.  Cell-local ops (coagulation, chemistry, rebalance,
    deposition) flatten (nz, ny, nx) into one batch axis for the MXU place
    engine; plain GSPMD cannot propagate the 2-D sharding through that
    reshape and lowers it to a whole-population all-gather EVERY step
    (measured 0.5-3.2 GB/step at N=2..8, ``WEAKSCALING_r05.json``).
    shard_map keeps the flatten shard-local — the analogue of the
    reference's per-patch particle loops.

    ``sharded``: tuple of cell-field pytrees (leaves laid out
    [nz, ny, nx, ...], [ny, nx] or scalar); ``repl``: tuple of replicated
    pytrees (registries, scenario tables, grid, scalars, PRNG keys — keys
    are folded with the shard index so shards decorrelate).  ``fn`` is
    called as ``fn(*sharded, *repl)``."""
    if mesh is None:
        return fn(*sharded, *repl)
    from jax.sharding import PartitionSpec as PS

    def spec_of(a):
        nd = len(getattr(a, "shape", ()))
        if nd <= 1:
            return PS()
        if nd == 2:
            return PS("y", "x")
        return PS(None, "y", "x", *([None] * (nd - 3)))

    def is_key(a):
        try:
            return jnp.issubdtype(a.dtype, jax.dtypes.prng_key)
        except Exception:
            return False

    n_sh = len(sharded)

    def local(*args):
        sh, rp = args[:n_sh], args[n_sh:]
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        rp = jax.tree.map(lambda a: jax.random.fold_in(
            jax.random.fold_in(a, iy), ix) if is_key(a) else a, rp)
        return fn(*sh, *rp)

    in_specs = (tuple(jax.tree.map(spec_of, s) for s in sharded)
                + tuple(jax.tree.map(lambda a: PS(), r) for r in repl))
    out_specs = jax.tree.map(spec_of, jax.eval_shape(fn, *sharded, *repl))
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(
        *sharded, *repl)


def coupled_step(cs: CoupledState, grid: Grid, cfg: Config,
                 aero_data: AeroData, gas_data: GasData, scn: Scenario,
                 exch_h, base_seed_key, mesh=None, bdy=None,
                 diag_out: bool = False):
    """One full coupled timestep (one iteration of integrate's while loop).

    ``mesh``: optional 2-D ('y','x') jax.sharding.Mesh.  When given, particle
    transport runs the production sharded ICI face-buffer path
    (``transport_step_sharded``); dycore/chemistry stay GSPMD-sharded either
    way.

    ``diag_out``: also return the per-step transport saturation counters
    (overflow_class / overflow_free / movers) as a second output so the
    host loop can accumulate and surface them in history (the diag lives
    OUTSIDE the carried state: extra small carried leaves trip an aliasing
    bug in the axon TPU runtime under buffer donation)."""
    pc = cfg.partmc
    dt = cfg.dynamics.dt
    m_chem = max(1, int(round(pc.partmc_chem_dt / dt)))
    rem = dict(cs.removals) if cs.removals is not None else None

    def record(cause, before, after):
        # number-decreasing ops only: per-cell represented number removed
        if rem is not None:
            rem[cause] = rem[cause] + jnp.maximum(
                before.total_num() - after.total_num(), 0.0)
    keys = {s: rng.step_key(base_seed_key, cs.step, s)
            for s in (rng.STREAM_COAG, rng.STREAM_EMISSION,
                      rng.STREAM_TRANSPORT, rng.STREAM_DEPOSITION,
                      rng.STREAM_REBALANCE)}

    # partmc_to_wrf + dynamics/advection
    dyn = partmc_to_wrf(cs, grid, cfg)
    dyn2, diag = solve_step(dyn, grid, cfg)

    # specified + relaxation lateral BCs (wrfbdy contract; module_bc.F
    # spec/relax zones applied at solve_em.F:2586-2614)
    if bdy is not None:
        from .bdy import apply_specified_relax

        dyn2 = apply_specified_relax(dyn2, bdy, t_now := cs.step.astype(
            jnp.float32) * dt, grid, cfg)

    aero = cs.aero
    t = cs.step.astype(jnp.float32) * dt

    # surface layer + PBL diagnosis: replaces the prescribed exch_h/ustar
    # with flow-diagnosed fields every step.  bl_physics=1 is the nonlocal
    # YSU pair (sfclay + bl_ysu); bl_physics=2 the local MYJ TKE pair
    # (module_sf_myjsfc + module_bl_myjpbl) — the CARES d01 configuration
    # (namelist.input.cares:81,83)
    sfc_ustar = None
    sfc_rmol = None
    q2_new = cs.pbl_q2
    if cfg.dynamics.bl_physics in (1, 2):
        from ...ops.stencil import AXIS_X, AXIS_Y, shift
        from ..partmc.cbmz import cos_zenith

        dom = cfg.domain
        utc = dom.gmt * 3600.0 + t
        cosz = cos_zenith(dom.lat0, dom.lon0,
                          dom.julian_day + utc // 86400.0, utc % 86400.0)
        theta = grid.t_base.reshape(-1, 1, 1) + dyn2.theta_p
        u1 = 0.5 * (dyn2.u[0] + shift(dyn2.u[0], 1, AXIS_X))
        v1 = 0.5 * (dyn2.v[0] + shift(dyn2.v[0], 1, AXIS_Y))
        if cs.land is not None:
            # LSM skin theta (TSK -> theta at surface)
            from ... import constants as c

            exner_sfc = (grid.pb3[0] / c.P0) ** c.KAPPA
            thsfc = cs.land.tsk / exner_sfc
        else:
            thsfc = theta[0] + cfg.dynamics.sfc_heat_excess * jnp.maximum(
                cosz, -0.25)
        u3 = 0.5 * (dyn2.u + shift(dyn2.u, 1, AXIS_X))
        v3 = 0.5 * (dyn2.v + shift(dyn2.v, 1, AXIS_Y))
        if cfg.dynamics.bl_physics == 1:
            from ..physics.surface import (pbl_height, surface_layer,
                                           ysu_exch_h)

            sfc = surface_layer(u1, v1, theta[0], thsfc, grid.z_half[0],
                                z0=cfg.dynamics.sfc_z0)
            h_pbl = pbl_height(theta, grid.z_half, u=u3, v=v3)
            exch_h = ysu_exch_h(grid, sfc["ustar"], sfc["rmol"], h_pbl,
                                hfx_kin=sfc["hfx_kin"], theta=theta,
                                u=u3, v=v3)
        else:
            from ..physics.myj import myj_surface_layer, myj_tke_step

            sfc = myj_surface_layer(u1, v1, theta[0], thsfc, grid.z_half[0],
                                    z0=cfg.dynamics.sfc_z0)
            q2_new, exch_h, _exch_m = myj_tke_step(
                cs.pbl_q2, theta, u3, v3, grid, sfc["ustar"], dt)
        sfc_ustar = sfc["ustar"]
        sfc_rmol = sfc["rmol"]

    # implicit vertical diffusion of all Eulerian fields from the same
    # exch_h the particle vertical operator consumes (module_diffusion_em
    # vertical path, driven from first_rk_step_part1.F:840) — particles and
    # carrier gases mix through the same column operator
    if cfg.dynamics.vert_diff_fields and not cfg.dynamics.constant_velocity:
        from ...ops.vdiff import vertical_diffusion_state
        from ..dycore.state import base_profiles as _bp

        rho_b, _, _ = _bp(grid)
        kv = exch_h
        if cfg.dynamics.diff_opt == 1 and cfg.dynamics.kvdif > 0:
            kv = kv + cfg.dynamics.kvdif
        dyn2 = vertical_diffusion_state(dyn2, kv, grid, rho_b, dt)

    gas = partmc_from_wrf(dyn2)
    env = make_env(dyn2, grid, cfg, cs.step)
    if sfc_ustar is not None:
        env = dataclasses.replace(
            env, ustar=jnp.broadcast_to(sfc_ustar, env.temp.shape))

    # scenario forcing every dt (reference cadence: emissions with grid%dt,
    # wrf_pmc_driver.F90:202-223), chemistry/coagulation on chem_dt
    if pc.do_emission or pc.seasalt_param > 0:
        _a0 = aero
        aero, gas = emission_step(aero, gas, env, aero_data, scn, cfg, grid,
                                  dyn2, t, keys[rng.STREAM_EMISSION])
        record("dilution", _a0, aero)
    else:
        gas = update_gas_state(scn, gas, t, dt)
    # aerosol optics: consumed by the radiation direct effect AND (when
    # chemistry is on) by the photolysis actinic-flux attenuation — the
    # aerosol-photochemistry feedback the reference gets through TUV
    optics = None
    if pc.do_optical and cfg.dynamics.ra_physics in (1, 4):
        from ..partmc.optics import bulk_optical_props

        optics = bulk_optical_props(aero, aero_data, grid.dz,
                                    env.cell_volume)

    coag_events = {}
    if (pc.do_coagulation or pc.do_condensation
            or pc.do_nucleation or pc.do_mosaic):
        do_chem = (cs.step % m_chem) == 0
        zero3 = jnp.zeros(env.temp.shape, jnp.float32)

        j_scale = None
        if optics is not None and pc.do_mosaic:
            from ..partmc.cbmz import cos_zenith as _cosz
            from ..physics.radiation import photolysis_aerosol_factor

            dom = cfg.domain
            utc = dom.gmt * 3600.0 + t
            cz_now = _cosz(dom.lat0, dom.lon0,
                           dom.julian_day + utc // 86400.0, utc % 86400.0)
            j_scale = photolysis_aerosol_factor(
                optics.tauaer, optics.waer, optics.gaer, cz_now)

        def micro(args):
            a, g = args
            fn = lambda a_, g_, env_, js_, ad_, gd_, scn_, grid_, t_, k_: \
                microphysics_step(a_, g_, env_, ad_, gd_, scn_, cfg, grid_,
                                  None, t_, k_, j_scale=js_)
            return _cell_local_sharded(
                mesh, fn, (a, g, env, j_scale),
                (aero_data, gas_data, scn, grid, t, keys[rng.STREAM_COAG]))

        no_events = {}
        if pc.record_aero_info and pc.do_coagulation:
            n_pair = aero.capacity // 2
            no_events = {k: jnp.full((*env.temp.shape, n_pair), -1, jnp.int32)
                         for k in ("removed_id", "other_id")}
        _a0 = aero
        aero, gas, coag_rem, coag_events = lax.cond(
            do_chem, micro,
            lambda ag: (ag[0], ag[1], zero3, no_events), (aero, gas))
        # attribute coag-specific losses separately from the rest of the
        # chem macro-step (nucleation/MOSAIC/condensation number changes)
        if rem is not None:
            rem["coag"] = rem["coag"] + coag_rem
            rem["chem"] = rem["chem"] + jnp.maximum(
                _a0.total_num() - aero.total_num() - coag_rem, 0.0)

    # cumulus (cumulus_driver slot, first_rk_step_part1.F:1052): cu=2 is
    # the BMJ-class adjustment, cu=5 the Grell-class ensemble mass-flux
    # scheme CARES d01 configures (namelist.input.cares:85)
    if cfg.dynamics.cu_physics == 2:
        from ..physics.cumulus import bmj_step

        dyn2, _rainc = bmj_step(dyn2, grid, dt)
    elif cfg.dynamics.cu_physics == 5:
        from ..physics.grell import grell_step

        dyn2, _rainc = grell_step(dyn2, grid, dt)

    # radiation (radiation_driver at RK step 1 in the reference; the PartMC
    # aerosol direct effect enters through do_optical's tauaer/waer/gaer,
    # wrf_pmc_driver.F90:2025-2097)
    if cfg.dynamics.ra_physics in (1, 4):
        from ..partmc.cbmz import cos_zenith
        from ..physics.radiation import radiation_driver

        dom = cfg.domain
        utc = dom.gmt * 3600.0 + t
        cosz = cos_zenith(dom.lat0, dom.lon0,
                          dom.julian_day + utc // 86400.0, utc % 86400.0)
        rho_b, _, _ = base_profiles(grid)
        rho3 = jnp.broadcast_to(rho_b.reshape(-1, 1, 1), env.temp.shape)
        # optics computed once above (pre-chemistry state — the same
        # population the reference's do_optical pass sees at this step's
        # mosaic call, wrf_pmc_driver.F90:232-245)
        hr, _rad_diag = radiation_driver(
            temperature(dyn2, grid), dyn2.moist[0], rho3, grid.dz, cosz,
            t_sfc=(cs.land.tsk if cs.land is not None else None),
            optics=optics,
            lw_scheme="kdist" if cfg.dynamics.ra_physics == 4 else "gray",
            sw_scheme="kdist" if cfg.dynamics.ra_physics == 4 else "dudhia")
        dyn2 = dataclasses.replace(dyn2, theta_p=dyn2.theta_p + dt * hr)

        # LSM energy balance update (module_sf_slab for sf=1, the Noah-class
        # 4-layer soil for sf=2 — CARES d02; uses this step's radiation +
        # the surface layer's u*)
        if cs.land is not None and sfc_ustar is not None:
            from ... import constants as c
            from ..physics.lsm import noah_lsm_step, slab_lsm_step

            exner_sfc = (grid.pb3[0] / c.P0) ** c.KAPPA
            rho1 = rho3[0]
            th1 = grid.t_base[0] + dyn2.theta_p[0]
            lsm_args = (cs.land, _rad_diag["sw_sfc_down"],
                        _rad_diag["lw_sfc_down"], temperature(dyn2, grid)[0],
                        dyn2.moist[0][0], rho1, sfc_ustar, exner_sfc, th1, dt)
            if cfg.dynamics.sf_surface_physics == 2:
                # LANDUSE season columns by hemisphere + julian day (the
                # reference's landuse_init season switch: NH summer =
                # Apr 15 - Oct 15, reversed in the SH)
                nh_summer = 105 <= cfg.domain.julian_day <= 288
                season = ("summer" if (nh_summer if cfg.domain.lat0 >= 0
                                       else not nh_summer) else "winter")
                land2, _sfc_fluxes = noah_lsm_step(*lsm_args, season=season)
            else:
                land2, _sfc_fluxes = slab_lsm_step(*lsm_args)
        else:
            land2 = cs.land
    else:
        land2 = cs.land

    # stochastic transport (+ deposition at the surface layer); the vertical
    # operator consumes the actual geopotential-derived layer depths and
    # densities, not base-state flat-terrain values
    tdiag = None
    dz3 = None
    if pc.do_transport:
        vol3 = cell_volume_3d(dyn2, grid).astype(jnp.float32)
        rho3 = (cell_air_mass(dyn2, grid) / vol3).astype(jnp.float32)
        dz3 = vol3 / (grid.dx * grid.dy)
        _a0 = aero
        aero, tdiag = transport_step(aero, diag.probs, diag.xkhh, exch_h,
                                     grid, cfg, dt,
                                     keys[rng.STREAM_TRANSPORT],
                                     mesh=mesh, rho3=rho3, dz3=dz3,
                                     return_diag=True)
        if not (cfg.boundary.periodic_x and cfg.boundary.periodic_y):
            record("outflow", _a0, aero)

    # open lateral boundaries: inflow background resampling + gas BCs
    if not (cfg.boundary.periodic_x and cfg.boundary.periodic_y):
        from .boundary import apply_gas_open_bc, resample_inflow_particles

        bc_key = rng.step_key(base_seed_key, cs.step, rng.STREAM_BC)
        aero = resample_inflow_particles(aero, dyn2, scn, aero_data, grid,
                                         cfg, bc_key)
        gas = apply_gas_open_bc(gas, dyn2, scn, grid, cfg)
    if pc.do_deposition:
        _a0 = aero
        dep_fn = lambda a_, env_, rmol_, dz1_, ad_, grid_, k_: \
            surface_deposition(a_, env_, ad_, grid_, cfg, k_, rmol=rmol_,
                               dz1=dz1_)
        aero = _cell_local_sharded(
            mesh, dep_fn,
            (aero, env, sfc_rmol, dz3[0] if dz3 is not None else None),
            (aero_data, grid, keys[rng.STREAM_DEPOSITION]))
        record("deposition", _a0, aero)

    _a0 = aero
    reb_fn = lambda a_, k_: rebalance(a_, k_, pc.num_particles,
                                      pc.allow_halving, pc.allow_doubling)
    aero = _cell_local_sharded(mesh, reb_fn, (aero,),
                               (keys[rng.STREAM_REBALANCE],))
    record("halving", _a0, aero)

    out = CoupledState(dyn=dyn2, aero=aero, gas=gas, step=cs.step + 1,
                       land=land2, removals=rem, pbl_q2=q2_new)
    if diag_out:
        zero = jnp.zeros((), jnp.float32)
        dd = dict(tdiag if tdiag is not None else
                  {k: zero for k in ("overflow_class", "overflow_free",
                                     "movers")})
        if coag_events:
            dd["coag_removed_id"] = coag_events["removed_id"]
            dd["coag_other_id"] = coag_events["other_id"]
        return out, dd
    return out


def init_coupled(cfg: Config, grid: Grid, aero_data: AeroData,
                 gas_data: GasData, dyn: DycoreState,
                 ivgtyp=None, isltyp=None) -> CoupledState:
    aero = zero_state(aero_data, cfg.partmc.max_particles,
                      cell_shape=(grid.nz, grid.ny, grid.nx))
    gas = jnp.zeros((grid.nz, grid.ny, grid.nx, gas_data.n_spec), jnp.float32)
    land = None
    if cfg.dynamics.sf_surface_physics == 1:
        from ..physics.lsm import init_land

        t_sfc0 = float(jnp.asarray(grid.t_base)[0])   # theta ~ T at surface
        land = init_land(grid.ny, grid.nx, t_sfc0)
    elif cfg.dynamics.sf_surface_physics == 2:
        from ..physics.lsm import init_noah

        t_sfc0 = float(jnp.asarray(grid.t_base)[0])
        land = init_noah(grid.ny, grid.nx, t_sfc0, tbot=t_sfc0 - 3.0,
                         ivgtyp=ivgtyp, isltyp=isltyp)
    removals = None
    if cfg.partmc.record_removals:
        z3 = jnp.zeros((grid.nz, grid.ny, grid.nx), jnp.float32)
        removals = {k: z3 for k in ("dilution", "coag", "chem", "outflow",
                                    "deposition", "halving")}
    pbl_q2 = None
    if cfg.dynamics.bl_physics == 2:
        from ..physics.myj import init_q2

        pbl_q2 = init_q2(grid)
    return CoupledState(dyn=dyn, aero=aero, gas=gas,
                        step=jnp.asarray(0, jnp.int32), land=land,
                        removals=removals, pbl_q2=pbl_q2)


def run_coupled(cs: CoupledState, grid: Grid, cfg: Config,
                aero_data: AeroData, gas_data: GasData, scn: Scenario,
                exch_h, n_steps: int, seed: int = 0,
                mesh=None) -> CoupledState:
    key = rng.base_key(seed)

    def body(c, _):
        return coupled_step(c, grid, cfg, aero_data, gas_data, scn, exch_h,
                            key, mesh=mesh), None

    out, _ = lax.scan(body, cs, None, length=n_steps)
    return out
