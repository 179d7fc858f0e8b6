"""Top-level model runner — the ``wrf.exe`` equivalent.

Mirrors ``main/wrf.F`` / ``main/module_wrf_top.F:429`` (wrf_init -> wrf_run)
and the alarm-driven host loop of ``frame/module_integrate.F``: the device
executes jitted coupled steps in chunks; the host only handles clock alarms
(history / auxhist2 aerosol diagnostics / restart — SURVEY 5.4-5.5), section
timers and the memory tracker.

Usage:
    python -m wrf_partmc_tpu.run --namelist namelist.input --case uniform \
        --outdir out/
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, namelist_to_config, uniform_test_config
from .grid import make_grid
from .models.coupled.driver import (CoupledState, coupled_step, init_coupled,
                                    make_env)
from .models.coupled.init import populate_from_dist, populate_from_number_field
from .models.dycore.ideal import (init_rotational, init_scm, init_uniform,
                                  init_warm_bubble)
from .models.partmc.aero_data import make_aero_data
from .models.partmc.bin_grid import make_bin_grid
from .models.partmc.diagnostics import process
from .models.partmc.dist import make_mode
from .models.partmc.gas_data import make_gas_data
from .models.partmc.scenario import constant_scenario
from .models.physics.pbl import k_profile_exch_h
from .utils import rng
from .utils.clock import Clock
from .utils.io import write_history, write_particle_netcdf, write_restart, read_restart
from .utils.namelist import load_namelist
from .utils.quilt import QuiltWriter
from .utils.timing import SectionTimers, memtrack_mb

CASES = {
    "uniform": init_uniform,
    "rotational": init_rotational,
    "warm_bubble": init_warm_bubble,
    "scm": init_scm,
}


def build_model(cfg: Config, case: str = "uniform", seed: int = 0,
                input_files: dict | None = None):
    """input_files: optional {"ics": path, "emissions": path, "bcs": path,
    "wrfinput": path} — the file-driven init branch of ``init_wrf_partmc``
    (per-cell NetCDF IC/BC/emission contract, ``wrf_pmc_init.F90:284-379``)
    plus the real_em on-ramp (``main/real_em.F``) when "wrfinput" is set
    (case is then ignored for the dycore state)."""
    ad = make_aero_data()
    gd = make_gas_data()
    vf = np.zeros(ad.n_spec)
    vf[ad.spec_by_name("SO4")] = 1.0
    if input_files and input_files.get("wrfinput"):
        from .models.dycore.real import init_real

        grid, dyn, sfc_cat = init_real(cfg, input_files["wrfinput"])
    else:
        grid = make_grid(cfg)
        dyn = CASES[case](cfg, grid)
        sfc_cat = {}
    if input_files and input_files.get("spec"):
        from .models.coupled.init import init_from_spec

        cs = init_coupled(cfg, grid, ad, gd, dyn,
                          ivgtyp=sfc_cat.get("ivgtyp"),
                          isltyp=sfc_cat.get("isltyp"))
        aero, gas0, scenario_fn = init_from_spec(
            ad, gd, cfg, grid, rng.base_key(seed), input_files["spec"])
        cs = dataclasses.replace(cs, aero=aero, gas=gas0)
        exch = k_profile_exch_h(grid, 0.4, 800.0)
        return grid, ad, gd, scenario_fn(0.0), cs, exch, scenario_fn
    cs = init_coupled(cfg, grid, ad, gd, dyn,
                      ivgtyp=sfc_cat.get("ivgtyp"),
                      isltyp=sfc_cat.get("isltyp"))
    scenario_fn = None
    if input_files and input_files.get("ics"):
        from .models.coupled.init import init_from_files

        aero, scenario_fn = init_from_files(
            ad, gd.n_spec, cfg, grid, rng.base_key(seed), input_files["ics"],
            input_files.get("emissions"), input_files.get("bcs"))
        scn = scenario_fn(0.0)
    elif (case in ("uniform", "rotational")
          and not (input_files and input_files.get("wrfinput"))):
        scn = constant_scenario(ad, gd.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
        aero = populate_from_number_field(ad, cfg, grid, dyn.num_conc[0],
                                          rng.base_key(seed))
    else:
        scn = constant_scenario(ad, gd.n_spec, make_mode(0.0, 1e-7, 1.6, vf))
        ic = make_mode(1e9, 1e-7, 1.6, vf)
        aero = populate_from_dist(ad, cfg, grid, ic, rng.base_key(seed))
    cs = dataclasses.replace(cs, aero=aero)
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    return grid, ad, gd, scn, cs, exch, scenario_fn


def run(cfg: Config, case: str, outdir: str, seed: int = 0,
        restart_path: str | None = None, verbose: bool = True,
        input_files: dict | None = None,
        restart_format: str = "npz"):
    os.makedirs(outdir, exist_ok=True)
    grid, ad, gd, scn, cs, exch, scenario_fn = build_model(cfg, case, seed,
                                                           input_files)
    if restart_path:   # do_restart=.true. path: exact particle+field state
        if restart_path.endswith(".nc"):   # portable NetCDF-schema restart
            from .utils.io import read_restart_netcdf

            cs = read_restart_netcdf(restart_path, cs, ad)
        else:
            cs = read_restart(restart_path, cs)
    key = rng.base_key(cfg.partmc.random_seed or seed)
    bg = make_bin_grid(cfg.partmc.num_bins, cfg.partmc.bin_d_min,
                       cfg.partmc.bin_d_max)

    tc = cfg.time_control
    clock = Clock(dt=cfg.dynamics.dt, t_stop=tc.run_seconds,
                  step=int(cs.step))
    clock.add_alarm("history", tc.history_interval_s)
    clock.add_alarm("auxhist2", tc.auxhist2_interval_s)
    clock.add_alarm("restart", tc.restart_interval_s)
    timers = SectionTimers()
    quilt = QuiltWriter()

    # scenario passed as a jit ARGUMENT (static shapes, no retrace) so the
    # host can swap BC time slabs, mirroring the reference's BC time-index
    # change trigger (wrf_pmc_trans_aero.F90:824-838).  The per-step
    # transport saturation counters come back as a separate output and are
    # accumulated host-side (kept out of the carried state).
    step1 = jax.jit(lambda c, s: coupled_step(c, grid, cfg, ad, gd, s, exch,
                                              key, diag_out=True))
    tdiag_acc = {k: 0.0 for k in ("overflow_class", "overflow_free",
                                  "movers")}
    _warned_overflow = False
    # per-particle coagulation removal records (aero_info equivalent),
    # compressed host-side to (step, cell, removed_id, other_id) rows and
    # flushed to their own stream at each history alarm; the [cells, P/2]
    # event arrays only carry data on chem macro-steps, so the host pull
    # is skipped off-cadence (ADVICE r4 #4)
    aero_info_rows = []
    m_chem = max(1, int(round(cfg.partmc.partmc_chem_dt / cfg.dynamics.dt)))

    n_hist = 0
    while not clock.done():
        if scenario_fn is not None:
            scn = scenario_fn(clock.t)
        if clock.ringing("auxhist2"):
            with timers.section("partmc_process"):
                env = make_env(cs.dyn, grid, cfg, cs.step)
                diag = jax.jit(lambda a: process(
                    a, ad, env, bg,
                    advanced=cfg.partmc.do_advanced_process))(cs.aero)
        else:
            diag = None
        if clock.ringing("history"):
            with timers.section("history_write"):
                write_history(os.path.join(outdir, f"wrfout_{clock.step:06d}.nc"),
                              cs, grid, cfg, diag, writer=quilt,
                              trans_diag=(tdiag_acc
                                          if cfg.partmc.do_transport
                                          else None))
                write_particle_netcdf(
                    os.path.join(outdir, f"partmc_{clock.step:06d}.nc"),
                    cs, ad, grid, with_optics=cfg.partmc.do_optical,
                    writer=quilt)
                if aero_info_rows:
                    from .utils.io import write_aero_removed

                    write_aero_removed(
                        os.path.join(outdir,
                                     f"aero_removed_{clock.step:06d}.nc"),
                        aero_info_rows, writer=quilt)
                    aero_info_rows = []
                n_hist += 1
        if clock.step > 0 and clock.ringing("restart"):
            with timers.section("restart_write"):
                if restart_format == "netcdf":     # portable (capacity- and
                    from .utils.io import write_restart_netcdf

                    write_restart_netcdf(          # decomposition-agnostic)
                        os.path.join(outdir, f"restart_{clock.step:06d}.nc"),
                        cs, ad, grid, writer=quilt)
                else:                              # bitwise npz
                    write_restart(
                        os.path.join(outdir, f"restart_{clock.step:06d}.npz"),
                        cs, writer=quilt)
        with timers.section("coupled_step"):
            was_chem_step = (clock.step % m_chem) == 0
            cs, step_td = step1(cs, scn)
            cs = jax.block_until_ready(cs)
            for k_ in tdiag_acc:
                tdiag_acc[k_] += float(step_td[k_])
            # mover-cap saturation warning (ADVICE r4 #1): a high
            # overflow_class fraction means the conserving rescale is
            # biasing mixing-state diversity — raise trans_cap_v
            if (not _warned_overflow and tdiag_acc["movers"] > 0
                    and tdiag_acc["overflow_class"]
                    > 0.02 * tdiag_acc["movers"]):
                print("WARNING: transport mover-cap overflow exceeds 2% of "
                      f"movers ({tdiag_acc['overflow_class']:.0f} of "
                      f"{tdiag_acc['movers']:.0f}); consider raising "
                      "partmc.trans_cap_v (e.g. 2*num_particles/nz) for "
                      "this regime")
                _warned_overflow = True
            if "coag_removed_id" in step_td and was_chem_step:
                import numpy as _np

                rid = _np.asarray(step_td["coag_removed_id"])
                oid = _np.asarray(step_td["coag_other_id"])
                cell, pair = _np.nonzero(rid.reshape(-1, rid.shape[-1]) >= 0)
                if cell.size:
                    aero_info_rows.append(_np.stack(
                        [_np.full(cell.size, clock.step), cell,
                         rid.reshape(-1, rid.shape[-1])[cell, pair],
                         oid.reshape(-1, oid.shape[-1])[cell, pair]], axis=1))
        clock.advance()
        if verbose and clock.step % 50 == 0:
            print(f"step {clock.step}  t={clock.t:.0f}s  maxrss={memtrack_mb():.0f} MB")

    if aero_info_rows:     # flush records accumulated since the last alarm
        from .utils.io import write_aero_removed

        write_aero_removed(
            os.path.join(outdir, f"aero_removed_{clock.step:06d}.nc"),
            aero_info_rows, writer=quilt)
    write_restart(os.path.join(outdir, "restart_final.npz"), cs)
    quilt.flush()
    if verbose:
        print("Timing summary:")
        print(timers.report())
    return cs, timers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--namelist", help="WRF-style namelist.input")
    ap.add_argument("--case", default="uniform", choices=sorted(CASES))
    ap.add_argument("--outdir", default="wrfout")
    ap.add_argument("--steps", type=int, help="override run length in steps")
    ap.add_argument("--restart", help="restart npz to resume from")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ics", help="IC NetCDF (tools/make_inputs.py contract)")
    ap.add_argument("--emissions", help="emission time-series NetCDF")
    ap.add_argument("--bcs", help="lateral-BC background NetCDF")
    ap.add_argument("--spec", help="PartMC scenario .spec file")
    ap.add_argument("--wrfinput",
                    help="wrfinput-like NetCDF (real_em on-ramp)")
    args = ap.parse_args(argv)

    if args.namelist:
        cfg = namelist_to_config(load_namelist(args.namelist))
    else:
        cfg = uniform_test_config()
    if args.steps:
        cfg = cfg.replace(time_control=dataclasses.replace(
            cfg.time_control, run_seconds=args.steps * cfg.dynamics.dt))
    from .config import validate_config

    validate_config(cfg)          # check_a_mundo at startup
    files = {"ics": args.ics, "emissions": args.emissions, "bcs": args.bcs,
             "wrfinput": args.wrfinput, "spec": args.spec}
    cs, _ = run(cfg, args.case, args.outdir, args.seed, args.restart,
                input_files=files if any(files.values()) else None)
    print(json.dumps({"steps": int(cs.step),
                      "total_particles": float(cs.aero.total_num().sum())}))


if __name__ == "__main__":
    main()
