#!/usr/bin/env python
"""Round-4 committed profile artifact (VERDICT r4 items 3 + 8).

Three sections:
1. **Dycore at the bench headline size** (128x128x40 live dynamics):
   measured time vs the XLA-reported bytes/flops of the compiled step
   (``compiled.cost_analysis()``) -> bytes-based roofline fraction and an
   MXU flops-based bound, so "near speed-of-light" is a measurement.
2. **Transport + coag matmul stages** at the em_uniform contract
   (40x40x10 @ 1000/cell): same cost-analysis-based utilization estimates.
3. **Chemistry stack split** (CBM-Z ROS2 / rate coeffs / ASTEM / SOA /
   water equilibrium) at the CARES chem-on point so the dominant section
   is identified and attacked.

Method: sections timed by feeding outputs back (axon memoizes identical
dispatches); XLA cost analysis read from the lowered+compiled executable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/wpmc_xla"))

import jax
import jax.numpy as jnp

HBM_BW = 819e9     # TPU v5e peak HBM bandwidth [B/s]
BF16_TF = 394e12   # peak bf16 MXU
F32_TF = 197e12


def cost_of(f, *args):
    """XLA-reported (flops, bytes) of the jitted f at these args."""
    try:
        comp = jax.jit(f).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = sum(v for k, v in ca.items()
                   if isinstance(v, (int, float)) and "bytes accessed" in k
                   and k != "bytes accessed")
        if byts == 0.0:
            byts = float(ca.get("bytes accessed", 0.0))
        return flops, byts
    except Exception:
        return 0.0, 0.0


def chain_time(f, x, n=4, donate=False):
    fj = jax.jit(f, donate_argnums=0 if donate else ())
    y = jax.block_until_ready(fj(x))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fj(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n, y


def section(res, name, t, flops, byts, note=None):
    d = {"time_s": round(t, 4)}
    if byts:
        d["xla_bytes"] = int(byts)
        d["roofline_frac_bytes"] = round(byts / HBM_BW / t, 3)
    if flops:
        d["xla_flops"] = int(flops)
        d["mxu_frac_bf16peak"] = round(flops / BF16_TF / t, 4)
        d["mxu_frac_f32peak"] = round(flops / F32_TF / t, 4)
    if note:
        d["note"] = note
    res["sections"][name] = d
    return d


def profile_dycore_bench_size(res):
    """128x128x40 live-dynamics solve_step — the bench headline."""
    from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    cfg = Config(domain=DomainConfig(nx=128, ny=128, nz=40, dx=2000.0,
                                     dy=2000.0),
                 dynamics=DynamicsConfig(dt=10.0, n_sound=4))
    grid = make_grid(cfg)
    state = init_warm_bubble(cfg, grid)

    f = lambda s: solve_step(s, grid, cfg)[0]
    flops, byts = cost_of(f, state)
    t, _ = chain_time(f, state, n=6, donate=True)
    d = section(res, "solve_step_128x128x40", t, flops, byts)
    d["grid_points_per_s"] = round(128 * 128 * 40 / t, 1)
    d["bound"] = ("memory(HBM)" if byts / HBM_BW > flops / F32_TF
                  else "compute")
    return d


def profile_transport_coag(res):
    """em_uniform contract: transport + coag with XLA cost analysis."""
    import dataclasses

    import __graft_entry__ as ge
    from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                       uniform_test_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled import driver as D
    from wrf_partmc_tpu.models.coupled import transport as T
    from wrf_partmc_tpu.models.dycore.solve import solve_step
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.coag import KERNEL_BROWN, coag_step
    from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h

    nx = ny = 40
    nz = 10
    n_part, cap = 1000, 1280
    step_fn, cs = ge._build(nx=nx, ny=ny, nz=nz, n_part=n_part, cap=cap,
                            chem_on=False)
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=2000.0),
        partmc=PartmcConfig(num_particles=n_part, max_particles=cap,
                            n_emit_slots=4, partmc_chem_dt=60.0,
                            do_coagulation=True, do_emission=True,
                            do_deposition=True, do_transport=True))
    cfg = cfg.replace(dynamics=dataclasses.replace(
        cfg.dynamics, constant_velocity=False), n_class=8)
    grid = make_grid(cfg)
    ad = make_aero_data()
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    key = jax.random.key(1)

    # full coupled step
    f = jax.jit(step_fn, donate_argnums=0)
    out = jax.block_until_ready(f(cs))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = f(out)
    jax.block_until_ready(out)
    t_step = (time.perf_counter() - t0) / n
    res["coupled_step_s"] = round(t_step, 4)
    res["alive_particles"] = int(jnp.sum(out.aero.num > 0))

    dyn = D.partmc_to_wrf(out, grid, cfg)
    _, diag = jax.jit(lambda d: solve_step(d, grid, cfg))(dyn)
    env = D.make_env(dyn, grid, cfg, out.step)
    aero0 = out.aero
    del cs, out

    tr = lambda a: T.transport_step(a, diag.probs, diag.xkhh, exch, grid,
                                    cfg, cfg.dynamics.dt, key)
    flops, byts = cost_of(tr, aero0)
    t_tr, aero_t = chain_time(tr, aero0, donate=True)
    section(res, "transport_step_1000ppc", t_tr, flops, byts,
            note="MXU one-hot rebucket (bf16x3 payload matmuls)")

    cg = lambda a: coag_step(a, ad, env, 60.0, key, kernel=KERNEL_BROWN)
    flops, byts = cost_of(cg, aero_t)
    t_cg, _ = chain_time(cg, aero_t, donate=True)
    d = section(res, "coag_step_1000ppc", t_cg, flops, byts)
    d["pair_evals_per_s"] = round(nx * ny * nz * (cap // 2) / t_cg, 1)
    res["summary_em_uniform"] = {
        "cell_steps_per_s": round(nx * ny * nz / t_step, 1),
        "transport_frac": round(t_tr / t_step, 3),
        "coag_amortized_frac": round(t_cg / 6.0 / t_step, 3)}


def profile_chem_split(res):
    """CBM-Z ROS2 / rates / ASTEM / SOA / water split (VERDICT r4 item 8)."""
    from wrf_partmc_tpu.models.coupled.driver import _cbmz_mechanism
    from wrf_partmc_tpu.models.partmc import mosaic as M
    from wrf_partmc_tpu.models.partmc.cbmz import (cbmz_step,
                                                   rate_coefficients,
                                                   ros2_substep)
    import dataclasses
    import __graft_entry__ as ge
    from wrf_partmc_tpu.models.coupled import driver as D
    from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                       uniform_test_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.gas_data import make_gas_data_cbmz
    from wrf_partmc_tpu.models.partmc.condense import equilib_water

    nx = ny = 40
    nz = 10
    n_part, cap = 100, 128
    step_fn, cs = ge._build(nx=nx, ny=ny, nz=nz, n_part=n_part, cap=cap,
                            chem_on=True, chem_dt=300.0)
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=2000.0),
        partmc=PartmcConfig(num_particles=n_part, max_particles=cap,
                            partmc_chem_dt=300.0, do_mosaic=True),
        n_chem_gas=77)
    grid = make_grid(cfg)
    ad = make_aero_data()
    gd = make_gas_data_cbmz()
    mech = _cbmz_mechanism()
    dyn = D.partmc_to_wrf(cs, grid, cfg)
    env = D.make_env(dyn, grid, cfg, cs.step)
    gas = cs.gas
    aero = cs.aero
    dt_chem = 300.0
    cosz = 0.5

    gfun = lambda g: cbmz_step(mech, g, env.temp, env.pressure,
                               env.rel_humid, cosz, dt_chem, n_sub=6)
    flops, byts = cost_of(gfun, gas)
    t_gas, _ = chain_time(gfun, gas)
    section(res, "chem_cbmz_ros2_x6", t_gas, flops, byts,
            note="6 ROS2 substeps: jacobian + 77x77 solve per cell")

    rfun = lambda T_: rate_coefficients(mech, T_, env.pressure,
                                        env.rel_humid, cosz)[..., 0]
    t_rate, _ = chain_time(lambda T_: T_ + 0.0 * rfun(T_), env.temp)
    res["sections"]["chem_rate_coefficients"] = {"time_s": round(t_rate, 4)}

    afun = lambda ag: M.astem_inorganic(ag[0], ag[1], gd, ad, env, dt_chem,
                                        n_sub=4)
    t_astem, ag = chain_time(afun, (aero, gas))
    flops, byts = cost_of(afun, (aero, gas))
    section(res, "chem_astem_inorganic_x4", t_astem, flops, byts)

    sfun = lambda ag: M.soa_partition(ag[0], ag[1], gd, ad, env, dt_chem)
    flops, byts = cost_of(sfun, ag)
    t_soa, _ = chain_time(sfun, ag)
    section(res, "chem_soa_partition", t_soa, flops, byts)

    wfun = lambda a: equilib_water(a, ad, env)
    flops, byts = cost_of(wfun, aero)
    t_wat, _ = chain_time(wfun, aero)
    section(res, "chem_equilib_water", t_wat, flops, byts)

    # full chem-on coupled step for the denominator
    f = jax.jit(step_fn, donate_argnums=0)
    out = jax.block_until_ready(f(cs))
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(out)
    jax.block_until_ready(out)
    t_step = (time.perf_counter() - t0) / 3
    res["summary_chem"] = {
        "chem_on_coupled_step_s": round(t_step, 4),
        "chem_on_cell_steps_per_s": round(nx * ny * nz / t_step, 1),
        "gas_frac_of_chem_step": round(t_gas / t_step, 3),
        "astem_frac": round(t_astem / t_step, 3),
        "soa_frac": round(t_soa / t_step, 3),
        "water_frac": round(t_wat / t_step, 3),
        "note": "chem sections run on the 1-in-30 chem-dt steps; coupled "
                "step shown is a chem-dt step (lax.cond true branch)"}


def main():
    res = {"device": str(jax.devices()[0]),
           "assumed_hbm_bw_GBps": HBM_BW / 1e9,
           "assumed_bf16_peak_TFLOPs": BF16_TF / 1e12,
           "sections": {}}
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dycore"):
        profile_dycore_bench_size(res)
    if which in ("all", "coupled"):
        profile_transport_coag(res)
    if which in ("all", "chem"):
        profile_chem_split(res)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r04.json")
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
