#!/usr/bin/env python
"""Per-section profile of the coupled step at the em_uniform reference
problem (1000 particles/cell) with bytes-moved roofline fractions — the
committed PROFILE artifact (VERDICT r2 item 1).

Measurement method: every section is timed by feeding its own output back
(the axon runtime memoizes identical dispatches, so same-input repetition
measures nothing); dispatch amortized over chained calls.
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
BF16_TF = 394e12


def chain_time(f, x, n=4, donate=False):
    f = jax.jit(f, donate_argnums=0 if donate else ())
    y = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n, y


def tree_bytes(t):
    return sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(t)
               if hasattr(a, "size"))


def main():
    import dataclasses

    import __graft_entry__ as ge
    from wrf_partmc_tpu.models.coupled import driver as D
    from wrf_partmc_tpu.models.coupled import transport as T
    from wrf_partmc_tpu.models.dycore.solve import solve_step
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    from wrf_partmc_tpu.models.partmc.coag import KERNEL_BROWN, coag_step
    from wrf_partmc_tpu.config import DomainConfig, PartmcConfig, uniform_test_config
    from wrf_partmc_tpu.grid import make_grid
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
        cfg.dynamics, constant_velocity=False))
    cfg = cfg.replace(n_class=8)
    grid = make_grid(cfg)
    ad = make_aero_data()
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    key = jax.random.key(1)

    res = {"problem": f"em_uniform {nx}x{ny}x{nz} @ {n_part} particles/cell "
                      f"(cap {cap})",
           "device": str(jax.devices()[0]),
           "assumed_hbm_bw_GBps": HBM_BW / 1e9,
           "sections": {}}

    state_b = tree_bytes(cs.aero)

    # full coupled step (chem-off steady steps)
    f = jax.jit(step_fn, donate_argnums=0)
    out = jax.block_until_ready(f(cs))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = f(out)
    jax.block_until_ready(out)
    t_step = (time.perf_counter() - t0) / n
    alive = float(jnp.sum(out.aero.num > 0))
    res["coupled_step_s"] = round(t_step, 4)
    res["alive_particles"] = int(alive)
    res["particle_steps_per_s"] = round(alive / t_step, 1)

    cs2 = out
    del cs, out

    # dycore alone
    dyn = D.partmc_to_wrf(cs2, grid, cfg)
    t_dyn, dyn2 = chain_time(lambda d: solve_step(d, grid, cfg)[0], dyn)
    _, diag = jax.jit(lambda d: solve_step(d, grid, cfg))(dyn)
    fb = dyn.theta_p.size * 4
    n_fields = (3 + dyn.moist.shape[0] + dyn.chem.shape[0]
                + dyn.num_conc.shape[0])
    dyc_bytes = n_fields * fb * 8      # ~8 passes/field (RK3+acoustic+adv)
    res["sections"]["solve_step"] = {
        "time_s": round(t_dyn, 4), "approx_bytes": dyc_bytes,
        "roofline_frac": round(dyc_bytes / HBM_BW / t_dyn, 3)}

    # transport (payload moves ~4x: pack, T1, T2+merge, unpack)
    env = D.make_env(dyn2, grid, cfg, cs2.step)
    aero0 = cs2.aero
    step_idx = cs2.step
    del cs2
    t_tr, aero_t = chain_time(
        lambda a: T.transport_step(a, diag.probs, diag.xkhh, exch, grid, cfg,
                                   cfg.dynamics.dt, key), aero0, donate=True)
    tr_bytes = state_b * 4
    res["sections"]["transport_step"] = {
        "time_s": round(t_tr, 4), "approx_bytes": tr_bytes,
        "roofline_frac": round(tr_bytes / HBM_BW / t_tr, 3),
        "note": "MXU one-hot rebucket; bf16x3 matmul flops additional"}

    # coagulation (chem-dt cadence)
    t_cg, _ = chain_time(
        lambda a: coag_step(a, ad, env, 60.0, key, kernel=KERNEL_BROWN),
        aero_t, donate=True)
    cg_bytes = state_b * 3
    res["sections"]["coag_step"] = {
        "time_s": round(t_cg, 4), "approx_bytes": cg_bytes,
        "roofline_frac": round(cg_bytes / HBM_BW / t_cg, 3),
        "pair_evals_per_s": round(nx * ny * nz * (cap // 2) / t_cg, 1)}

    # probability build
    def vo(carry):
        e, acc = carry
        R = T.vertical_operator(diag.probs, diag.xkhh, e, grid, cfg,
                                cfg.dynamics.dt)
        return (e, acc + jnp.sum(R))

    t_pr, _ = chain_time(vo, (exch, jnp.float32(0.0)))
    res["sections"]["vertical_operator"] = {"time_s": round(t_pr, 4)}

    res["summary"] = {
        "cell_steps_per_s": round(nx * ny * nz / t_step, 1),
        "step_budget": {
            "transport_frac": round(t_tr / t_step, 3),
            "dycore_frac": round(t_dyn / t_step, 3),
            "coag_amortized_frac": round(t_cg / 6.0 / t_step, 3),
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r03.json")
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
