#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline: solve_em-equivalent grid-points/s/chip on a live-dynamics dycore
step (the BASELINE.md north-star), with the coupled em_uniform reference
problem (40x40x10 @ 2 km, 1000 particles/cell, ``test/em_uniform/namelist``)
and estimated coagulation-event throughput as secondary metrics in "extra".

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
relative to the previous round's value when BENCH_r*.json is present, else 1.0.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build_dycore(nx, ny, nz):
    from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble
    from wrf_partmc_tpu.models.dycore.solve import solve_step

    cfg = Config(domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0),
                 dynamics=DynamicsConfig(dt=10.0, n_sound=4))
    grid = make_grid(cfg)
    state = init_warm_bubble(cfg, grid)

    def step(s, _):
        s2, _diag = solve_step(s, grid, cfg)
        return s2, None

    def run(s, n):
        out, _ = jax.lax.scan(step, s, None, length=n)
        return out

    return run, state


def _build_coupled(nx, ny, nz, n_part, cap):
    import __graft_entry__ as ge

    step_fn, cs = ge._build(nx=nx, ny=ny, nz=nz, n_part=n_part, cap=cap,
                            everything_on=True)

    def run(s, n):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, s, None, length=n)
        return out

    return run, cs


def _time_run(run, state, n_steps, n_rep=2):
    f = jax.jit(lambda s: run(s, n_steps))
    out = jax.block_until_ready(f(state))      # compile
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(state))
        best = min(best, time.perf_counter() - t0)
    return best, out


def _prev_value():
    vals = []
    for p in sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                           "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
            vals.append(float(d.get("value", 0)))
        except Exception:
            pass
    return vals[-1] if vals else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=["tiny", "full"])
    args = ap.parse_args()

    if args.preset == "tiny":
        jax.config.update("jax_platforms", "cpu")
        dyc_dims = (32, 32, 8)
        cpl_dims = (12, 12, 4, 32, 96)
        n_dyc, n_cpl = 5, 5
    else:
        dyc_dims = (128, 128, 40)
        cpl_dims = (40, 40, 10, 1000, 1280)   # em_uniform reference problem
        n_dyc, n_cpl = 10, 10

    dev = jax.devices()[0]

    # --- solve_em-equivalent dycore throughput ---
    run_d, st_d = _build_dycore(*dyc_dims)
    t_d, _ = _time_run(run_d, st_d, n_dyc)
    gp = dyc_dims[0] * dyc_dims[1] * dyc_dims[2]
    gps = gp * n_dyc / t_d

    # --- coupled em_uniform problem (falls back down the reference's
    # particle-count sweep {1000, 500, 200, 100} if HBM is short) ---
    nx, ny, nz, n_part, cap = cpl_dims
    last_err = None
    for n_try in (n_part, n_part // 2, n_part // 5, n_part // 10):
        try:
            run_c, st_c = _build_coupled(nx, ny, nz, max(n_try, 8),
                                         max(int(cap * n_try / n_part), 16))
            t_c, out_c = _time_run(run_c, st_c, n_cpl)
            n_part = max(n_try, 8)
            break
        except Exception as e:  # OOM on small-HBM chips -> next sweep point
            last_err = e
            msg = str(e)
            if not any(s in msg for s in ("RESOURCE_EXHAUSTED", "ResourceExhausted",
                                          "Ran out of memory", "out of memory")):
                raise
    else:
        raise last_err
    cells = nx * ny * nz
    cell_steps = cells * n_cpl / t_c
    parts = float(jnp.sum(out_c.aero.n_alive()))
    part_steps = parts * n_cpl / t_c
    # coagulation candidate-pair evaluations per second (chem steps only;
    # chem_dt == 6 dt in the entry config -> every step here counts pairs/2)
    cap_used = st_c.aero.num.shape[-1]
    coag_pairs = cells * (cap_used // 2) * n_cpl / t_c

    prev = _prev_value()
    result = {
        "metric": f"solve_em grid-points/s/chip ({dyc_dims[0]}x{dyc_dims[1]}x{dyc_dims[2]} live dynamics)",
        "value": round(gps, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(gps / prev, 3) if prev else 1.0,
        "extra": {
            "device": str(dev),
            "dycore_steps_per_s": round(n_dyc / t_d, 3),
            "coupled_em_uniform_cell_steps_per_s": round(cell_steps, 1),
            "coupled_num_particles_per_cell": n_part,
            "coupled_em_uniform_steps_per_s": round(n_cpl / t_c, 3),
            "particle_steps_per_s": round(part_steps, 1),
            "coag_pair_evals_per_s": round(coag_pairs, 1),
            "alive_particles": int(parts),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
