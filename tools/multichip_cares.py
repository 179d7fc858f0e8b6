#!/usr/bin/env python
"""CARES-shaped multi-chip dryrun (VERDICT r4 item 2, second half): jit the
FULL coupled CARES-configuration step (MYJ + kdist + Grell + Morrison +
Noah + CBM-Z/MOSAIC chem + spec/relax wrfbdy) over an 8-device virtual mesh
at the single-chip-ceiling grid (64x64x28 @ 100/cell — each virtual device
holds a 32x16-column block), execute ONE step, and record HLO collective
statistics.  Writes MULTICHIP_r05.json.

On 8 real v5e chips the same program gives each device 1/8 of the 13.2 GiB
single-chip temp footprint, so the sharded configuration has ~8x HBM
headroom — the full CARES 170x160x65 domain (1.77M cells, 15x the cells)
maps onto a 4x8-or-larger mesh of exactly this program.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 28
    n_part = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    cap = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    from cares_shape import build_cares_shape

    from wrf_partmc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    t0 = time.perf_counter()
    step_fn, cs, cfg, grid = build_cares_shape(nx, ny, nz, n_part=n_part,
                                               cap=cap, mesh=mesh)

    def spec_for(shape):
        nd = len(shape)
        if nd < 2:
            return P()
        if nd == 2:
            return P("y", "x")
        if nd == 3:
            return P(None, "y", "x")
        if shape[1] == ny and shape[2] == nx:
            return P(None, "y", "x", *([None] * (nd - 3)))
        return P(None, None, "y", "x", *([None] * (nd - 4)))

    cs_sh = jax.tree.map(lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec_for(jnp.shape(a)))), cs)
    print(f"built + sharded in {time.perf_counter() - t0:.1f}s", flush=True)

    f = jax.jit(step_fn, donate_argnums=0)
    t0 = time.perf_counter()
    comp = f.lower(cs_sh).compile()
    t_compile = time.perf_counter() - t0
    hlo = comp.as_text()
    n_ppermute = hlo.count("collective-permute")
    big_ag = []
    for line in hlo.splitlines():
        if "all-gather(" in line:
            for dims in re.findall(r"f32\[([0-9,]+)\]", line):
                n = 1
                for d in dims.split(","):
                    n *= int(d)
                if n > 4_000_000:
                    big_ag.append(n)
    print(f"compiled in {t_compile:.1f}s; {n_ppermute} collective-permutes; "
          f"large all-gathers: {big_ag}", flush=True)

    t0 = time.perf_counter()
    out = jax.block_until_ready(f(cs_sh))
    t_step = time.perf_counter() - t0
    finite = bool(jnp.isfinite(out.dyn.theta_p).all())
    alive = int(jnp.sum(out.aero.num > 0))
    result = {
        "grid": f"{nx}x{ny}x{nz}",
        "cells": nx * ny * nz,
        "particles_per_cell": n_part,
        "mesh": "2x4 (virtual CPU devices)",
        "compile_s": round(t_compile, 1),
        "first_step_s_cpu": round(t_step, 1),
        "collective_permutes": n_ppermute,
        "large_all_gathers": big_ag,
        "theta_finite": finite,
        "alive_particles": alive,
        "note": "full CARES physics+chem coupled step sharded over a 2x4 "
                "('y','x') mesh at the single-chip HBM-ceiling grid; "
                "particle transport uses the ppermute face-buffer path "
                "(no whole-population all-gather).  Executed on virtual "
                "CPU devices; per-real-chip HBM at this shape is ~1/8 of "
                "the 13.2 GiB single-chip footprint.",
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_r05.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    assert finite and n_ppermute > 0 and not big_ag


if __name__ == "__main__":
    main()
