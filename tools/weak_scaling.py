#!/usr/bin/env python
"""Weak-scaling harness: coupled-step throughput at fixed per-device load.

The BASELINE north-star asks for >= 80% weak-scaling efficiency at N >= 2
hosts.  This harness measures it on whatever devices are visible — the
8-device virtual CPU mesh (default below), one TPU chip, or a real multi-host
slice when launched one process per host with WPMC_COORDINATOR set
(parallel/distributed.py).

Per device the domain block is fixed (--block-ny x --block-nx cells); the
global domain grows with the mesh.  Efficiency(N) = rate(N) / (N * rate(1)).

Usage:
  JAX_PLATFORMS=cpu python tools/weak_scaling.py --devices 1 2 4 8
  python tools/weak_scaling.py --devices 1        # single TPU chip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_dev, block_ny, block_nx, nz, n_part, cap, steps, chem=False):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from wrf_partmc_tpu.parallel.mesh import factor_2d, make_mesh

    py, px = factor_2d(n_dev)
    ny, nx = block_ny * py, block_nx * px
    mesh = make_mesh(jax.devices()[:n_dev], shape=(py, px))
    step_fn, cs = ge._build(nx=nx, ny=ny, nz=nz, n_part=n_part, cap=cap,
                            chem_on=chem, mesh=mesh)

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

    cs = jax.tree.map(lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec_for(jnp.shape(a)))), cs)

    def run(c):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, c, None, length=steps)
        return out

    f = jax.jit(run)
    out = jax.block_until_ready(f(cs))          # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(cs))
        best = min(best, time.perf_counter() - t0)
    cells = nz * ny * nx
    return {"n_dev": n_dev, "mesh": [py, px], "domain": [nz, ny, nx],
            "steps_per_s": steps / best,
            "cell_steps_per_s": cells * steps / best}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--block-ny", type=int, default=8)
    ap.add_argument("--block-nx", type=int, default=8)
    ap.add_argument("--nz", type=int, default=8)
    ap.add_argument("--n-part", type=int, default=16)
    ap.add_argument("--cap", type=int, default=48)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--chem", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (the container's TPU "
                         "plugin registers itself before env vars apply)")
    args = ap.parse_args()

    import jax

    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices))

    from wrf_partmc_tpu.parallel import distributed as dist

    dist.init_from_env()

    avail = len(jax.devices())
    rows = []
    for n in args.devices:
        if n > avail:
            print(f"skip n={n} (only {avail} devices)")
            continue
        r = measure(n, args.block_ny, args.block_nx, args.nz, args.n_part,
                    args.cap, args.steps, chem=args.chem)
        rows.append(r)
        base = rows[0]["cell_steps_per_s"] / rows[0]["n_dev"]
        r["efficiency"] = r["cell_steps_per_s"] / (r["n_dev"] * base)
        print(f"N={r['n_dev']:3d}  mesh {r['mesh'][0]}x{r['mesh'][1]}  "
              f"domain {r['domain']}  {r['cell_steps_per_s']:12.1f} "
              f"cell-steps/s  eff={r['efficiency']:.3f}", flush=True)
    print(json.dumps({"weak_scaling": rows}))


if __name__ == "__main__":
    main()
