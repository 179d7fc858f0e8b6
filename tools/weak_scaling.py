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


_SHAPE_RE = None


def _hlo_collective_bytes(hlo_text):
    """Per-step ICI traffic from the lowered HLO: sum the output-shape bytes
    of every collective-permute / all-reduce / all-gather / reduce-scatter
    instruction inside the step (each fires once per executed step; the
    while-loop body appears once in the HLO text)."""
    import re

    dt_size = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8}
    out = {"collective-permute": 0, "all-reduce": 0, "all-gather": 0,
           "reduce-scatter": 0}
    n_ops = {k: 0 for k in out}
    pat = re.compile(
        r"=\s*(?:\()?\s*([a-z0-9]+)\[([0-9,]*)\][^=]*?"
        r"(collective-permute|all-reduce|all-gather|reduce-scatter)"
        r"(?:-start|-done)?\(")
    for m in pat.finditer(hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        if dt not in dt_size:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out[op] += n * dt_size[dt]
        n_ops[op] += 1
    # -start/-done pairs double-count; halve permute if starts present
    if "collective-permute-start" in hlo_text:
        out["collective-permute"] //= 2
        n_ops["collective-permute"] //= 2
    return out, n_ops


def measure(n_dev, block_ny, block_nx, nz, n_part, cap, steps, chem=False,
            hlo_bytes=False):
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
    row = {"n_dev": n_dev, "mesh": [py, px], "domain": [nz, ny, nx]}
    if hlo_bytes:
        # the scan body is printed once in the HLO and executes once per
        # step, so instruction-shape sums ARE per-step byte counts
        hlo = f.lower(cs).compile().as_text()
        per_step, n_ops = _hlo_collective_bytes(hlo)
        row["ici_bytes_per_step"] = per_step
        row["ici_ops_in_step"] = n_ops
    out = jax.block_until_ready(f(cs))          # compile (cached if lowered)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(cs))
        best = min(best, time.perf_counter() - t0)
    cells = nz * ny * nx
    row["steps_per_s"] = steps / best
    row["cell_steps_per_s"] = cells * steps / best
    return row


ICI_LINK_BW = 45e9   # [B/s] one v5e ICI link direction (conservative; the
                     # 2-D torus gives each chip 4 links, and the transport
                     # edge exchange uses one link pair per mesh axis)


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
    ap.add_argument("--hlo-bytes", action="store_true",
                    help="parse per-step ICI byte counts from the lowered "
                         "HLO at each mesh size")
    ap.add_argument("--tpu-step-s", type=float, default=0.0,
                    help="measured single-chip TPU step time for this local "
                         "block [s]; enables the predicted-efficiency model")
    ap.add_argument("--out", default="",
                    help="write the artifact JSON here (e.g. "
                         "WEAKSCALING_r05.json)")
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
                    args.cap, args.steps, chem=args.chem,
                    hlo_bytes=args.hlo_bytes)
        rows.append(r)
        base = rows[0]["cell_steps_per_s"] / rows[0]["n_dev"]
        r["efficiency_measured"] = r["cell_steps_per_s"] / (r["n_dev"] * base)
        if args.tpu_step_s and "ici_bytes_per_step" in r:
            # predicted TPU efficiency by byte math: per-device edge traffic
            # over one ICI link pair added to the fixed per-device compute
            b = sum(r["ici_bytes_per_step"].values())
            t_ici = b / ICI_LINK_BW
            r["ici_total_bytes_per_step"] = b
            r["t_ici_predicted_s"] = t_ici
            r["efficiency_predicted_tpu"] = (
                args.tpu_step_s / (args.tpu_step_s + t_ici))
        print(f"N={r['n_dev']:3d}  mesh {r['mesh'][0]}x{r['mesh'][1]}  "
              f"domain {r['domain']}  {r['cell_steps_per_s']:12.1f} "
              f"cell-steps/s  eff={r['efficiency_measured']:.3f}"
              + (f"  pred(TPU)={r.get('efficiency_predicted_tpu', 0):.3f}"
                 if args.tpu_step_s else ""), flush=True)
    result = {
        "weak_scaling": rows,
        "method": {
            "measured": "per-step wall time on the visible devices; on the "
                        "virtual CPU mesh all N devices share 2 host cores, "
                        "so measured efficiency reflects core contention, "
                        "NOT ICI — the predicted column is the hardware "
                        "claim",
            "predicted": f"eff = t_step / (t_step + ici_bytes/"
                         f"{ICI_LINK_BW / 1e9:.0f}GBps) with ici bytes "
                         "summed from the lowered HLO's collective ops "
                         "(per-shard shapes, once per scan-body step)",
            "tpu_step_s": args.tpu_step_s},
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
