#!/usr/bin/env python
"""Probe the CARES-shape compile ceiling: AOT-compile the full coupled step
at a given grid and report memory analysis or the failure mode."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/wpmc_xla"))

import jax


def main():
    nx, ny, nz = (int(a) for a in sys.argv[1:4])
    n_part = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    cap = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    from cares_shape import build_cares_shape

    step_fn, cs, cfg, grid = build_cares_shape(nx, ny, nz, n_part=n_part,
                                               cap=cap)
    f = jax.jit(step_fn, donate_argnums=0)
    t0 = time.perf_counter()
    lowered = f.lower(cs)
    print(f"lowered in {time.perf_counter()-t0:.1f}s; "
          f"HLO chars: {len(lowered.as_text())}")
    t0 = time.perf_counter()
    comp = lowered.compile()
    print(f"compiled in {time.perf_counter()-t0:.1f}s")
    m = comp.memory_analysis()
    print(f"temp {m.temp_size_in_bytes/2**30:.2f} GiB, "
          f"args {m.argument_size_in_bytes/2**30:.2f} GiB, "
          f"out {m.output_size_in_bytes/2**30:.2f} GiB")
    import jax.numpy as jnp
    out = jax.block_until_ready(f(cs))
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = f(out)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / n
    cells = nx * ny * nz
    print(f"step {t*1e3:.0f} ms -> {cells/t:.0f} cell-steps/s; finite: "
          f"{bool(jnp.isfinite(out.dyn.theta_p).all())}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
