#!/usr/bin/env python
"""Component-level profiling harness (VERDICT r1 item 2).

Times each major section of the dycore step and the coupled step separately
on the attached device, and prints a bytes-moved roofline estimate per
section so "fast enough" is judged against memory-bound speed-of-light
rather than against round-1's own number.

Usage:
  python tools/profile_step.py dycore   [--nx 128 --ny 128 --nz 40]
  python tools/profile_step.py coupled  [--nx 40 --ny 40 --nz 10 --cap 256]
  python tools/profile_step.py trace    # writes a jax profiler trace dir
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _timeit(fn, *args, n=3, name="", inner=8):
    """Per-call time with dispatch latency amortized: dispatches are async,
    so queueing ``inner`` calls back-to-back and blocking once overlaps the
    host dispatch of call i+1 with device execution of call i."""
    f = jax.jit(fn)
    args = jax.tree.map(
        lambda a: jax.device_put(a) if hasattr(a, "dtype") else a, args)
    out = jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


def _report(name, t, nbytes=None, flops=None):
    line = f"{name:38s} {t*1e3:9.3f} ms"
    if nbytes:
        bw = nbytes / t / 1e9
        line += f"  {nbytes/1e6:9.1f} MB -> {bw:7.1f} GB/s eff"
    if flops:
        line += f"  {flops/t/1e12:6.2f} TF/s"
    print(line)


def tree_bytes(t):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))


def profile_dycore(nx, ny, nz):
    from wrf_partmc_tpu.config import Config, DomainConfig, DynamicsConfig
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.dycore.ideal import init_warm_bubble
    from wrf_partmc_tpu.models.dycore import solve as S

    cfg = Config(domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0),
                 dynamics=DynamicsConfig(dt=10.0, n_sound=4))
    grid = make_grid(cfg)
    state = init_warm_bubble(cfg, grid)
    fb = state.theta_p.size * 4      # bytes of one [nz,ny,nx] field

    t, _ = _timeit(lambda s: S.solve_step(s, grid, cfg)[0], state, name="solve")
    _report("solve_step (full)", t, nbytes=tree_bytes(state) * 2)
    print(f"  -> {nx*ny*nz/t/1e6:.1f}M grid-points/s")

    t, _ = _timeit(lambda s: S.dyn_step(s, grid, cfg), state)
    _report("dyn_step (RK3+acoustic)", t)

    t, _ = _timeit(lambda s: S._slow_tendencies(s, grid, cfg), state)
    _report("_slow_tendencies (1 stage)", t, nbytes=10 * fb)

    tend = S._slow_tendencies(state, grid, cfg)
    t, _ = _timeit(
        lambda s: S._acoustic_integrate(s, tend, s.theta_p, grid, cfg,
                                        cfg.dynamics.dt, cfg.dynamics.n_sound),
        state)
    _report(f"_acoustic_integrate ns={cfg.dynamics.n_sound}", t, nbytes=4 * 5 * fb)

    # advection families
    from wrf_partmc_tpu.ops.advection import rk3_advect_pd, rk3_advect_mono
    from wrf_partmc_tpu.models.dycore.state import base_profiles
    rho_b, _, _ = base_profiles(grid)
    rho_u = rho_b.reshape(-1, 1, 1) * state.u
    rho_v = rho_b.reshape(-1, 1, 1) * state.v
    rho_w = jnp.zeros_like(state.w)
    rdz = 1.0 / grid.dz

    def adv(q, fn):
        out, probs = fn(q, rho_u, rho_v, rho_w, rho_b, 10.0, grid.rdx,
                        grid.rdy, rdz, 5, 3, "periodic", "periodic",
                        w_prob_cap=0.95)
        return out, probs

    for nfam, fam in (("moist[3]", state.moist), ("chem[G]", state.chem),
                      ("num_conc[C]", state.num_conc)):
        nf = fam.shape[0]
        t, _ = _timeit(lambda q: adv(q, rk3_advect_pd), fam)
        _report(f"rk3_advect_pd {nfam} ({nf} fields)", t, nbytes=nf * fb * 6)
        t, _ = _timeit(lambda q: adv(q, rk3_advect_mono), fam)
        _report(f"rk3_advect_mono {nfam} ({nf} fields)", t, nbytes=nf * fb * 6)

    # tridiag alone
    from wrf_partmc_tpu.ops.tridiag import solve as tri
    a = jnp.full((nz - 1, ny, nx), -0.1)
    b = jnp.full((nz - 1, ny, nx), 1.3)
    c = jnp.full((nz - 1, ny, nx), -0.1)
    d = jnp.ones((nz - 1, ny, nx))
    t, _ = _timeit(tri, a, b, c, d)
    _report("tridiag solve [nz-1,ny,nx]", t, nbytes=5 * fb)


def profile_coupled(nx, ny, nz, n_part, cap):
    import dataclasses
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    from wrf_partmc_tpu.models.coupled import transport as T
    from wrf_partmc_tpu.models.coupled import driver as D
    from wrf_partmc_tpu.models.dycore.solve import solve_step
    from wrf_partmc_tpu.models.partmc.coag import KERNEL_BROWN, coag_step
    from wrf_partmc_tpu.models.partmc.aero_state import rebalance, compact
    from wrf_partmc_tpu.utils import rng

    step_fn, cs = ge._build(nx=nx, ny=ny, nz=nz, n_part=n_part, cap=cap)
    # rebuild the pieces _build used
    from wrf_partmc_tpu.config import DomainConfig, PartmcConfig, uniform_test_config
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h
    cfg = uniform_test_config().replace(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0,
                            ztop=2000.0),
        partmc=PartmcConfig(num_particles=n_part, max_particles=cap,
                            n_emit_slots=4, partmc_chem_dt=60.0,
                            do_coagulation=True, do_emission=True,
                            do_deposition=True, do_transport=True))
    cfg = cfg.replace(dynamics=dataclasses.replace(cfg.dynamics,
                                                   constant_velocity=False))
    grid = make_grid(cfg)
    from wrf_partmc_tpu.models.partmc.aero_data import make_aero_data
    ad = make_aero_data()
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    key = jax.random.key(1)

    state_b = tree_bytes(cs.aero)
    print(f"aero state bytes: {state_b/1e6:.1f} MB  (cap={cap}, "
          f"S={cs.aero.vol.shape[-2]}, cells={nx*ny*nz})")

    t, _ = _timeit(step_fn, cs)
    _report("coupled_step (full)", t)

    dyn = D.partmc_to_wrf(cs, grid, cfg)
    t, (dyn2, diag) = _timeit(lambda d: solve_step(d, grid, cfg), dyn)
    _report("solve_step", t)

    env = D.make_env(dyn2, grid, cfg, cs.step)
    t, _ = _timeit(
        lambda a: coag_step(a, ad, env, 60.0, key, kernel=KERNEL_BROWN),
        cs.aero)
    _report("coag_step", t)

    t, R = _timeit(
        lambda p: T.vertical_operator(p, diag.xkhh, exch, grid, cfg, 10.0),
        diag.probs)
    _report("vertical_operator (B^N A)", t)

    p_hdiff = T.horizontal_diffusion_probs(diag.xkhh, grid, 10.0, cfg=cfg)
    ph = T.normalized_face_probs(diag.probs, p_hdiff)
    t, moves = _timeit(
        lambda a: T.sample_moves(a, ph, R, cfg.n_class, key), cs.aero)
    _report("sample_moves", t, nbytes=state_b // 6)

    t, acc = _timeit(
        lambda a: T.preweight_acceptance(a, ph, R, grid, cfg), cs.aero)
    _report("preweight_acceptance", t)

    dj, di, dest_k, horizontal = moves
    drop = T.open_boundary_drop(dj, di, horizontal, grid, cfg)
    t, _ = _timeit(lambda a: T.rebucket(a, dest_k, dj, di, horizontal, drop,
                                        acc, grid, cfg, key)[0], cs.aero)
    _report("rebucket (MXU place)", t, nbytes=state_b * 3)

    t, _ = _timeit(
        lambda a: T.transport_step(a, diag.probs, diag.xkhh, exch, grid, cfg,
                                   10.0, key), cs.aero)
    _report("transport_step (all)", t, nbytes=state_b * 3)

    t, _ = _timeit(lambda a: compact(a), cs.aero)
    _report("compact", t, nbytes=state_b * 2)

    t, _ = _timeit(lambda a: rebalance(a, key, n_part, True, True), cs.aero)
    _report("rebalance", t, nbytes=state_b * 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["dycore", "coupled", "trace"])
    ap.add_argument("--nx", type=int, default=0)
    ap.add_argument("--ny", type=int, default=0)
    ap.add_argument("--nz", type=int, default=0)
    ap.add_argument("--n_part", type=int, default=200)
    ap.add_argument("--cap", type=int, default=256)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev}")
    if args.what == "dycore":
        profile_dycore(args.nx or 128, args.ny or 128, args.nz or 40)
    elif args.what == "coupled":
        profile_coupled(args.nx or 40, args.ny or 40, args.nz or 10,
                        args.n_part, args.cap)
    else:
        import __graft_entry__ as ge
        step_fn, cs = ge._build()
        f = jax.jit(step_fn)
        jax.block_until_ready(f(cs))
        with jax.profiler.trace("/tmp/wpmc_trace"):
            jax.block_until_ready(f(cs))
        print("trace written to /tmp/wpmc_trace")


if __name__ == "__main__":
    main()
