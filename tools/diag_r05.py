#!/usr/bin/env python
"""Round-5 diagnosis: (a) reconcile bench-vs-profile 1.8x on the em_uniform
coupled step; (b) decompose transport_step internals.

Usage: python tools/diag_r05.py [recon|transport]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/wpmc_xla"))

import jax
import jax.numpy as jnp


def build(n_part=1000, cap=1280):
    import __graft_entry__ as ge

    return ge._build(nx=40, ny=40, nz=10, n_part=n_part, cap=cap,
                     chem_on=False, chem_dt=60.0)


def recon():
    """Time the same step three ways: eager steps 1..5 (profile's method),
    eager steps incl. chem steps, scan-of-10 (bench's method)."""
    step_fn, cs = build()

    # --- eager, like profile: warm step 0 (chem), then time 5 (no chem)
    f = jax.jit(step_fn, donate_argnums=0)
    out = jax.block_until_ready(f(cs))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(out)
    jax.block_until_ready(out)
    t_eager_nochem = (time.perf_counter() - t0) / 5
    print(f"eager (steps 1-5, no chem-step included): {t_eager_nochem*1e3:.1f} ms")

    # --- eager, 6 steps = exactly one chem cycle
    t0 = time.perf_counter()
    for _ in range(6):
        out = f(out)
    jax.block_until_ready(out)
    t_eager_cycle = (time.perf_counter() - t0) / 6
    print(f"eager (6-step cycle incl. 1 chem step):   {t_eager_cycle*1e3:.1f} ms")

    # --- scan of 10 like bench
    def run(s):
        def body(c, _):
            return f.__wrapped__(c) if hasattr(f, "__wrapped__") else step_fn(c), None
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), s, None,
                              length=10)
        return out

    g = jax.jit(run, donate_argnums=0)
    out2 = jax.block_until_ready(g(out))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out2 = jax.block_until_ready(g(out2))
        best = min(best, time.perf_counter() - t0)
    print(f"scan-of-10 (bench method):                {best/10*1e3:.1f} ms/step")


def transport():
    """Decompose transport_step at the em_uniform contract."""
    import dataclasses

    from wrf_partmc_tpu.config import (DomainConfig, PartmcConfig,
                                       uniform_test_config)
    from wrf_partmc_tpu.grid import make_grid
    from wrf_partmc_tpu.models.coupled import driver as D
    from wrf_partmc_tpu.models.coupled import transport as T
    from wrf_partmc_tpu.models.dycore.solve import solve_step
    from wrf_partmc_tpu.models.physics.pbl import k_profile_exch_h

    nx = ny = 40
    nz = 10
    n_part, cap = 1000, 1280
    step_fn, cs = build(n_part, cap)
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
    exch = k_profile_exch_h(grid, 0.4, 800.0)
    key = jax.random.key(1)

    f = jax.jit(step_fn, donate_argnums=0)
    out = jax.block_until_ready(f(cs))
    out = jax.block_until_ready(f(out))
    dyn = D.partmc_to_wrf(out, grid, cfg)
    _, diag = jax.jit(lambda d: solve_step(d, grid, cfg))(dyn)
    aero = out.aero
    probs, xkhh = diag.probs, diag.xkhh
    dt = cfg.dynamics.dt

    def tm(name, fn, *args, donate=False, n=4):
        fj = jax.jit(fn, donate_argnums=(0,) if donate else ())
        y = jax.block_until_ready(fj(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            y = jax.block_until_ready(fj(*args))
        t = (time.perf_counter() - t0) / n
        print(f"  {name:35s} {t*1e3:8.2f} ms")
        return y, t

    # full transport
    tr = lambda a: T.transport_step(a, probs, xkhh, exch, grid, cfg, dt, key)
    _, t_full = tm("transport_step (full)", tr, aero)

    # pieces
    ph_f = lambda x: T.normalized_face_probs(
        probs, T.horizontal_diffusion_probs(x, grid, dt, cfg=cfg))
    ph, _ = tm("face probs", ph_f, xkhh)
    R_f = lambda x: T.vertical_operator(probs, x, exch, grid, cfg, dt)
    R, _ = tm("vertical operator R", R_f, xkhh)
    acc_f = lambda a: T.preweight_acceptance(a, ph, R, grid, cfg)
    acc, _ = tm("preweight acceptance", acc_f, aero)
    sm_f = lambda a: T.sample_moves(a, ph, R, cfg.n_class, key)
    (dj, di, dest_k, horizontal), _ = tm("sample_moves", sm_f, aero)
    drop = jnp.zeros(dj.shape, bool)
    rb_f = lambda a: T.rebucket(a, dest_k, dj, di, horizontal, drop, acc,
                                grid, cfg, key)
    _, t_rb = tm("rebucket", rb_f, aero)

    # rebucket internals: phase1a loop alone
    def phase1a(a):
        from jax import lax
        nzl, nyl, nxl, P = a.num.shape
        C = nzl * nyl * nxl
        Av, Ah = T._caps(cfg, P, nzl)
        D_ = nzl + 4
        kk = lax.broadcasted_iota(jnp.int32, a.num.shape, 0)
        alive = a.alive
        vert = (~horizontal) & (dest_k != kk)
        hdir = jnp.where(di < 0, 0, jnp.where(di > 0, 1,
                         jnp.where(dj < 0, 2, 3)))
        dcode4 = jnp.where(vert, dest_k, jnp.where(horizontal, nzl + hdir, -1))
        dcode4 = jnp.where(alive, dcode4, -1)
        num4 = a.num

        def dbody(d, carry):
            dst1, shipped, scale_p, ovf = carry
            is_v = d < nzl
            cap_d = jnp.where(is_v, Av, Ah)
            base_d = jnp.where(is_v, d * Av, nzl * Av + (d - nzl) * Ah)
            mask4 = dcode4 == d
            m_f4 = mask4.astype(jnp.float32)
            rank_cell = jnp.cumsum(m_f4, axis=-1) - 1.0
            cnt_cell = jnp.sum(m_f4, axis=-1)
            offs = jnp.cumsum(cnt_cell, axis=0) - cnt_cell
            rank4 = rank_cell + jnp.where(is_v, offs[..., None], 0.0)
            rank_d = rank4.astype(jnp.int32)
            ship4 = mask4 & (rank_d < cap_d)
            num_tot_c = jnp.sum(m_f4 * num4, axis=-1)
            num_shp_c = jnp.sum(jnp.where(ship4, num4, 0.0), axis=-1)
            num_tot = jnp.where(is_v, jnp.sum(num_tot_c, 0, keepdims=True),
                                num_tot_c)
            num_shp = jnp.where(is_v, jnp.sum(num_shp_c, 0, keepdims=True),
                                num_shp_c)
            sc_d = jnp.where(num_shp > 0.0,
                             num_tot / jnp.maximum(num_shp, 1e-300), 1.0)
            cnt_pool = jnp.where(is_v, jnp.sum(cnt_cell, 0, keepdims=True),
                                 cnt_cell)
            ovf = ovf + (jnp.sum(jnp.maximum(cnt_pool - cap_d, 0.0))
                         / jnp.where(is_v, jnp.float32(nzl), 1.0))
            dst1 = jnp.where(ship4.reshape(C, P),
                             base_d + rank_d.reshape(C, P), dst1)
            shipped = shipped | ship4.reshape(C, P)
            scale_p = jnp.where(ship4, jnp.broadcast_to(sc_d[..., None],
                                                        ship4.shape),
                                scale_p.reshape(ship4.shape)).reshape(C, P)
            return dst1, shipped, scale_p, ovf

        return lax.fori_loop(
            0, D_, dbody,
            (jnp.full((C, P), -1, jnp.int32), jnp.zeros((C, P), bool),
             jnp.ones((C, P), jnp.float32), jnp.zeros((), jnp.float32)))

    (dst1, shipped, scale_p, _ovf), _ = tm("  rebucket/phase1a (D-loop)",
                                           phase1a, aero)

    # phase 2 payload move alone
    def phase2(a):
        from jax import lax
        from wrf_partmc_tpu.models.partmc.aero_state import pack_payload
        from wrf_partmc_tpu.ops.place import MAX_CH, scatter_rows
        nzl, nyl, nxl, P = a.num.shape
        C = nzl * nyl * nxl
        Av, Ah = T._caps(cfg, P, nzl)
        F1 = nzl * Av + 4 * Ah
        payload = pack_payload(a)
        CH = payload.shape[1]
        rest = payload[:, 1:, :]
        n_rest = CH - 1
        budget = 2 * 1024 ** 3
        per_ch = C * F1 * 4 * 3
        ch_block = max(8, min(n_rest, MAX_CH, budget // max(per_ch, 1)))
        n_blk = -(-n_rest // ch_block)
        pad = n_blk * ch_block - n_rest
        rest = jnp.pad(rest, ((0, 0), (0, pad), (0, 0)))
        blocks = jnp.moveaxis(rest.reshape(C, n_blk, ch_block, P), 1, 0)
        dst_slot = jnp.zeros((C, Av + 4 * Ah), jnp.int32)
        stay_keep = ~shipped

        def move_block(pb):
            src = jnp.where(shipped[:, None, :], pb, 0.0)
            minis_b = scatter_rows(src, dst1, F1)
            arr_b = T._reorder_minis(minis_b, nzl, nyl, nxl, ch_block, Av, Ah,
                                     lambda s, sh, ax: jnp.roll(s, sh, ax))
            arrived_b = scatter_rows(arr_b, dst_slot, P)
            return arrived_b + pb * stay_keep[:, None, :]

        out = lax.map(move_block, blocks)
        print(f"    (CH={CH}, ch_block={ch_block}, n_blk={n_blk}, "
              f"F1={F1}, C={C})", file=sys.stderr)
        return out

    tm("  rebucket/phase2 (payload)", phase2, aero)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "recon"
    if which == "recon":
        recon()
    else:
        transport()
