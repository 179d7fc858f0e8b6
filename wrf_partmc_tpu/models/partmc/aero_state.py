"""Fixed-capacity particle population state (the heart of the aerosol model).

TPU-native redesign of PartMC's ``aero_state_t`` + ``aero_particle_array_t`` +
``aero_weight_array_t`` (behavior pinned by the coupling call sites listed in
SURVEY 2.4; e.g. per-cell populations with ``n_part_ideal`` targets and
doubling/halving rebalance, ``wrf_pmc_init.F90:248-259``).

Design differences from the reference (deliberate, for static XLA shapes):

* Per-cell particle storage is a fixed-capacity SoA: ``vol[..., S, P]``,
  ``num[..., P]`` etc., with ``num == 0`` marking dead slots.  The particle
  axis P is last so it maps onto TPU vector lanes.
* Each computational particle carries its own real-valued multiplicity
  ``num`` — the absolute number of physical particles it represents.  This
  subsumes the reference's per-(group, class) weight-magnitude arrays
  (``AERO_STATE_WEIGHT_FLAT_SPECIFIED``): moving a particle between cells or
  rescaling a population touches only ``num``, with no binomial/Poisson
  weight-ratio corrections needed (cf. ``wrf_pmc_trans_aero.F90:2250-2318``).
* ``aero_state_rebalance`` (double/halve toward n_ideal) becomes
  split-largest / thin-random operations that conserve total represented
  number exactly in expectation and keep shapes static.

The alive population is kept *compacted* (alive slots first).  All mutating
ops either preserve compaction or call :func:`compact`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .aero_data import AeroData, particle_volume, vol_to_diam


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AeroState:
    vol: jax.Array        # [..., S, P] per-species volume per particle [m3]
    num: jax.Array        # [..., P] multiplicity (physical particles); 0=dead
    pid: jax.Array        # [..., P] int32 particle id (unique within cell)
    source: jax.Array     # [..., P] int32 primary (largest-volume) source
    w_class: jax.Array    # [..., P] int32 weight class
    t_create: jax.Array   # [..., P] f32 creation time [s]
    next_id: jax.Array    # [...] int32 id counter (restart schema carries it,
                          # wrf_pmc_init.F90:1084-1286)
    # fixed-width source-component list (the aero_component source
    # attribution the reference carries per particle and through restart,
    # wrf_pmc_init.F90:1111-1272): top-K contributing sources by primary
    # volume.  Coagulation merges the two lists and truncates to K; chemistry
    # growth is unattributed (components track emitted/primary volume).
    src_id: jax.Array     # [..., K, P] int32 source index, -1 = empty slot
    src_vol: jax.Array    # [..., K, P] f32 attributed primary volume [m3]
    # MESA water-hysteresis leg (0 = effloresced/lower branch, 1 =
    # deliquesced/upper branch), persisted per particle through transport,
    # coagulation and restart like the reference's per-particle hysteresis
    # state (``wrf_pmc_init.F90:1111-1272``).  Fresh particles start on the
    # upper leg; :func:`~.condense.equilib_water_hyst` owns the transitions.
    hyst_leg: jax.Array   # [..., P] int32 in {0, 1}

    @property
    def capacity(self) -> int:
        return self.num.shape[-1]

    @property
    def n_src_comp(self) -> int:
        return self.src_id.shape[-2]

    @property
    def cell_shape(self) -> tuple:
        return self.num.shape[:-1]

    @property
    def alive(self) -> jax.Array:
        return self.num > 0.0

    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive, axis=-1)

    def total_num(self) -> jax.Array:
        """Total represented physical-particle number per cell [...]."""
        return jnp.sum(self.num, axis=-1)

    def num_conc(self, cell_volume) -> jax.Array:
        return self.total_num() / cell_volume

    def num_by_class(self, n_class: int) -> jax.Array:
        """[..., n_class] represented number per weight class (feeds the
        NUM_CONC_a## tracers, ``wrf_pmc_driver.F90:1710-1716``).  One-hot in
        the [..., n_class, P] orientation (P on lanes) — the transposed form
        pads n_class to 128 lanes."""
        c_iota = jnp.arange(n_class, dtype=jnp.int32).reshape(-1, 1)
        onehot = (self.w_class[..., None, :] == c_iota).astype(self.num.dtype)
        return jnp.einsum("...p,...cp->...c", self.num, onehot)

    def num_by_source(self, n_source: int) -> jax.Array:
        """[..., n_source] represented number per primary source."""
        onehot = jax.nn.one_hot(self.source, n_source, dtype=self.num.dtype)
        return jnp.einsum("...p,...pc->...c", self.num, onehot)

    def vol_by_source(self, n_source: int) -> jax.Array:
        """[..., n_source] represented attributed volume per source from the
        component lists (survives coagulation, unlike the primary label)."""
        onehot = jax.nn.one_hot(self.src_id, n_source, dtype=self.num.dtype)
        return jnp.einsum("...kp,...p,...kpc->...c", self.src_vol, self.num,
                          onehot)

    def dry_diameter(self, aero_data: AeroData) -> jax.Array:
        return vol_to_diam(particle_volume(self.vol, dry=True, aero_data=aero_data))

    def wet_diameter(self) -> jax.Array:
        return vol_to_diam(particle_volume(self.vol))


def zero_state(aero_data: AeroData, capacity: int, cell_shape=(),
               n_src_comp: int = 3) -> AeroState:
    S = aero_data.n_spec
    return AeroState(
        vol=jnp.zeros((*cell_shape, S, capacity), jnp.float32),
        num=jnp.zeros((*cell_shape, capacity), jnp.float32),
        pid=jnp.zeros((*cell_shape, capacity), jnp.int32),
        source=jnp.zeros((*cell_shape, capacity), jnp.int32),
        w_class=jnp.zeros((*cell_shape, capacity), jnp.int32),
        t_create=jnp.zeros((*cell_shape, capacity), jnp.float32),
        next_id=jnp.zeros(cell_shape, jnp.int32),
        src_id=jnp.full((*cell_shape, n_src_comp, capacity), -1, jnp.int32),
        src_vol=jnp.zeros((*cell_shape, n_src_comp, capacity), jnp.float32),
        hyst_leg=jnp.ones((*cell_shape, capacity), jnp.int32),
    )


def payload_channels(state: AeroState) -> int:
    """Channel count of the packed per-particle payload."""
    return 7 + state.vol.shape[-2] + 2 * state.n_src_comp


# Particle ids are split into two f32-value channels so they survive the
# bf16x3 MXU payload path exactly (|v| < 2**24; see ops/place.py).
_PID_SPLIT = 4096


def payload_channel_list(state: AeroState) -> list:
    """The per-particle payload as a list of CH [..., P] f32 arrays in
    pack order — callers that process the payload in channel slabs (the
    transport rebucket) stack only the slab they need, so the monolithic
    [C, CH, P] tensor is never materialized."""
    f = lambda a: a.astype(jnp.float32)
    parts = [state.num, state.t_create,
             f(state.pid % _PID_SPLIT), f(state.pid // _PID_SPLIT),
             f(state.source), f(state.w_class)]
    parts += [state.vol[..., s, :] for s in range(state.vol.shape[-2])]
    parts += [state.src_vol[..., k, :] for k in range(state.n_src_comp)]
    parts += [f(state.src_id[..., k, :]) for k in range(state.n_src_comp)]
    parts.append(f(state.hyst_leg))
    return parts


def pack_payload(state: AeroState):
    """All per-particle fields as one channel-first [C, CH, P] f32 tensor.

    TPU performance note: XLA row gathers and lane-axis ``take_along_axis``
    run at ~2-6 GB/s; every slot rearrangement instead flows through the
    MXU one-hot engine in ``ops/place.py``, which wants [batch, CH, slots]
    with integer fields stored as *values* (exact under bf16x3), never
    bitcasts.

    Channel layout: [num, t_create, pid_lo, pid_hi, source, w_class,
    vol(S), src_vol(K), src_id(K), hyst_leg].  hyst_leg rides last so the
    coagulation payload slices (``coag.py`` 6:6+S etc.) keep their offsets;
    the merged particle inherits the surviving (small-side) row's leg."""
    payload = jnp.stack(payload_channel_list(state), axis=-2)  # [*cell, CH, P]
    return payload.reshape(-1, payload_channels(state), state.capacity)


def unpack_payload(state: AeroState, payload) -> AeroState:
    """Inverse of pack_payload; payload: [C, CH, P] with C = prod(cells).
    Integer channels are rounded (the MXU path is ~1-ulp on floats, exact
    on int values after rounding); rows with num <= 0 are fully zeroed.

    TPU layout note: channels move to the LEADING axis first so every
    per-channel slice is a contiguous [C, P] slab — slicing the sublane
    axis of [C, CH, P] in place ran at ~9 GB/s (31 ms for a 273 MB
    payload); this form is ~200x faster."""
    S = state.vol.shape[-2]
    K = state.n_src_comp
    cs = state.cell_shape
    P = state.capacity
    p = jnp.moveaxis(payload, -2, 0).reshape(payload.shape[-2], *cs, P)
    ii = lambda a: jnp.round(a).astype(jnp.int32)
    num = p[0]
    dead = num <= 0.0
    pid = ii(p[2]) + _PID_SPLIT * ii(p[3])
    return dataclasses.replace(
        state,
        num=jnp.where(dead, 0.0, num),
        t_create=p[1],
        pid=jnp.where(dead, 0, pid),
        source=jnp.where(dead, 0, ii(p[4])),
        w_class=jnp.where(dead, 0, ii(p[5])),
        vol=jnp.moveaxis(jnp.where(dead[None], 0.0, p[6:6 + S]), 0, -2),
        src_vol=jnp.moveaxis(jnp.where(dead[None], 0.0,
                                       p[6 + S:6 + S + K]), 0, -2),
        src_id=jnp.moveaxis(jnp.where(dead[None], -1,
                                      ii(p[6 + S + K:6 + S + 2 * K])), 0, -2),
        hyst_leg=jnp.where(dead, 1, ii(p[6 + S + 2 * K])))


def permute_slots(state: AeroState, dst) -> AeroState:
    """Move each particle to slot dst[..., p] of its own cell (-1 drops);
    one batched one-hot matmul over cells."""
    from ...ops.place import scatter_rows

    P = state.capacity
    payload = pack_payload(state)
    rows = scatter_rows(payload, dst.reshape(-1, P), P)
    return unpack_payload(state, rows)


def compact(state: AeroState) -> AeroState:
    """Stable-move alive particles to the front of the P axis
    (replaces the reference's ``aero_sorted`` re-sort, trans_aero step 6).
    Off the hot path by design: transport/emission/rebalance all work on
    fragmented populations via rank computations."""
    alive = state.alive
    rank = jnp.cumsum(alive.astype(jnp.int32), axis=-1) - 1
    dst = jnp.where(alive, rank, -1)
    return permute_slots(state, dst)


def fill_fresh(aero_data: AeroData, capacity: int, new_vol, new_num,
               new_source, new_w_class, time=0.0,
               n_src_comp: int = 3) -> AeroState:
    """Build a brand-new population directly from E sampled entries per
    cell (entry e -> slot e; no placement machinery).  The O(1)-memory path
    for initial sampling at large E (init_read_in_ics scale)."""
    cs = new_num.shape[:-1]
    E = new_num.shape[-1]
    P = capacity
    if E > P:
        raise ValueError(f"fill_fresh: E={E} > capacity={P}")
    pad = lambda a, fill=0.0: jnp.pad(
        a, [(0, 0)] * (a.ndim - 1) + [(0, P - E)], constant_values=fill)
    num = pad(jnp.asarray(new_num, jnp.float32))
    vol = jnp.pad(jnp.asarray(new_vol, jnp.float32),
                  [(0, 0)] * (new_vol.ndim - 1) + [(0, P - E)])
    alive = num > 0.0
    i32 = lambda a: jnp.broadcast_to(jnp.asarray(a, jnp.int32), (*cs, E))
    src = pad(i32(new_source).astype(jnp.float32)).astype(jnp.int32)
    wcl = pad(i32(new_w_class).astype(jnp.float32)).astype(jnp.int32)
    pid = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (*cs, P))
    tot_v = jnp.sum(vol, axis=-2)
    K = n_src_comp
    sv = jnp.concatenate([tot_v[..., None, :],
                          jnp.zeros((*cs, K - 1, P), jnp.float32)], axis=-2)
    si = jnp.concatenate([src[..., None, :],
                          jnp.full((*cs, K - 1, P), -1, jnp.int32)], axis=-2)
    dead = ~alive
    return AeroState(
        vol=jnp.where(dead[..., None, :], 0.0, vol),
        num=jnp.where(dead, 0.0, num),
        pid=jnp.where(dead, 0, pid),
        source=jnp.where(dead, 0, src),
        w_class=jnp.where(dead, 0, wcl),
        t_create=jnp.full((*cs, P), jnp.float32(time)),
        next_id=jnp.full(cs, E, jnp.int32),
        src_id=jnp.where(dead[..., None, :], -1, si),
        src_vol=jnp.where(dead[..., None, :], 0.0, sv),
        hyst_leg=jnp.ones((*cs, P), jnp.int32))


def add_particles(state: AeroState, new_vol, new_num, new_source, new_w_class,
                  time=0.0) -> AeroState:
    """Append up to E new particles per cell into free slots.

    new_vol: [..., S, E]; new_num/[...]: [..., E].
    Entries with new_num == 0 become dead slots.  Works on fragmented
    populations (no compaction): incoming entry e lands in the cell's e-th
    *free* slot, found by a rank cumsum.  Overflow beyond capacity is
    dropped with its number conserved by rescaling the surviving new
    particles (the static-shape analogue of weight rescaling under
    convergent flow, ``wrf_pmc_trans_aero.F90:1374-1402``).

    Small E (per-step emissions) uses a fused [P, E] one-hot einsum; large E
    (initial population sampling) routes through the MXU place engine to
    avoid the quadratic one-hot.
    """
    P = state.capacity
    E = new_num.shape[-1]
    if E > 64:
        return _add_particles_large(state, new_vol, new_num, new_source,
                                    new_w_class, time)
    free = ~state.alive                                    # [..., P]
    e_idx = jnp.cumsum(free.astype(jnp.int32), axis=-1) - 1
    incoming = free & (e_idx < E)
    e_safe = jnp.clip(e_idx, 0, E - 1)

    # number lost to overflow -> rescale surviving incoming multiplicities
    n_free = jnp.sum(free, axis=-1)
    e_rank = jnp.arange(E, dtype=jnp.int32)
    placed_mask = e_rank < n_free[..., None]               # [..., E]
    tot = jnp.sum(new_num, axis=-1)
    placed = jnp.sum(new_num * placed_mask, axis=-1)
    scale = jnp.where(placed > 0, tot / jnp.maximum(placed, 1e-300), 1.0)
    new_num = new_num * placed_mask * scale[..., None]

    # slot <- emission-entry mapping via a one-hot contraction over the small
    # E axis (lane-axis take_along_axis is slow on TPU)
    e_range = jnp.arange(E, dtype=jnp.int32)
    onehot = ((e_safe[..., None] == e_range) & incoming[..., None]).astype(jnp.float32)
    take_e = lambda a: jnp.einsum("...pe,...e->...p", onehot,
                                  jnp.asarray(a, jnp.float32))
    num = jnp.where(incoming, take_e(new_num), state.num)
    src = jnp.where(incoming, take_e(new_source).astype(jnp.int32), state.source)
    wcl = jnp.where(incoming, take_e(new_w_class).astype(jnp.int32), state.w_class)
    pid = jnp.where(incoming, state.next_id[..., None] + e_safe, state.pid)
    tcr = jnp.where(incoming, jnp.asarray(time, jnp.float32), state.t_create)
    volN = jnp.einsum("...pe,...se->...sp", onehot, new_vol)
    vol = jnp.where(incoming[..., None, :], volN, state.vol)
    # dead incoming entries (new_num==0) must stay dead
    live_in = incoming & (num > 0)
    vol = jnp.where((incoming & ~live_in)[..., None, :], 0.0, vol)
    # source components: a fresh particle is 100% its emitting source
    K = state.n_src_comp
    tot_v = jnp.sum(new_vol, axis=-2)                          # [..., E]
    sv_new = jnp.concatenate(
        [tot_v[..., None, :],
         jnp.zeros((*tot_v.shape[:-1], K - 1, tot_v.shape[-1]))], axis=-2)
    si_new = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(new_source, jnp.float32),
                          tot_v.shape)[..., None, :],
         jnp.full((*tot_v.shape[:-1], K - 1, tot_v.shape[-1]), -1.0)],
        axis=-2)
    svN = jnp.einsum("...pe,...ke->...kp", onehot, sv_new)
    siN = jnp.einsum("...pe,...ke->...kp", onehot, si_new)
    inc_k = incoming[..., None, :]
    src_vol = jnp.where(inc_k, svN, state.src_vol)
    src_vol = jnp.where((incoming & ~live_in)[..., None, :], 0.0, src_vol)
    src_id = jnp.where(inc_k, jnp.round(siN).astype(jnp.int32), state.src_id)
    hyst = jnp.where(incoming, 1, state.hyst_leg)
    return dataclasses.replace(
        state, vol=vol, num=jnp.where(incoming & ~live_in, 0.0, num),
        pid=pid, source=src, w_class=wcl, t_create=tcr,
        next_id=state.next_id + E, src_vol=src_vol, src_id=src_id,
        hyst_leg=hyst)


def _add_particles_large(state: AeroState, new_vol, new_num, new_source,
                         new_w_class, time=0.0) -> AeroState:
    """add_particles via scatter_rows: entry e -> the cell's e-th free slot
    (slot index found with a tiny iota scatter + gather, no [P, E] one-hot)."""
    from ...ops.place import gather_rows, scatter_rows

    P = state.capacity
    E = new_num.shape[-1]
    S = state.vol.shape[-2]
    K = state.n_src_comp
    cs = state.cell_shape
    C = 1
    for s in cs:
        C *= s
    free = ~state.alive
    f_rank = jnp.cumsum(free.astype(jnp.int32), axis=-1) - 1
    n_free = jnp.sum(free, axis=-1)

    # overflow rescale (conserve represented number)
    e_rank = jnp.arange(E, dtype=jnp.int32)
    placed_mask = e_rank < n_free[..., None]
    tot = jnp.sum(new_num, axis=-1)
    placed = jnp.sum(new_num * placed_mask, axis=-1)
    scale = jnp.where(placed > 0, tot / jnp.maximum(placed, 1e-300), 1.0)
    new_num = jnp.asarray(new_num) * placed_mask * scale[..., None]

    # slot index (+1) of the r-th free slot
    slot1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1, P), 2) + 1
             ).astype(jnp.float32)
    dstf = jnp.where(free & (f_rank < E), f_rank, -1).reshape(C, P)
    slot_of_rank = scatter_rows(slot1, dstf, E)            # [C, 1, E]
    live_e = (new_num > 0) & placed_mask
    srcr = jnp.where(live_e, e_rank, -1).reshape(C, E)
    dst_slot = jnp.round(gather_rows(slot_of_rank, srcr)[:, 0, :]
                         ).astype(jnp.int32) - 1           # [C, E]

    # incoming payload rows (channel layout of pack_payload) + indicator
    f = lambda a: jnp.broadcast_to(jnp.asarray(a, jnp.float32),
                                   (*cs, E)).reshape(C, E)
    pid = state.next_id[..., None] + e_rank
    tot_v = jnp.sum(new_vol, axis=-2)
    parts = [f(new_num), f(jnp.asarray(time, jnp.float32)),
             f(pid % _PID_SPLIT), f(pid // _PID_SPLIT),
             f(new_source), f(new_w_class)]
    parts += [jnp.broadcast_to(new_vol[..., s, :], (*cs, E)).reshape(C, E)
              for s in range(S)]
    parts += [f(tot_v)] + [jnp.zeros((C, E), jnp.float32)] * (K - 1)
    parts += [f(new_source)] + [jnp.full((C, E), -1.0)] * (K - 1)
    parts.append(jnp.ones((C, E), jnp.float32))            # hyst_leg (fresh=1)
    parts.append(jnp.ones((C, E), jnp.float32))            # indicator
    rows = jnp.stack(parts, axis=1)                        # [C, CH+1, E]
    placed_rows = scatter_rows(rows, dst_slot, P)          # [C, CH+1, P]
    taken = placed_rows[:, -1, :] > 0.5
    merged = jnp.where(taken[:, None, :], placed_rows[:, :-1, :],
                       pack_payload(state))
    out = unpack_payload(state, merged)
    return dataclasses.replace(out, next_id=state.next_id + E)


def thin(state: AeroState, keep_prob, key) -> AeroState:
    """Keep each alive particle with probability ``keep_prob`` (per cell,
    broadcastable), dividing kept multiplicities by keep_prob so total
    represented number is conserved in expectation.  This is the
    weight-rescale/halving primitive (``aero_state_scale_weight``,
    ``wrf_pmc_trans_aero.F90:1374-1402``)."""
    u = jax.random.uniform(key, state.num.shape)
    kp = jnp.broadcast_to(jnp.asarray(keep_prob)[..., None], state.num.shape)
    keep = (u < kp) & state.alive
    num = jnp.where(keep, state.num / jnp.maximum(kp, 1e-12), 0.0)
    return dataclasses.replace(
        state, num=num,
        vol=jnp.where(keep[..., None, :], state.vol, 0.0))


def split_largest(state: AeroState) -> AeroState:
    """Double the particle count by splitting each alive particle into two
    halves of equal composition and half multiplicity (conserves number and
    mass exactly) — the static-shape analogue of ``aero_state_double``.
    Works on fragmented populations: the r-th free slot receives a copy of
    the r-th alive particle (one duplicating one-hot gather).  Cells with
    2 * n_alive > capacity are left untouched."""
    from ...ops.place import gather_rows

    P = state.capacity
    alive = state.alive
    n0 = state.n_alive()
    can = (2 * n0 <= P)

    a_rank = jnp.cumsum(alive.astype(jnp.int32), axis=-1) - 1
    f_rank = jnp.cumsum((~alive).astype(jnp.int32), axis=-1) - 1
    # slot index of the r-th alive particle, via a tiny iota scatter
    from ...ops.place import scatter_rows

    C = 1
    for s in state.cell_shape:
        C *= s
    slot1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1, P), 2) + 1
             ).astype(jnp.float32)
    dst = jnp.where(alive, a_rank, -1).reshape(C, P)
    slot_of_rank = scatter_rows(slot1, dst, P)             # [C, 1, P]
    # src: free slot with rank r copies from slot_of_rank[r]
    is_copy = (~alive) & (f_rank < n0[..., None]) & can[..., None]
    src = jnp.where(is_copy, f_rank, -1).reshape(C, P)
    src_slot = jnp.round(gather_rows(slot_of_rank, src)[:, 0, :]
                         ).astype(jnp.int32) - 1           # [C, P]; -1 none
    copies_pl = gather_rows(pack_payload(state), src_slot)
    copied = unpack_payload(state, copies_pl)

    is_copy = is_copy & (copied.num > 0.0)
    halve = (alive & can[..., None]) | is_copy

    def merge(orig, cp):
        if orig.ndim == is_copy.ndim + 1:                  # [..., S/K, P]
            return jnp.where(is_copy[..., None, :], cp, orig)
        return jnp.where(is_copy, cp, orig)

    num = jnp.where(halve, merge(state.num, copied.num) * 0.5,
                    state.num)
    pid = jnp.where(is_copy, state.next_id[..., None] + f_rank, state.pid)
    return dataclasses.replace(
        state, num=num, pid=pid,
        t_create=merge(state.t_create, copied.t_create),
        source=merge(state.source, copied.source),
        w_class=merge(state.w_class, copied.w_class),
        vol=merge(state.vol, copied.vol),
        src_vol=merge(state.src_vol, copied.src_vol),
        src_id=merge(state.src_id, copied.src_id),
        hyst_leg=merge(state.hyst_leg, copied.hyst_leg),
        next_id=state.next_id + jnp.where(can, n0, 0))


def rebalance(state: AeroState, key, n_ideal: int, allow_halving=True,
              allow_doubling=True) -> AeroState:
    """Keep per-cell computational-particle counts near ``n_ideal``
    (``aero_state_rebalance``, called at ``wrf_pmc_driver.F90:248-251`` and
    after transport ``wrf_pmc_trans_aero.F90:777-804``).  Halving is a pure
    elementwise thin; doubling (the expensive duplicating pass) runs under a
    global ``lax.cond`` so steady-state steps skip it entirely."""
    st = state
    if allow_halving:
        n = st.n_alive()
        need = n >= 2 * n_ideal
        kp = jnp.where(need, 0.5, 1.0)
        st = thin(st, kp, key)
    if allow_doubling:
        n = st.n_alive()
        need = (n > 0) & (n < n_ideal // 2)

        def dbl(s):
            doubled = split_largest(s)
            pick = lambda a, b: jnp.where(
                need.reshape(need.shape + (1,) * (a.ndim - need.ndim)), a, b)
            return jax.tree.map(pick, doubled, s)

        st = jax.lax.cond(jnp.any(need), dbl, lambda s: s, st)
    return st
