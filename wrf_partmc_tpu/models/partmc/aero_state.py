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
        NUM_CONC_a## tracers, ``wrf_pmc_driver.F90:1710-1716``)."""
        onehot = jax.nn.one_hot(self.w_class, n_class, dtype=self.num.dtype)
        return jnp.einsum("...p,...pc->...c", self.num, onehot)

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
    )


def payload_channels(state: AeroState) -> int:
    """Row width of the packed per-particle payload."""
    return 5 + state.vol.shape[-2] + 2 * state.n_src_comp


def _pack_payload(state: AeroState):
    """All per-particle fields as one [N, CH] f32 row matrix (ints bitcast).

    TPU performance note: per-cell ``take_along_axis`` along the particle
    (lane) axis lowers to slow element gathers; packing fields into rows and
    gathering whole rows from the flattened pool is ~100x faster (measured),
    so every slot-permutation in this module goes through this payload.

    Layout: [num, t_create, pid, source, w_class, vol(S), src_vol(K),
    src_id(K)]."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    payload = jnp.concatenate(
        [state.num[..., None], state.t_create[..., None],
         bc(state.pid)[..., None], bc(state.source)[..., None],
         bc(state.w_class)[..., None],
         jnp.moveaxis(state.vol, -2, -1),
         jnp.moveaxis(state.src_vol, -2, -1),
         jnp.moveaxis(bc(state.src_id), -2, -1)], axis=-1)
    return payload.reshape(-1, payload_channels(state))


def _unpack_payload(state: AeroState, rows) -> AeroState:
    """Inverse of _pack_payload; rows: [*cell_shape, P, CH]."""
    ic = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    S = state.vol.shape[-2]
    K = state.n_src_comp
    return dataclasses.replace(
        state,
        num=rows[..., 0], t_create=rows[..., 1],
        pid=ic(rows[..., 2]), source=ic(rows[..., 3]),
        w_class=ic(rows[..., 4]),
        vol=jnp.moveaxis(rows[..., 5:5 + S], -1, -2),
        src_vol=jnp.moveaxis(rows[..., 5 + S:5 + S + K], -1, -2),
        src_id=ic(jnp.moveaxis(rows[..., 5 + S + K:], -1, -2)))


def _flat_base(state: AeroState):
    """[*cell_shape, 1] flat row offset of each cell's slot 0."""
    P = state.capacity
    cells = 1
    for s in state.cell_shape:
        cells *= s
    base = jnp.arange(cells, dtype=jnp.int32) * P
    return base.reshape(state.cell_shape + (1,))


def _gather_p(state: AeroState, idx, valid) -> AeroState:
    """Reorder/select particle slots: new slot p <- old slot idx[..., p],
    masked dead where ~valid.  One packed flat row gather."""
    payload = _pack_payload(state)
    gidx = _flat_base(state) + idx                 # [*cell, P] flat rows
    rows = payload[gidx]                            # [*cell, P, 5+S]
    rows = jnp.where(valid[..., None], rows, 0.0)
    return _unpack_payload(state, rows)


def compact(state: AeroState) -> AeroState:
    """Stable-move alive particles to the front of the P axis
    (replaces the reference's ``aero_sorted`` re-sort, trans_aero step 6)."""
    dead = (~state.alive).astype(jnp.int32)
    idx = jnp.argsort(dead, axis=-1, stable=True)
    valid = jnp.take_along_axis(state.alive, idx, axis=-1)
    return _gather_p(state, idx, valid)


def add_particles(state: AeroState, new_vol, new_num, new_source, new_w_class,
                  time=0.0) -> AeroState:
    """Append up to E new particles per cell into free slots.

    new_vol: [..., S, E]; new_num/[...]: [..., E].
    Entries with new_num == 0 become dead slots (cleaned by the trailing
    compact).  Overflow beyond capacity is dropped with its number conserved
    by rescaling the surviving new particles (the static-shape analogue of
    weight rescaling under convergent flow,
    ``wrf_pmc_trans_aero.F90:1374-1402``).
    """
    state = compact(state)
    P = state.capacity
    E = new_num.shape[-1]
    n0 = state.n_alive()[..., None]                        # [..., 1]
    slot = jnp.arange(P, dtype=jnp.int32)                  # [P]
    e_idx = slot - n0                                      # broadcast [..., P]
    incoming = (e_idx >= 0) & (e_idx < E)
    e_safe = jnp.clip(e_idx, 0, E - 1)

    # number lost to overflow -> rescale surviving incoming multiplicities
    n_free = P - n0[..., 0]
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
    return dataclasses.replace(
        state, vol=vol, num=jnp.where(incoming & ~live_in, 0.0, num),
        pid=pid, source=src, w_class=wcl, t_create=tcr,
        next_id=state.next_id + E, src_vol=src_vol, src_id=src_id)


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
    st = dataclasses.replace(
        state, num=num,
        vol=jnp.where(keep[..., None, :], state.vol, 0.0))
    return compact(st)


def split_largest(state: AeroState) -> AeroState:
    """Double the particle count of under-populated cells by splitting each
    alive particle into two halves of equal composition and half multiplicity
    (conserves number and mass exactly) — the static-shape analogue of
    ``aero_state_double``. Requires compacted state; no-ops on cells where
    2 * n_alive > capacity."""
    P = state.capacity
    n0 = state.n_alive()[..., None]
    can = (2 * n0[..., 0] <= P)[..., None]
    slot = jnp.arange(P, dtype=jnp.int32)
    is_copy = (slot >= n0) & (slot < 2 * n0) & can
    src_idx = jnp.where(is_copy, slot - n0, slot)
    valid = jnp.take_along_axis(state.alive, src_idx, axis=-1) & (is_copy | (slot < n0))
    st = _gather_p(state, src_idx, valid)
    halve = (is_copy | ((slot < n0) & can)) & valid
    num = jnp.where(halve, st.num * 0.5, st.num)
    pid = jnp.where(is_copy, state.next_id[..., None] + (slot - n0), st.pid)
    return dataclasses.replace(st, num=num, pid=pid,
                               next_id=state.next_id + jnp.where(can[..., 0], n0[..., 0], 0))


def rebalance(state: AeroState, key, n_ideal: int, allow_halving=True,
              allow_doubling=True) -> AeroState:
    """Keep per-cell computational-particle counts near ``n_ideal``
    (``aero_state_rebalance``, called at ``wrf_pmc_driver.F90:248-251`` and
    after transport ``wrf_pmc_trans_aero.F90:777-804``)."""
    st = state
    if allow_halving:
        n = st.n_alive()
        need = n >= 2 * n_ideal
        kp = jnp.where(need, 0.5, 1.0)
        st = thin(st, kp, key)
    if allow_doubling:
        n = st.n_alive()
        need = (n > 0) & (n < n_ideal // 2)
        # split only in cells that need it: mask by leaving others untouched
        doubled = split_largest(st)
        pick = lambda a, b: jnp.where(
            need.reshape(need.shape + (1,) * (a.ndim - need.ndim)), a, b)
        st = jax.tree.map(pick, doubled, st)
    return st
