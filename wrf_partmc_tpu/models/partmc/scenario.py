"""Time-series forcing: emissions, background dilution, lateral-BC reservoirs.

Equivalent of PartMC's ``scenario`` module (``scenario_update_gas_state`` /
``scenario_update_aero_state`` applied per cell per step at
``wrf_pmc_driver.F90:202-210``; BC background+dilution construction at
``wrf_pmc_init.F90:809-967``).

Time series are stacked arrays [T, ...]; lookup is a piecewise-constant index
(the reference uses ``aero_dist_interp_1d`` linear interpolation for BC
backgrounds, ``wrf_pmc_trans_aero.F90:834-838`` — piecewise-constant here,
upgradeable) so everything stays static-shape under jit.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .aero_data import AeroData
from .aero_state import AeroState, add_particles
from .dist import AeroDist, dist_number_conc, sample_particles


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Scenario:
    # aerosol emissions: a [T]-time-series of [M]-mode dists, rates in
    # [# m-3 s-1] (surface-flux inputs are converted by height at build time,
    # matching the reference's 1/height coupling of surface emissions)
    emit_times: jax.Array        # [T] s
    emit_dist: AeroDist          # arrays [T, M, ...]
    gas_emit_rate: jax.Array     # [T, G] ppb s-1
    # background + dilution (BC / chamber analogue)
    dilution_rate: jax.Array     # [] or [T] s-1
    back_dist: AeroDist          # arrays [M2, ...] background aerosol
    back_gas: jax.Array          # [G] ppb


def constant_scenario(aero_data: AeroData, n_gas: int, emit_dist: AeroDist,
                      gas_emit_rate=None, dilution_rate=0.0,
                      back_dist: AeroDist | None = None, back_gas=None) -> Scenario:
    """Build a time-constant scenario (single time slab)."""
    one = lambda a: jax.tree.map(lambda x: x[None, ...], a)
    if back_dist is None:
        back_dist = jax.tree.map(lambda x: jnp.zeros_like(x), emit_dist)
    if gas_emit_rate is None:
        gas_emit_rate = jnp.zeros(n_gas, jnp.float32)
    if back_gas is None:
        back_gas = jnp.zeros(n_gas, jnp.float32)
    return Scenario(emit_times=jnp.zeros(1, jnp.float32), emit_dist=one(emit_dist),
                    gas_emit_rate=jnp.asarray(gas_emit_rate, jnp.float32)[None],
                    dilution_rate=jnp.asarray(dilution_rate, jnp.float32),
                    back_dist=back_dist, back_gas=jnp.asarray(back_gas, jnp.float32))


def _time_index(times: jax.Array, t) -> jax.Array:
    return jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, times.shape[0] - 1)


def _time_weight(times: jax.Array, t):
    """(i, i+1, w): linear interpolation weights, clamped at the ends
    (aero_dist_interp_1d semantics, ``wrf_pmc_trans_aero.F90:834-838``)."""
    i = _time_index(times, t)
    j = jnp.minimum(i + 1, times.shape[0] - 1)
    span = jnp.maximum(times[j] - times[i], 1e-30)
    w = jnp.clip((jnp.asarray(t, jnp.float32) - times[i]) / span, 0.0, 1.0)
    return i, j, jnp.where(j == i, 0.0, w)


def dist_at_time(scn: Scenario, t) -> AeroDist:
    """Emission dist at time t: mode *intensities* (num_conc) linearly
    interpolated between time slabs; shape parameters from the lower slab."""
    i, j, w = _time_weight(scn.emit_times, t)
    d_i = jax.tree.map(lambda a: a[i], scn.emit_dist)
    nc_j = scn.emit_dist.num_conc[j]
    return dataclasses.replace(
        d_i, num_conc=(1.0 - w) * d_i.num_conc + w * nc_j)


def update_gas_state(scn: Scenario, gas, t, dt) -> jax.Array:
    """Gas emission + first-order dilution toward background
    (scenario_update_gas_state, driver :202-204); emission rates linearly
    interpolated in time."""
    i, j, w = _time_weight(scn.emit_times, t)
    rate = (1.0 - w) * scn.gas_emit_rate[i] + w * scn.gas_emit_rate[j]
    lam = scn.dilution_rate if scn.dilution_rate.ndim == 0 else scn.dilution_rate[i]
    g = gas + dt * rate
    return g + (1.0 - jnp.exp(-lam * dt)) * (scn.back_gas - g)


def update_aero_state(scn: Scenario, state: AeroState, aero_data: AeroData,
                      t, dt, key, n_emit_slots: int, cell_volume) -> AeroState:
    """Aerosol emission + dilution over dt (scenario_update_aero_state,
    driver :207-210): (1) thin population by exp(-lambda dt) via per-particle
    survival; (2) inject background sample of the diluted-in number;
    (3) inject emissions."""
    cell_shape = state.cell_shape
    k_dil, k_back, k_emit = jax.random.split(key, 3)
    i = _time_index(scn.emit_times, t)
    lam = scn.dilution_rate if scn.dilution_rate.ndim == 0 else scn.dilution_rate[i]
    p_out = 1.0 - jnp.exp(-lam * dt)

    # (1) dilution loss: per-particle Bernoulli removal (keeps multiplicity;
    # stochastic like the reference's per-particle sampling)
    u = jax.random.uniform(k_dil, state.num.shape)
    keep = (u >= p_out) & state.alive
    state = dataclasses.replace(
        state, num=jnp.where(keep, state.num, 0.0),
        vol=jnp.where(keep[..., None, :], state.vol, 0.0))

    def inject(state, dist, added_number, key):
        """Add a fixed-slot sample representing ``added_number`` physical
        particles per cell (zero -> dead incoming slots, compacted away)."""
        vol, num, src, wcl = sample_particles(
            key, dist, aero_data, n_emit_slots, 1.0, cell_shape)
        tot = dist_number_conc(dist)  # sample_particles total (volume=1)
        scale = jnp.asarray(added_number / jnp.maximum(tot, 1e-300), jnp.float32)
        num = num * scale[..., None]
        return add_particles(state, vol, num, src, wcl, time=t)

    # (2) background in-mixing: diluted-in number = back_conc * p_out * V
    n_back_add = dist_number_conc(scn.back_dist) * p_out * cell_volume
    state = inject(state, scn.back_dist, n_back_add, k_back)

    # (3) emissions: added number = rate * dt * V
    edist = dist_at_time(scn, t)
    e_add = dist_number_conc(edist) * dt * cell_volume
    return inject(state, edist, e_add, k_emit)
