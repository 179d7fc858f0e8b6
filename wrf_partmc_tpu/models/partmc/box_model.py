"""0-D particle-resolved box model — the standalone-PartMC driver.

The reference couples PartMC into WRF, but PartMC itself is fundamentally a
box model (``run_part`` over one ``aero_state``); the coupled driver calls
the same per-cell sequence the standalone program runs
(``interface/wrf_pmc_driver.F90:169-254``: coagulation -> scenario
emissions/dilution -> MOSAIC gas+aerosol chemistry -> water equilibrium).
This module provides that standalone loop over a single well-mixed parcel
with time-varying environment (temperature, RH, mixing height, photolysis
zenith) and scenario forcing — the harness for trajectory-level validation
against published PartMC-MOSAIC results (urban plume: Riemer, West, Zaveri
& Easter, JGR 114 D09202, 2009; mixing-state metrics: Riemer & West, ACP
13 11423, 2013) and the reference's own em_scm_xy inputs
(``WRFV3/test/em_scm_xy/test.spec``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .aero_data import AeroData
from .aero_state import AeroState, rebalance, zero_state
from .coag import KERNEL_BROWN, coag_step
from .condense import equilib_water_hyst
from .env_state import EnvState
from .gas_data import GasData
from .scenario import Scenario, update_aero_state, update_gas_state
from ...utils import rng


@dataclass
class BoxEnv:
    """Prescribed environment time functions for the parcel (the reference
    reads these from temp/height/pres profiles; ``env_state_t`` update).
    Each is a python callable t[s] -> float, evaluated host-side per step
    (the box loop is host-driven like ``run_part``)."""
    temp: Callable          # [K]
    rel_humid: Callable     # [0-1]
    pressure: Callable      # [Pa]
    height: Callable        # mixing height [m]
    cosz: Callable          # cosine solar zenith


def make_env_state(benv: BoxEnv, t, cell_shape=(1, 1, 1)) -> EnvState:
    f = lambda v: jnp.full(cell_shape, float(v), jnp.float32)
    return EnvState(temp=f(benv.temp(t)), pressure=f(benv.pressure(t)),
                    rel_humid=f(benv.rel_humid(t)),
                    height=f(0.5 * benv.height(t)),
                    cell_volume=f(1.0),          # unit volume: num == conc
                    ustar=f(0.3),
                    elapsed_time=jnp.asarray(t, jnp.float32))


def run_box(aero: AeroState, gas, scn: Scenario, benv: BoxEnv,
            aero_data: AeroData, gas_data: GasData, mech,
            t_end: float, dt: float, seed: int = 0,
            n_ideal: int | None = None, n_emit_slots: int = 8,
            do_coag: bool = True, do_chem: bool = True,
            n_sub_gas: int = 6, n_sub_astem: int = 4,
            observer=None):
    """Run the parcel from t=0 to t_end with macro-step dt (the PartMC
    ``run_part`` loop: coag -> emissions/dilution -> chemistry -> water).

    ``observer(t, aero, gas, env)``: optional host callback after each step
    (trajectory recording).  Returns (aero, gas)."""
    from .mosaic import mosaic_timestep

    base = rng.base_key(seed)
    P = aero.capacity
    n_ideal = n_ideal or (P // 2)
    step_i = 0
    t = 0.0

    @jax.jit
    def jit_step(aero, gas, env, step, cosz_v):
        keys = {s: rng.step_key(base, step, s)
                for s in (rng.STREAM_COAG, rng.STREAM_EMISSION,
                          rng.STREAM_REBALANCE)}
        gas = update_gas_state(scn, gas, env.elapsed_time, dt)
        aero = update_aero_state(scn, aero, aero_data,
                                 env.elapsed_time, dt,
                                 keys[rng.STREAM_EMISSION], n_emit_slots,
                                 env.cell_volume)
        if do_coag:
            aero = coag_step(aero, aero_data, env, dt,
                             keys[rng.STREAM_COAG], kernel=KERNEL_BROWN)
        if do_chem:
            aero, gas = mosaic_timestep(mech, aero, gas, gas_data,
                                        aero_data, env, dt, cosz_v,
                                        n_sub_gas=n_sub_gas,
                                        n_sub_astem=n_sub_astem)
            aero = equilib_water_hyst(aero, aero_data, env)
        aero = rebalance(aero, keys[rng.STREAM_REBALANCE], n_ideal,
                         True, True)
        return aero, gas

    while t < t_end - 1e-6:
        env = make_env_state(benv, t)
        aero, gas = jit_step(aero, gas, env,
                             jnp.asarray(step_i, jnp.int32),
                             jnp.asarray(benv.cosz(t), jnp.float32))
        t += dt
        step_i += 1
        if observer is not None:
            observer(t, aero, gas, env)
    return aero, gas
