"""0-D particle-resolved box model (the PartMC urban-plume analogue).

This is the standalone microphysics slice of the coupled model: the same
per-cell step sequence as ``partmc_timestep`` (``wrf_pmc_driver.F90:169-254``)
— coagulation, gas emissions/dilution, aerosol emissions/dilution, optional
equilibrium water and dry deposition, population rebalance — with no
transport.  It runs on any cell batch shape, so the 3-D coupled driver calls
exactly this code for its microphysics stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...config import PartmcConfig
from ...utils import rng
from .aero_data import AeroData
from .aero_state import AeroState, rebalance
from .coag import KERNEL_BROWN, coag_step
from .condense import equilib_water
from .deposition import deposit_step
from .env_state import EnvState
from .gas_data import GasData
from .scenario import Scenario, update_aero_state, update_gas_state


class BoxState(NamedTuple):
    aero: AeroState
    gas: jax.Array          # [..., G] ppb
    t: jax.Array            # scalar elapsed time [s]


def box_step(box: BoxState, aero_data: AeroData, env: EnvState, scn: Scenario,
             cfg: PartmcConfig, dt, key, kernel: str = KERNEL_BROWN,
             dz=None) -> BoxState:
    """One microphysics macro-step of length ``dt`` (= partmc_chem_dt in the
    coupled model)."""
    aero, gas, t = box
    k_coag, k_scn, k_dep, k_reb = jax.random.split(key, 4)

    if cfg.do_coagulation:
        aero = coag_step(aero, aero_data, env, dt, k_coag, kernel=kernel)
    gas = update_gas_state(scn, gas, t, dt)
    if cfg.do_emission:
        aero = update_aero_state(scn, aero, aero_data, t, dt, k_scn,
                                 cfg.n_emit_slots, env.cell_volume)
    if cfg.do_condensation:
        aero = equilib_water(aero, aero_data, env)
    if cfg.do_deposition and dz is not None:
        aero = deposit_step(aero, aero_data, env, dt, dz, k_dep)
    aero = rebalance(aero, k_reb, cfg.num_particles,
                     allow_halving=cfg.allow_halving,
                     allow_doubling=cfg.allow_doubling)
    return BoxState(aero=aero, gas=gas, t=t + dt)


def run_box(box: BoxState, aero_data: AeroData, env: EnvState, scn: Scenario,
            cfg: PartmcConfig, dt, n_steps: int, seed: int = 0,
            kernel: str = KERNEL_BROWN, dz=None) -> BoxState:
    """jit-compiled scan over n_steps box steps."""
    key0 = rng.base_key(seed)

    def step(carry, i):
        k = rng.step_key(key0, i, rng.STREAM_COAG)
        return box_step(carry, aero_data, env, scn, cfg, dt, k,
                        kernel=kernel, dz=dz), None

    out, _ = jax.lax.scan(step, box, jnp.arange(n_steps))
    return out
