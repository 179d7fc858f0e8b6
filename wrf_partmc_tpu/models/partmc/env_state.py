"""Per-cell scalar environment.

Equivalent of PartMC's ``env_state_t`` as extended for WRF
(``wrf_pmc_init.F90:188-225,391-401``; fields updated from WRF each step in
``wrf_to_partmc``, ``wrf_pmc_driver.F90:576-644``).  All members are arrays
broadcastable over the cell batch shape [...] so one EnvState serves both the
0-D box model (shape ()) and the 3-D coupled model (shape [nz, ny, nx]).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ... import constants as c


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvState:
    temp: jax.Array           # [K]
    pressure: jax.Array       # [Pa]
    rel_humid: jax.Array      # [0-1]; clamped like the reference (driver :664)
    height: jax.Array         # cell-center height [m]
    cell_volume: jax.Array    # [m3] (get_grid_cell_volume, driver :2002)
    ustar: jax.Array          # friction velocity [m s-1] (deposition)
    elapsed_time: jax.Array   # [s]

    @property
    def air_density(self) -> jax.Array:
        return self.pressure / (c.R_D * self.temp)

    @property
    def air_mean_free_path(self) -> jax.Array:
        """Mean free path of air molecules [m] (slip correction input)."""
        return (2.0 * c.AIR_DYN_VISC
                / (self.pressure * jnp.sqrt(8.0 * c.AIR_MOLEC_WEIGHT
                                            / (jnp.pi * c.UNIV_GAS_CONST * self.temp))))

    @property
    def kelvin_A(self) -> jax.Array:
        """Kelvin coefficient A [m] in exp(A/D) of the Koehler equation."""
        return (4.0 * c.WATER_MOLEC_WEIGHT * c.WATER_SURF_ENERGY
                / (c.UNIV_GAS_CONST * self.temp * c.WATER_DENSITY))


def make_env_state(temp=298.15, pressure=1.0e5, rel_humid=0.5, height=50.0,
                   cell_volume=1.0, ustar=0.3, elapsed_time=0.0,
                   cell_shape=()) -> EnvState:
    full = lambda v: jnp.full(cell_shape, v, jnp.float32)
    return EnvState(temp=full(temp), pressure=full(pressure),
                    rel_humid=full(jnp.clip(rel_humid, 0.001, 0.95)),
                    height=full(height), cell_volume=full(cell_volume),
                    ustar=full(ustar), elapsed_time=full(elapsed_time))
