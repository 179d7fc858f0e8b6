"""Moist-thermodynamic helpers (share/module_model_constants-adjacent)."""

from __future__ import annotations

import jax.numpy as jnp

from ... import constants as c


def saturation_vapor_pressure(temp):
    """Tetens formula [Pa] over liquid water."""
    tc = temp - 273.15
    return 610.78 * jnp.exp(17.27 * tc / jnp.maximum(tc + 237.3, 1.0))


def saturation_mixing_ratio(temp, pressure):
    es = saturation_vapor_pressure(temp)
    return c.EPS_VAP * es / jnp.maximum(pressure - es, 1.0)


def relative_humidity(qv, temp, pressure, clip=(0.001, 0.95)):
    """RH from vapor mixing ratio, clamped like the reference coupling
    (``wrf_pmc_driver.F90:664`` clamps to [0.1, 0.95])."""
    rh = qv / jnp.maximum(saturation_mixing_ratio(temp, pressure), 1e-10)
    return jnp.clip(rh, clip[0], clip[1])
