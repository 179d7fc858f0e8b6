"""Radiation driver: Dudhia-class shortwave + gray-emissivity longwave with
the PartMC aerosol direct effect.

Reference parity: ``phys/module_radiation_driver.F`` called at
``dyn_em/module_first_rk_step_part1.F:242``; the PartMC coupling feeds bulk
aerosol optics ``tauaer1-4/gaer/waer`` into the SW scheme when
``do_optical`` (``interface/wrf_pmc_driver.F90:2025-2097``).  The reference
uses RRTMG/Dudhia from the 522 k-line physics suite; this module provides a
TPU-native column scheme of the same class:

* SW — Dudhia (1989)-style single downward pass: beam attenuation by water
  vapor absorption (Lacis-Hansen-type path fit), Rayleigh + aerosol
  extinction split into absorbed (heats the layer), backscattered-to-space
  (lost) and forward-scattered (continues) parts using the PartMC
  ``tau/w0/g`` per band; surface reflection with a second absorbing pass.
* LW — broadband gray emissivity: layer emissivity from the water-vapor
  path, one upward and one downward ``lax.scan``-free cumulative sweep
  (matrix-free exchange with space/surface; Sasamori-style).

All arrays are whole-domain [nz, ny, nx]; columns are vectorized (no
per-column loop) and the vertical sweeps are cumulative ops XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import constants as c

SOLAR_CONST = 1361.0          # [W m-2]
# solar spectral weights for the 4 coupled aerosol bands (0.3/0.4/0.6/1.0 um)
BAND_WEIGHTS = (0.12, 0.28, 0.35, 0.25)
STEFAN = 5.670374e-8


def _h2o_path(qv, rho, dz):
    """Downward-accumulated water vapor path [kg m-2] at layer centers.

    qv, rho: [nz, ny, nx] (k=0 is the surface layer); dz: [nz].
    """
    w_layer = qv * rho * dz.reshape(-1, 1, 1)
    # path from model top down to the top of each layer + half the layer
    from_top = jnp.cumsum(w_layer[::-1], axis=0)[::-1]
    return from_top - 0.5 * w_layer


def _h2o_absorption(path_mag):
    """Broadband SW water-vapor absorptance (Lacis & Hansen 1974 form)."""
    y = jnp.maximum(path_mag, 1e-10)
    return 2.9 * y / ((1.0 + 141.5 * y) ** 0.635 + 5.925 * y)


def shortwave(qv, rho, dz, cosz, albedo, tauaer=None, waer=None, gaer=None):
    """Dudhia-class downward SW with aerosol direct effect.

    qv/rho: [nz, ny, nx]; dz: [nz]; cosz/albedo: [ny, nx] or scalars;
    tauaer/waer/gaer: [4, nz, ny, nx] from ``bulk_optical_props`` (optional).
    Returns (heat_rate [K/s, theta], sw_sfc_down [ny, nx]).
    """
    nz = qv.shape[0]
    mu = jnp.maximum(jnp.asarray(cosz), 0.0)
    mu_c = jnp.maximum(mu, 1e-3)
    s0 = SOLAR_CONST * mu                              # TOA on horizontal

    # magnified water path above each layer (and above the surface)
    wpath = _h2o_path(qv, rho, dz) / mu_c              # [nz, ny, nx]
    w_layer = qv * rho * dz.reshape(-1, 1, 1) / mu_c
    wsfc = wpath[0] + 0.5 * w_layer[0]
    # absorption between TOA and each layer: difference of absorptance
    ab_top = _h2o_absorption(wpath)
    ab_below = _h2o_absorption(wpath + w_layer)
    dabs_h2o = jnp.maximum(ab_below - ab_top, 0.0)     # per layer fraction

    # Rayleigh + aerosol extinction per layer per band
    tau_ray = 0.05 * (rho * dz.reshape(-1, 1, 1)
                      / jnp.maximum((rho * dz.reshape(-1, 1, 1)).sum(0),
                                    1e-10))            # total ~0.05 scaled
    heat = jnp.zeros_like(qv)
    sfc = jnp.zeros_like(jnp.broadcast_to(mu * 1.0, qv.shape[1:]))
    for b, wt in enumerate(BAND_WEIGHTS):
        if tauaer is not None:
            ta = tauaer[b] / mu_c
            w0 = waer[b]
            g = gaer[b]
        else:
            ta = jnp.zeros_like(qv)
            w0 = jnp.zeros_like(qv)
            g = jnp.zeros_like(qv)
        tr = tau_ray / mu_c
        att = 1.0 - jnp.exp(-(ta + tr))                # extinct fraction
        aer_abs = att * (1.0 - w0) * ta / jnp.maximum(ta + tr, 1e-30)
        # backscatter to space: Rayleigh half, aerosol (1-g)/2
        back = att * (w0 * ta * 0.5 * (1.0 - g) + 0.5 * tr) \
            / jnp.maximum(ta + tr, 1e-30)
        # transmitted (incl. forward scatter)
        t_layer = 1.0 - aer_abs - back
        # cumulative transmission from top to layer top (layers top->down are
        # index nz-1 .. 0)
        t_rev = t_layer[::-1]
        cum_above = jnp.concatenate(
            [jnp.ones_like(t_rev[:1]),
             jnp.cumprod(t_rev, axis=0)[:-1]], axis=0)[::-1]
        flux_in = s0 * wt * cum_above                  # entering each layer
        absorbed = flux_in * (aer_abs + dabs_h2o * t_layer)
        heat = heat + absorbed
        sfc = sfc + flux_in[0] * t_layer[0]
        # reflected surface beam: one diffuse absorbing pass upward
        up = sfc * 0.0 + flux_in[0] * t_layer[0] * jnp.asarray(albedo)
        absorbed_up = up * (aer_abs + dabs_h2o * t_layer) * 0.5
        heat = heat + absorbed_up

    sw_dn = sfc
    rho_cp = rho * c.CP
    heat_rate = heat / (rho_cp * dz.reshape(-1, 1, 1))
    return heat_rate, sw_dn * (1.0 - jnp.asarray(albedo))


def longwave(temp, qv, rho, dz, t_sfc, emis_sfc=0.98):
    """Gray-emissivity broadband LW: layer emissivity from the water path.

    Returns (heat_rate [K/s], lw_sfc_down [ny, nx], olr [ny, nx]).
    """
    dzc = dz.reshape(-1, 1, 1)
    w_layer = qv * rho * dzc                           # [nz, ny, nx]
    # gray absorber: water vapor + a small well-mixed (CO2-like) part whose
    # column optical depth is ~0.5 (5e-5 per kg/m2 of air)
    eps = 1.0 - jnp.exp(-(0.33 * w_layer ** 0.5 + 5.0e-5 * rho * dzc))
    B = STEFAN * temp ** 4
    B_sfc = emis_sfc * STEFAN * jnp.asarray(t_sfc) ** 4

    nz = temp.shape[0]
    one_m = 1.0 - eps
    # downward flux at layer tops, integrating from space (F_dn[top]=0)
    def sweep(Bsrc, eps, start):
        # F(k) scan: F_below = F_above * (1-eps_k) + eps_k * B_k
        def body(carry, x):
            e, b = x
            f = carry * (1.0 - e) + e * b
            return f, f
        _, out = jax.lax.scan(body, start, (eps, Bsrc))
        return out

    # downward: iterate from top layer (index nz-1) to surface
    f_dn_layers = sweep(B[::-1], eps[::-1], jnp.zeros_like(B[0]))[::-1]
    # f_dn_layers[k] = downward flux below layer k
    lw_sfc_dn = f_dn_layers[0]
    # upward: from surface
    f_up_layers = sweep(B, eps, B_sfc)
    olr = f_up_layers[-1]

    # net flux divergence per layer -> cooling
    f_dn_top = jnp.concatenate([f_dn_layers[1:], jnp.zeros_like(B[:1])],
                               axis=0)
    f_up_bot = jnp.concatenate([B_sfc[None], f_up_layers[:-1]], axis=0)
    net_in = (f_dn_top - f_dn_layers) + (f_up_bot - f_up_layers)
    heat_rate = net_in / (rho * c.CP * dzc)
    return heat_rate, lw_sfc_dn, olr


def radiation_driver(temp, qv, rho, dz, cosz, albedo=0.2, t_sfc=None,
                     optics=None):
    """Full radiation step (radiation_driver equivalent).

    optics: BulkOptics (tauaer/waer/gaer) or None; t_sfc defaults to the
    lowest-layer temperature.  Returns (theta_heat_rate [K/s], diag dict).
    """
    if t_sfc is None:
        t_sfc = temp[0]
    ta = wa = ga = None
    if optics is not None:
        ta, wa, ga = optics.tauaer, optics.waer, optics.gaer
    sw_hr, sw_dn = shortwave(qv, rho, dz, cosz, albedo, ta, wa, ga)
    lw_hr, lw_dn, olr = longwave(temp, qv, rho, dz, t_sfc)
    return sw_hr + lw_hr, dict(sw_sfc_down=sw_dn, lw_sfc_down=lw_dn, olr=olr)
