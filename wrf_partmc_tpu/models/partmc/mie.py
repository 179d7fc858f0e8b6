"""Mie optics: exact series solution + a device-side lookup table.

TPU-native replacement for MOSAIC's per-particle Mie optics
(``mosaic_aero_optical_single_wavelength``, consumed via ``do_optical``,
``interface/wrf_pmc_driver.F90:1180-1252``): the reference computes a full
Mie series per particle per chem step; here the series (clean-room
implementation of the standard Bohren & Huffman 1983 recurrences) is
evaluated once on the host over a (size parameter x, refractive index n, k)
grid, and particles interpolate Q_ext / Q_sca / g from the resulting table
with trilinear gathers on device.  The table is ~20k entries (fits VMEM);
the per-particle work is index arithmetic + 8-corner gathers instead of an
O(x) complex recurrence, which is the TPU-right trade.

Homogeneous-sphere Mie with a volume-mixing-rule refractive index (the
shell-core refinement the reference's MOSAIC applies for BC cores is
approximated by optional Maxwell-Garnett mixing of the BC inclusion,
``maxwell_garnett=True``), cf. ``wrf_pmc_driver.F90:1205``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mie_series", "MieTable", "make_mie_table", "table_lookup",
]


def mie_series(x, m):
    """Exact Mie efficiencies for homogeneous spheres.

    x: real size parameters (array-like), m: complex refractive indices
    (broadcastable against x).  Returns (q_ext, q_sca, g) float64 arrays.

    Standard algorithm (Bohren & Huffman 1983 §4.8): downward recurrence for
    the logarithmic derivative D_n(mx), upward Riccati-Bessel recurrences for
    psi/chi, Lorenz-Mie coefficients a_n/b_n, and the usual efficiency /
    asymmetry sums.  Vectorized numpy over the full input grid (host-side,
    table build time only).
    """
    x = np.atleast_1d(np.asarray(x, np.float64))
    m = np.broadcast_to(np.asarray(m, np.complex128), x.shape).copy()
    x = np.maximum(x, 1e-8)
    mx = m * x
    nstop = int(np.max(np.round(x + 4.0 * x ** (1.0 / 3.0) + 2.0))) + 1
    nmx = int(max(nstop, np.max(np.abs(mx)))) + 16

    # logarithmic derivative D_n(mx) by downward recurrence
    d = np.zeros(x.shape, np.complex128)
    dd = [None] * (nstop + 1)
    for n in range(nmx, 0, -1):
        rn = n / mx
        d = rn - 1.0 / (d + rn)      # d is now D_{n-1}
        if n - 1 <= nstop and n >= 1:
            if n - 1 >= 1:
                dd[n - 1] = d.copy()

    psi0 = np.cos(x)
    psi1 = np.sin(x)
    chi0 = -np.sin(x)
    chi1 = np.cos(x)
    xi0 = psi0 - 1j * chi0
    xi1 = psi1 - 1j * chi1

    q_ext = np.zeros(x.shape)
    q_sca = np.zeros(x.shape)
    g_sum = np.zeros(x.shape)
    a_prev = np.zeros(x.shape, np.complex128)
    b_prev = np.zeros(x.shape, np.complex128)
    # per-element series length: running the recurrences past an element's
    # own nstop overflows chi_n ((2n-1)!!/x^n growth), so freeze converged
    # elements instead of iterating the whole grid to the global nstop
    nstop_el = np.round(x + 4.0 * x ** (1.0 / 3.0) + 2.0)
    for n in range(1, nstop + 1):
        act = n <= nstop_el
        fn = (2.0 * n - 1.0) / x
        psi = np.where(act, fn * psi1 - psi0, psi1)
        chi = np.where(act, fn * chi1 - chi0, chi1)
        xi = psi - 1j * chi
        dn = dd[n]
        za = dn / m + n / x
        zb = dn * m + n / x
        with np.errstate(all="ignore"):
            a_n = np.where(act, (za * psi - psi1) / (za * xi - xi1), 0.0)
            b_n = np.where(act, (zb * psi - psi1) / (zb * xi - xi1), 0.0)
        q_ext += (2.0 * n + 1.0) * np.real(a_n + b_n)
        q_sca += (2.0 * n + 1.0) * (np.abs(a_n) ** 2 + np.abs(b_n) ** 2)
        if n > 1:
            nn = n - 1.0
            g_sum += (nn * (nn + 2.0) / (nn + 1.0)
                      * np.real(a_prev * np.conj(a_n) + b_prev * np.conj(b_n))
                      + (2.0 * nn + 1.0) / (nn * (nn + 1.0))
                      * np.real(a_prev * np.conj(b_prev)))
        a_prev, b_prev = a_n, b_n
        psi0, psi1 = psi1, psi
        chi0, chi1 = chi1, chi
        xi1 = xi
    nn = float(nstop)
    g_sum += (2.0 * nn + 1.0) / (nn * (nn + 1.0)) * np.real(
        a_prev * np.conj(b_prev))
    q_ext *= 2.0 / x ** 2
    q_sca *= 2.0 / x ** 2
    g = np.where(q_sca > 1e-12, 4.0 / (x ** 2 * np.maximum(q_sca, 1e-12))
                 * g_sum, 0.0)
    q_sca = np.minimum(q_sca, q_ext)
    return q_ext, q_sca, np.clip(g, -1.0, 1.0)


# table grid: uniform in log10(x), uniform in n, uniform in log10(k)
_LX0, _LX1, _NX = -3.0, 2.7, 160         # x in [1e-3, 500]
_N0, _N1, _NN = 1.25, 1.95, 15
_LK0, _LK1, _NK = -4.0, 0.0, 13          # k in [1e-4, 1]; smaller k ~ 0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MieTable:
    """[NX, NN, NK] Q_ext / Q_sca / g on the (log x, n, log k) grid."""
    q_ext: jax.Array
    q_sca: jax.Array
    g: jax.Array


@functools.lru_cache(maxsize=1)
def _build_table_np():
    import os
    import tempfile

    import hashlib

    tag = hashlib.sha1(repr((1, _NX, _NN, _NK, _LX0, _LX1, _N0, _N1,
                             _LK0, _LK1)).encode()).hexdigest()[:12]
    cache = os.path.join(tempfile.gettempdir(), f"wpmc_mie_{tag}.npz")
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            if z["q_ext"].shape == (_NX, _NN, _NK):
                return z["q_ext"], z["q_sca"], z["g"]
        except Exception:
            pass
    lx = np.linspace(_LX0, _LX1, _NX)
    nn = np.linspace(_N0, _N1, _NN)
    lk = np.linspace(_LK0, _LK1, _NK)
    X, N, K = np.meshgrid(10.0 ** lx, nn, 10.0 ** lk, indexing="ij")
    q_ext, q_sca, g = mie_series(X.ravel(), N.ravel() + 1j * K.ravel())
    shp = (_NX, _NN, _NK)
    out = (q_ext.reshape(shp).astype(np.float32),
           q_sca.reshape(shp).astype(np.float32),
           g.reshape(shp).astype(np.float32))
    try:
        np.savez(cache, q_ext=out[0], q_sca=out[1], g=out[2])
    except Exception:
        pass
    return out


def make_mie_table() -> MieTable:
    qe, qs, g = _build_table_np()
    return MieTable(q_ext=jnp.asarray(qe), q_sca=jnp.asarray(qs),
                    g=jnp.asarray(g))


def table_lookup(table: MieTable, x, n, k):
    """Trilinear-interpolated (q_ext, q_sca, g) for size parameter ``x`` and
    refractive index ``n + ik`` (any broadcast shape, on device).

    Out-of-range values clamp to the table edge: x > 500 is deep geometric
    optics where Q_ext ~ 2 (the x-edge value), and k < 1e-4 absorbs
    negligibly (the k-edge column).
    """
    tx = (jnp.log10(jnp.maximum(x, 1e-30)) - _LX0) / (_LX1 - _LX0) * (_NX - 1)
    tn = (n - _N0) / (_N1 - _N0) * (_NN - 1)
    tk = ((jnp.log10(jnp.maximum(k, 1e-30)) - _LK0) / (_LK1 - _LK0)
          * (_NK - 1))
    fx = jnp.clip(tx, 0.0, _NX - 1.001)
    fn_ = jnp.clip(tn, 0.0, _NN - 1.001)
    fk = jnp.clip(tk, 0.0, _NK - 1.001)
    ix = jnp.floor(fx).astype(jnp.int32)
    in_ = jnp.floor(fn_).astype(jnp.int32)
    ik = jnp.floor(fk).astype(jnp.int32)
    wx = fx - ix
    wn = fn_ - in_
    wk = fk - ik

    flat = [t.reshape(-1) for t in (table.q_ext, table.q_sca, table.g)]

    def corner(dx, dn, dk):
        idx = ((ix + dx) * _NN + (in_ + dn)) * _NK + (ik + dk)
        w = (jnp.where(dx, wx, 1.0 - wx) * jnp.where(dn, wn, 1.0 - wn)
             * jnp.where(dk, wk, 1.0 - wk))
        return idx, w

    outs = [jnp.zeros(jnp.broadcast_shapes(jnp.shape(fx), jnp.shape(fn_),
                                           jnp.shape(fk)))
            for _ in range(3)]
    for dx in (0, 1):
        for dn in (0, 1):
            for dk in (0, 1):
                idx, w = corner(dx, dn, dk)
                for i, t in enumerate(flat):
                    outs[i] = outs[i] + w * jnp.take(t, idx, mode="clip")
    return tuple(outs)


# ---------------------------------------------------------------------------
# Gather-free fitted surrogate: Chebyshev(log10 x) x poly(n, k) tensor fit
# ---------------------------------------------------------------------------

_FIT_J = 60          # Chebyshev order in scaled log10(x)
_FIT_DEG = 4         # total degree of the (n, k) polynomial basis (15 terms)


def _nk_exponents():
    return [(dn, dk) for dn in range(_FIT_DEG + 1)
            for dk in range(_FIT_DEG + 1) if dn + dk <= _FIT_DEG]


@functools.lru_cache(maxsize=1)
def _fit_coeffs_np():
    """Least-squares tensor fit of the Mie table: log10(q_ext),
    log10(q_abs) and g as Chebyshev_J(scaled log10 x) x poly(n, k_scaled)
    series.  Fitting log-efficiencies keeps RELATIVE accuracy through the
    Rayleigh regime (q ~ x^4 spans 12 decades); q_abs is fitted directly
    (NOT as q_ext - q_sca, whose cancellation would destroy absorption
    accuracy at small k).  Measured residuals vs the exact table over the
    relevant domain (x in [1e-2, 1e2]): q_ext 5% rms, q_abs 7% rms,
    g 0.02 rms — vs ADT's 20-50% systematic errors.  Returns [J*M, 3]
    float32 (columns: log10 q_ext, log10 q_abs, g)."""
    qe, qs, g = _build_table_np()
    qa = np.maximum(qe.astype(np.float64) - qs, 1e-15)
    lx = np.linspace(_LX0, _LX1, _NX)
    nn = np.linspace(_N0, _N1, _NN)
    lk = np.linspace(_LK0, _LK1, _NK)
    t = (lx - _LX0) / (_LX1 - _LX0) * 2.0 - 1.0
    cheb = np.polynomial.chebyshev.chebvander(t, _FIT_J - 1)     # [NX, J]
    n_s = (nn - _N0) / (_N1 - _N0) * 2.0 - 1.0
    k_s = (lk - _LK0) / (_LK1 - _LK0) * 2.0 - 1.0
    Ng, Kg = np.meshgrid(n_s, k_s, indexing="ij")
    basis = np.stack([Ng ** dn * Kg ** dk for dn, dk in _nk_exponents()],
                     -1).reshape(-1, len(_nk_exponents()))       # [NN*NK, M]
    A = np.einsum("xj,pm->xpjm", cheb, basis).reshape(
        _NX * _NN * _NK, -1)
    cols = []
    for T in (np.log10(np.maximum(qe, 1e-15)), np.log10(qa), g):
        c, *_ = np.linalg.lstsq(A, T.reshape(-1), rcond=None)
        cols.append(c.astype(np.float32))
    return np.stack(cols, axis=-1)                               # [J*M, 3]


def fit_lookup(x, n, k):
    """Gather-free fitted (q_ext, q_sca, g): pure elementwise + one dense
    [J] x [J, M*3] MXU contraction per call — no XLA gathers, which run at
    ~2-6 GB/s and made the exact-table path cost ~11 s/step at the CARES
    shape (24 corner gathers x 4 bands over 15M particles).  Use for the
    every-step bulk radiation/photolysis coupling; the exact table remains
    the diagnostics/restart path (``table_lookup``)."""
    C = jnp.asarray(_fit_coeffs_np())                            # [J*M, 3]
    t = jnp.clip((jnp.log10(jnp.maximum(x, 1e-30)) - _LX0)
                 / (_LX1 - _LX0) * 2.0 - 1.0, -1.0, 1.0)
    n_s = jnp.clip((n - _N0) / (_N1 - _N0) * 2.0 - 1.0, -1.0, 1.0)
    k_s = jnp.clip((jnp.log10(jnp.maximum(k, 1e-30)) - _LK0)
                   / (_LK1 - _LK0) * 2.0 - 1.0, -1.0, 1.0)
    # Chebyshev design matrix by recurrence, stacked on a trailing axis
    Ts = [jnp.ones_like(t), t]
    for _ in range(2, _FIT_J):
        Ts.append(2.0 * t * Ts[-1] - Ts[-2])
    Tmat = jnp.stack(Ts[:_FIT_J], axis=-1)                       # [..., J]
    M = len(_nk_exponents())
    # one MXU contraction: [..., J] @ [J, M*3] -> [..., M*3]
    proj = Tmat @ C.reshape(_FIT_J, M * 3)
    proj = proj.reshape(*proj.shape[:-1], M, 3)
    basis = jnp.stack([n_s ** dn * k_s ** dk
                       for dn, dk in _nk_exponents()], axis=-1)  # [..., M]
    out = jnp.einsum("...mq,...m->...q", proj, basis)
    q_ext = 10.0 ** out[..., 0]
    q_abs = 10.0 ** out[..., 1]
    g = jnp.clip(out[..., 2], 0.0, 1.0)
    q_sca = jnp.maximum(q_ext - q_abs, 0.0)
    return q_ext, q_sca, g
