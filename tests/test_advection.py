"""Advection operator validation: translation accuracy, positivity, mass
conservation, and captured outflow probabilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.ops.advection import (advect_pd, face_fluxes,
    flux_divergence, rk3_advect_pd)

NZ, NY, NX = 4, 8, 64
DX = 1000.0
RDX = 1.0 / DX
RHO = jnp.ones(NZ, jnp.float32)
RDZ = jnp.full((NZ,), 1e-3, jnp.float32)


def _winds(u0=10.0, v0=0.0, w0=0.0):
    u = jnp.full((NZ, NY, NX), u0, jnp.float32)
    v = jnp.full((NZ, NY, NX), v0, jnp.float32)
    w = jnp.full((NZ + 1, NY, NX), w0, jnp.float32)
    return u, v, w


def _gauss_x(x0=0.25, sigma=0.05):
    x = (jnp.arange(NX) + 0.5) / NX
    q = jnp.exp(-0.5 * ((x - x0) / sigma) ** 2)
    return jnp.broadcast_to(q, (NZ, NY, NX)).astype(jnp.float32)


def _advance(q, u, v, w, dt, n, **kw):
    def step(q, _):
        qn, probs = rk3_advect_pd(q, u, v, w, RHO, dt, RDX, RDX, RDZ, **kw)
        return qn, probs
    return jax.lax.scan(step, q, None, length=n)


def test_uniform_translation_accuracy():
    """Gaussian advected one full periodic revolution returns home."""
    u0, dt = 10.0, 25.0        # CFL = 0.25
    n = int(NX * DX / (u0 * dt))
    q0 = _gauss_x()
    qf, _ = jax.jit(lambda q: _advance(q, *_winds(u0), dt, n))(q0)
    q0n, qfn = np.asarray(q0[0, 0]), np.asarray(qf[0, 0])
    # mass conserved to roundoff
    np.testing.assert_allclose(qfn.sum(), q0n.sum(), rtol=1e-5)
    # peak lands back at the start (within one cell) with limited damping
    assert abs(int(np.argmax(qfn)) - int(np.argmax(q0n))) <= 1
    assert qfn.max() > 0.75 * q0n.max()
    # rms error small
    assert np.sqrt(np.mean((qfn - q0n) ** 2)) < 0.05


def test_positive_definite_square_wave():
    q0 = jnp.where((jnp.arange(NX) > 10) & (jnp.arange(NX) < 20), 1.0, 0.0)
    q0 = jnp.broadcast_to(q0, (NZ, NY, NX)).astype(jnp.float32)
    qf, _ = jax.jit(lambda q: _advance(q, *_winds(15.0, 0.0), 20.0, 50))(q0)
    assert float(qf.min()) >= -1e-7
    np.testing.assert_allclose(float(qf.sum()), float(q0.sum()), rtol=1e-5)


def test_outflow_probs_uniform_flow():
    """Uniform q, uniform +x wind: P(east) = u dt / dx, all others 0."""
    q = jnp.ones((NZ, NY, NX), jnp.float32)
    u0, dt = 10.0, 25.0
    _, probs = advect_pd(q, *_winds(u0), RHO, dt, RDX, RDX, RDZ)
    np.testing.assert_allclose(np.asarray(probs.xp), u0 * dt / DX, rtol=1e-5)
    for name in ("xm", "ym", "yp", "zm", "zp"):
        np.testing.assert_allclose(np.asarray(getattr(probs, name)), 0.0, atol=1e-7)


def test_outflow_probs_sum_below_one_and_zero_q():
    key = jax.random.key(0)
    q = jax.random.uniform(key, (NZ, NY, NX)) ** 4          # spans ~0..1
    q = q.at[:, :, 5].set(0.0)
    u = 30.0 * (jax.random.uniform(jax.random.key(1), (NZ, NY, NX)) - 0.5)
    v = 30.0 * (jax.random.uniform(jax.random.key(2), (NZ, NY, NX)) - 0.5)
    w = 0.5 * (jax.random.uniform(jax.random.key(3), (NZ + 1, NY, NX)) - 0.5)
    _, probs = advect_pd(q, u, v, w, RHO, 20.0, RDX, RDX, RDZ)
    total = sum(np.asarray(getattr(probs, n))
                for n in ("xm", "xp", "ym", "yp", "zm", "zp"))
    assert total.max() <= 1.0 + 1e-5
    assert total.min() >= 0.0
    # zero-q cells emit nothing
    np.testing.assert_allclose(total[:, :, 5], 0.0, atol=1e-7)


def test_vertical_flux_boundaries_closed():
    """Nonzero w cannot push mass through the surface or model top."""
    q = jnp.ones((NZ, NY, NX), jnp.float32)
    u, v, w = _winds(0.0, 0.0, 0.0)
    w = w + 0.5
    qf, probs = advect_pd(q, u, v, w, RHO, 10.0, RDX, RDX, RDZ)
    col0 = float(jnp.sum(q[:, 0, 0] / RDZ))
    col1 = float(jnp.sum(qf[:, 0, 0] / RDZ))
    np.testing.assert_allclose(col1, col0, rtol=1e-5)
    # no outflow below the surface cell or above the top cell
    np.testing.assert_allclose(np.asarray(probs.zm[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(probs.zp[-1]), 0.0, atol=1e-7)


def test_flux_divergence_of_constant_field_is_zero():
    q = jnp.full((NZ, NY, NX), 3.0, jnp.float32)
    u, v, w = _winds(5.0, -3.0, 0.0)
    fx, fy, fz = face_fluxes(q, u, v, w, 5, 3)
    div = flux_divergence(fx, fy, fz, RDX, RDX, RDZ)
    # interior levels exactly zero; boundary levels only via w (w=0 here)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-5)


def test_batched_classes_advect_independently():
    """Leading class axis: each class sees its own probabilities."""
    q1 = _gauss_x(0.3)
    q2 = _gauss_x(0.7)
    q = jnp.stack([q1, q2])                                 # [2, nz, ny, nx]
    qf, probs = advect_pd(q, *_winds(10.0), RHO, 25.0, RDX, RDX, RDZ)
    assert qf.shape == q.shape and probs.xp.shape == q.shape
    # the two classes' probability fields differ (different q shapes)
    assert float(jnp.max(jnp.abs(probs.xp[0] - probs.xp[1]))) > 1e-4


# ------------------------- monotonic limiter (advect_scalar_mono path) ----

def test_mono_no_new_extrema_square_wave():
    """FCT property: a square wave stays within [min, max] of the initial
    data (no overshoots/undershoots) — stronger than PD (positivity only)
    (``module_advect_em.F:9569`` advect_scalar_mono, chem_adv_opt=2)."""
    from wrf_partmc_tpu.ops.advection import rk3_advect_mono

    u, v, w = _winds(10.0)
    x = (jnp.arange(NX) + 0.5) / NX
    q0 = jnp.where((x > 0.2) & (x < 0.4), 1.0, 0.0)
    q = jnp.broadcast_to(q0, (NZ, NY, NX)).astype(jnp.float32)
    dt = 25.0

    def step(q, _):
        qn, _ = rk3_advect_mono(q, u, v, w, RHO, dt, RDX, RDX, RDZ)
        return qn, None

    qn, _ = jax.lax.scan(step, q, None, length=64)
    assert float(qn.min()) >= -1e-6
    assert float(qn.max()) <= 1.0 + 1e-5
    # mass conserved
    np.testing.assert_allclose(float(qn.sum()), float(q.sum()), rtol=1e-5)


def test_mono_translation_accuracy():
    """Gaussian after a full periodic revolution: peak preserved within the
    usual FCT clipping, shape close to the PD solution."""
    from wrf_partmc_tpu.ops.advection import rk3_advect_mono

    u0, dt = 10.0, 25.0
    n = int(NX * DX / (u0 * dt))
    u, v, w = _winds(u0)
    q = _gauss_x()

    def step(q, _):
        qn, _ = rk3_advect_mono(q, u, v, w, RHO, dt, RDX, RDX, RDZ)
        return qn, None

    qn, _ = jax.lax.scan(step, q, None, length=n)
    err = float(jnp.abs(qn - q).max())
    assert err < 0.15
    assert float(qn.max()) > 0.8        # limited peak erosion


def test_mono_probs_uniform_flow():
    """Captured outflow probabilities under uniform +x flow: only xp active,
    equal to the Courant number for a uniform field."""
    from wrf_partmc_tpu.ops.advection import rk3_advect_mono

    u, v, w = _winds(5.0)
    q = jnp.ones((NZ, NY, NX), jnp.float32)
    dt = 40.0
    _, probs = rk3_advect_mono(q, u, v, w, RHO, dt, RDX, RDX, RDZ)
    np.testing.assert_allclose(np.asarray(probs.xp), 5.0 * dt / DX, rtol=1e-5)
    for nm in ("xm", "ym", "yp", "zm", "zp"):
        np.testing.assert_allclose(np.asarray(getattr(probs, nm)), 0.0,
                                   atol=1e-7)

# ------------------------- WENO reconstructions (module_advect_em WENO) ----

@pytest.mark.slow
def test_weno5_translation_accuracy():
    """Gaussian after one periodic revolution with WENO5 faces: at least as
    accurate as the linear 5th-order scheme on a smooth profile."""
    u0, dt = 10.0, 25.0
    n = int(NX * DX / (u0 * dt))
    q0 = _gauss_x()
    qf, _ = jax.jit(lambda q: _advance(q, *_winds(u0), dt, n,
                                       h_order="weno5", v_order="weno3"))(q0)
    q0n, qfn = np.asarray(q0[0, 0]), np.asarray(qf[0, 0])
    np.testing.assert_allclose(qfn.sum(), q0n.sum(), rtol=1e-5)
    assert abs(int(np.argmax(qfn)) - int(np.argmax(q0n))) <= 1
    assert qfn.max() > 0.75 * q0n.max()
    assert np.sqrt(np.mean((qfn - q0n) ** 2)) < 0.05


def test_weno5_square_wave_essentially_nonoscillatory():
    """Discontinuous data: WENO5+PD keeps overshoots tiny and mass exact."""
    x = (jnp.arange(NX) + 0.5) / NX
    q0 = jnp.where((x > 0.2) & (x < 0.4), 1.0, 0.0)
    q0 = jnp.broadcast_to(q0, (NZ, NY, NX)).astype(jnp.float32)
    qf, _ = jax.jit(lambda q: _advance(q, *_winds(15.0), 20.0, 50,
                                       h_order="weno5", v_order="weno3"))(q0)
    np.testing.assert_allclose(float(qf.sum()), float(q0.sum()), rtol=1e-5)
    assert float(qf.min()) >= -1e-6          # PD limiter
    assert float(qf.max()) <= 1.0 + 0.02     # ENO: no significant overshoot


def test_weno_upwind_switch_antisymmetric():
    """Reversing the wind mirrors the WENO face values (upwind selection)."""
    from wrf_partmc_tpu.ops.advection import _upwind_face_flux
    from wrf_partmc_tpu.ops.stencil import AXIS_X

    q = _gauss_x(0.4, 0.08)
    u = jnp.full((NZ, NY, NX), 7.0, jnp.float32)
    f_fwd = _upwind_face_flux(q, u, "weno5", AXIS_X, "periodic")
    f_rev = _upwind_face_flux(q[..., ::-1], -u, "weno5", AXIS_X, "periodic")
    # face i in fwd ~ face NX-i in reversed frame with opposite sign
    np.testing.assert_allclose(np.asarray(f_fwd[0, 0, 1:]),
                               -np.asarray(f_rev[0, 0, 1:][::-1]),
                               rtol=1e-4, atol=1e-6)
