"""Tridiagonal solver vs dense reference."""

import jax.numpy as jnp
import numpy as np

from wrf_partmc_tpu.ops.tridiag import solve


def test_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    n, batch = 12, (5, 7)
    d = 4.0 + rng.standard_normal((n, *batch))
    dl = rng.standard_normal((n, *batch))
    du = rng.standard_normal((n, *batch))
    b = rng.standard_normal((n, *batch))
    x = np.asarray(solve(jnp.asarray(dl, jnp.float32), jnp.asarray(d, jnp.float32),
                         jnp.asarray(du, jnp.float32), jnp.asarray(b, jnp.float32)))
    for i in range(batch[0]):
        for j in range(batch[1]):
            A = np.diag(d[:, i, j]) + np.diag(dl[1:, i, j], -1) + np.diag(du[:-1, i, j], 1)
            x_ref = np.linalg.solve(A, b[:, i, j])
            np.testing.assert_allclose(x[:, i, j], x_ref, rtol=2e-4, atol=2e-4)


def test_pallas_tridiag_matches_scan():
    """Pallas VMEM kernel (interpret mode off-TPU) vs the scan reference,
    including batch padding to the lane tile."""
    from wrf_partmc_tpu.ops.pallas_tridiag import solve_pallas
    from wrf_partmc_tpu.ops.tridiag import solve_scan

    rng = np.random.default_rng(1)
    n, batch = 10, (6, 11)   # 66 columns -> exercises padding to 512
    d = jnp.asarray(4.0 + rng.standard_normal((n, *batch)), jnp.float32)
    dl = jnp.asarray(rng.standard_normal((n, *batch)), jnp.float32)
    du = jnp.asarray(rng.standard_normal((n, *batch)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, *batch)), jnp.float32)
    x_pl = np.asarray(solve_pallas(dl, d, du, b, interpret=True))
    x_ref = np.asarray(solve_scan(dl, d, du, b))
    np.testing.assert_allclose(x_pl, x_ref, rtol=2e-4, atol=2e-4)


def test_pallas_tridiag_broadcast_coeffs():
    from wrf_partmc_tpu.ops.pallas_tridiag import solve_pallas

    n = 8
    dl = jnp.full((n, 1, 1), -1.0, jnp.float32)
    d = jnp.full((n, 1, 1), 4.0, jnp.float32)
    du = jnp.full((n, 1, 1), -1.0, jnp.float32)
    b = jnp.ones((n, 3, 4), jnp.float32)
    x = np.asarray(solve_pallas(dl, d, du, b, interpret=True))
    A = np.diag(np.full(n, 4.0)) + np.diag(np.full(n - 1, -1.0), -1) + np.diag(np.full(n - 1, -1.0), 1)
    x_ref = np.linalg.solve(A, np.ones(n))
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(x[:, i, j], x_ref, rtol=1e-5)


def test_tridiag_broadcast_coeffs():
    n = 8
    dl = jnp.full((n, 1, 1), -1.0)
    d = jnp.full((n, 1, 1), 4.0)
    du = jnp.full((n, 1, 1), -1.0)
    b = jnp.ones((n, 3, 4))
    x = np.asarray(solve(dl, d, du, b))
    A = np.diag(np.full(n, 4.0)) + np.diag(np.full(n - 1, -1.0), -1) + np.diag(np.full(n - 1, -1.0), 1)
    x_ref = np.linalg.solve(A, np.ones(n))
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(x[:, i, j], x_ref, rtol=1e-5)
