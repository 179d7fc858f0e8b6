"""ops/place.py: pallas blocked one-hot placement vs reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_partmc_tpu.ops.place import (gather_rows, gather_rows_ref,
                                      scatter_rows, scatter_rows_ref,
                                      _gather_rows_pallas,
                                      _scatter_rows_pallas)


def _mkx(key, B, CH, Li):
    x = jax.random.normal(key, (B, CH, Li), jnp.float32)
    # integer-valued channel (ids stored as values must survive exactly)
    ids = jax.random.randint(key, (B, Li), 0, 2 ** 22).astype(jnp.float32)
    return x.at[:, 0, :].set(ids)


def test_scatter_ref_roundtrip():
    key = jax.random.key(0)
    B, CH, Li, Lo = 3, 7, 40, 64
    x = _mkx(key, B, CH, Li)
    # random injective dst with some drops
    perm = jax.random.permutation(key, jnp.arange(Lo))[None, :Li]
    perm = jnp.concatenate([perm + 0,
                            jax.random.permutation(jax.random.key(1),
                                                   jnp.arange(Lo))[None, :Li],
                            jax.random.permutation(jax.random.key(2),
                                                   jnp.arange(Lo))[None, :Li]])
    dst = jnp.where(jax.random.uniform(key, (B, Li)) < 0.2, -1, perm)
    out = scatter_rows_ref(x, dst, Lo)
    xn, dn, on = map(np.asarray, (x, dst, out))
    seen = np.zeros((B, Lo), bool)
    for b in range(B):
        for i in range(Li):
            if dn[b, i] >= 0:
                assert np.array_equal(on[b, :, dn[b, i]], xn[b, :, i])
                seen[b, dn[b, i]] = True
    assert np.all(on[~seen.astype(bool)[:, None, :]
                     .repeat(CH, 1)] == 0.0)


def test_gather_ref_duplicates_and_missing():
    key = jax.random.key(3)
    B, CH, Li, Lo = 2, 5, 32, 48
    x = _mkx(key, B, CH, Li)
    src = jax.random.randint(key, (B, Lo), -1, Li)
    out = gather_rows_ref(x, src)
    xn, sn, on = map(np.asarray, (x, src, out))
    for b in range(B):
        for o in range(Lo):
            if sn[b, o] >= 0:
                assert np.array_equal(on[b, :, o], xn[b, :, sn[b, o]])
            else:
                assert np.all(on[b, :, o] == 0.0)


@pytest.mark.parametrize("B,CH,Li,Lo", [(2, 31, 300, 500), (3, 8, 1024, 256),
                                        (1, 33, 2560, 2560)])
def test_scatter_pallas_interpret_matches_ref(B, CH, Li, Lo):
    key = jax.random.key(42)
    x = _mkx(key, B, CH, Li)
    n = min(Li, Lo)
    dsts = []
    for b in range(B):
        p = jax.random.permutation(jax.random.key(b), jnp.arange(Lo))[:n]
        d = jnp.full((Li,), -1, jnp.int32).at[:n].set(p.astype(jnp.int32))
        dsts.append(d)
    dst = jnp.stack(dsts)
    dst = jnp.where(jax.random.uniform(key, (B, Li)) < 0.1, -1, dst)
    ref = np.asarray(scatter_rows_ref(x, dst, Lo))
    out = np.asarray(_scatter_rows_pallas(x, dst, Lo, interpret=True))
    # bf16x3 path: integer-valued channel exact after round, floats ~1 ulp
    np.testing.assert_array_equal(np.round(out[:, 0]), ref[:, 0])
    np.testing.assert_allclose(out, ref, rtol=3e-7, atol=1e-30)


@pytest.mark.parametrize("B,CH,Li,Lo", [(2, 31, 500, 300), (1, 26, 2560, 700)])
def test_gather_pallas_interpret_matches_ref(B, CH, Li, Lo):
    key = jax.random.key(7)
    x = _mkx(key, B, CH, Li)
    src = jax.random.randint(key, (B, Lo), -1, Li).astype(jnp.int32)
    ref = np.asarray(gather_rows_ref(x, src))
    out = np.asarray(_gather_rows_pallas(x, src, interpret=True))
    np.testing.assert_array_equal(np.round(out[:, 0]), ref[:, 0])
    np.testing.assert_allclose(out, ref, rtol=3e-7, atol=1e-30)


def test_dispatch_cpu_uses_ref():
    # on CPU backends the public API must route to the reference impl
    x = _mkx(jax.random.key(0), 1, 4, 16)
    dst = jnp.arange(16, dtype=jnp.int32)[None]
    out = scatter_rows(x, dst, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    src = jnp.arange(16, dtype=jnp.int32)[None]
    np.testing.assert_array_equal(np.asarray(gather_rows(x, src)),
                                  np.asarray(x))
