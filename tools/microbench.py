#!/usr/bin/env python
"""Microbenchmarks for primitive data-movement ops in the particle path.

The axon remote runtime defers/caches work unless results are observed on
host, so every benchmark (a) chains the op so iteration i+1 depends on
iteration i's data, and (b) ends by pulling a scalar to host.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, step, x0, inner=4, nbytes=None, flops=None):
    """step: x -> x (same pytree structure). Chained inner times per rep."""
    g = jax.jit(step)
    x = jax.tree.map(jax.device_put, x0)
    x = g(x)
    float(jnp.sum(jax.tree.leaves(x)[0][:1]))        # force compile+exec
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(inner):
            y = g(y)
        _ = float(jnp.sum(jax.tree.leaves(y)[0][:1]))
        best = min(best, (time.perf_counter() - t0) / inner)
    line = f"{name:46s} {best*1e3:9.3f} ms"
    if nbytes:
        line += f" {nbytes/best/1e9:8.1f} GB/s"
    if flops:
        line += f" {flops/best/1e12:8.2f} TF/s"
    print(line, flush=True)
    return best


def main():
    C, P, CH, NZ = 16000, 256, 32, 10
    N = C * P
    NCOL = C // NZ
    LCOL = NZ * P

    print(f"device={jax.devices()[0]}  N={N} rows CH={CH} "
          f"({N*CH*4/1e9:.2f} GB payload)", flush=True)

    # roofline sanity
    x = jnp.ones((64*1024*1024,), jnp.float32)  # 256 MB
    bench("elementwise mul 256MB", lambda a: a * 1.000001, x,
          nbytes=2*x.nbytes)
    m = jax.random.normal(jax.random.key(0), (4096, 4096), jnp.bfloat16)
    bench("matmul 4096^3 bf16", lambda a: a @ a * 1e-2, m,
          flops=2*4096**3)
    mf = m.astype(jnp.float32)
    bench("matmul 4096^3 f32", lambda a: a @ a * 1e-2, mf,
          flops=2*4096**3)

    rows = jax.random.normal(jax.random.key(1), (N, CH), jnp.float32)

    def self_idx(r):
        return (jax.lax.bitcast_convert_type(r[:, 0], jnp.int32) & 0x3fffff) % N

    bench("gather rows [N,32] data-dep idx",
          lambda r: r[self_idx(r)] * 1.000001, rows, inner=1,
          nbytes=2*rows.nbytes)
    bench("scatter rows [N,32] data-dep idx",
          lambda r: r.at[self_idx(r)].add(0.001), rows, inner=1,
          nbytes=2*rows.nbytes)
    k32 = jax.random.randint(jax.random.key(2), (N,), 0, C, jnp.int32)
    bench("argsort int32 [N] data-dep",
          lambda k: jnp.argsort(k ^ (k >> 3)) % C, k32, nbytes=2*N*8)
    bench("argsort minor [NCOL,LCOL] data-dep",
          lambda k: jnp.argsort((k ^ (k >> 3)).reshape(NCOL, LCOL),
                                axis=-1).reshape(N) % C, k32,
          nbytes=2*N*8)
    bench("argsort minor [C,P] data-dep",
          lambda k: jnp.argsort((k ^ (k >> 3)).reshape(C, P),
                                axis=-1).reshape(N) % C, k32,
          nbytes=2*N*8)
    bench("cumsum minor [NCOL,LCOL,NZ] f32",
          lambda a: jnp.cumsum(a, axis=1) * (1.0/LCOL),
          jnp.ones((NCOL, LCOL, NZ), jnp.float32),
          nbytes=2*NCOL*LCOL*NZ*4)

    # one-hot permutation apply via einsum (bf16 MXU): within-cell P-perm
    rc = rows.reshape(C, P, CH)

    def perm_mxu(r):
        perm = (jax.lax.bitcast_convert_type(r[..., 0], jnp.int32)
                & 0xff) % P                     # [C,P] data-dep targets
        oh = jax.nn.one_hot(perm, P, dtype=jnp.bfloat16)
        y = jnp.einsum("cpo,pch->...", oh, jnp.zeros((1,)))  # placeholder
        return y
    def perm_mxu_real(r):
        perm = (jax.lax.bitcast_convert_type(r[..., 0], jnp.int32)
                & 0xff) % P
        oh = jax.nn.one_hot(perm, P, dtype=jnp.bfloat16)     # [C,Pin,Pout]
        y = jax.lax.dot_general(
            oh, r.astype(jnp.bfloat16),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [C,Pout,CH]
        return y
    bench("one-hot perm [C,P,P]bf16 einsum", perm_mxu_real, rc, inner=2,
          nbytes=2*rows.nbytes + C*P*P*2, flops=2*C*P*P*CH)

    def perm_mxu_f32(r):
        perm = (jax.lax.bitcast_convert_type(r[..., 0], jnp.int32)
                & 0xff) % P
        oh = jax.nn.one_hot(perm, P, dtype=jnp.float32)
        y = jax.lax.dot_general(
            oh, r, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return y
    bench("one-hot perm [C,P,P]f32 einsum", perm_mxu_f32, rc, inner=2,
          nbytes=2*rows.nbytes + C*P*P*4, flops=2*C*P*P*CH)

    # lax.sort minor axis with full payload (CH operands)
    def sortfull(r):
        key = (jax.lax.bitcast_convert_type(r[..., 0], jnp.int32) & 0xff)
        ops = (key,) + tuple(r[..., i] for i in range(CH))
        out = jax.lax.sort(ops, dimension=1, num_keys=1)
        return jnp.stack(out[1:], axis=-1)
    bench("lax.sort minor [C,P] full payload", sortfull, rc, inner=1,
          nbytes=2*rows.nbytes)

    # take_along_axis on minor axis (per-cell perm via gather)
    def take_minor(r):
        perm = (jax.lax.bitcast_convert_type(r[..., 0], jnp.int32)
                & 0xff) % P
        return jnp.take_along_axis(r, perm[..., None], axis=1)
    bench("take_along_axis minor [C,P,CH]", take_minor, rc, inner=1,
          nbytes=2*rows.nbytes)


if __name__ == "__main__":
    main()
