"""Pallas TPU kernel: batched Thomas tridiagonal column solve.

The vertically-implicit solves in this framework — the acoustic ``advance_w``
w-p column solve (``dyn_em/module_small_step_em.F``, invoked n_sound times
per RK stage) and the vertical-diffusion probability matrix build
(``wrf_pmc_trans.F90:472-493``) — are all [nz]-length tridiagonal systems
batched over every column of the domain.

The pure-XLA path (``ops/tridiag.solve``) lowers the Thomas recurrence to a
``lax.scan`` whose 2*nz sequential steps each stream an [ny, nx] plane
through HBM.  This kernel instead tiles the flattened column batch into
VMEM-resident [nz, TM] blocks and runs both sweeps entirely on-chip: one HBM
read per input element and one write per output element — the
bandwidth-optimal schedule for a solver that is inherently sequential in z.

Layout: z is the *sublane* axis (second-to-last) and the column batch is the
lane axis, so each fori_loop step is a [1, TM] vector op on the VPU with no
cross-lane traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 512  # lane-axis tile (columns per block); multiple of 128


def _thomas_kernel(dl_ref, d_ref, du_ref, b_ref, x_ref, cp_ref, dp_ref):
    nz = d_ref.shape[0]

    # forward elimination
    inv0 = 1.0 / d_ref[0]
    cp_ref[0] = du_ref[0] * inv0
    dp_ref[0] = b_ref[0] * inv0

    def fwd(k, _):
        a = dl_ref[k]
        denom = d_ref[k] - a * cp_ref[k - 1]
        inv = 1.0 / denom
        cp_ref[k] = du_ref[k] * inv
        dp_ref[k] = (b_ref[k] - a * dp_ref[k - 1]) * inv
        return 0

    jax.lax.fori_loop(1, nz, fwd, 0)

    # back substitution
    x_ref[nz - 1] = dp_ref[nz - 1]

    def bwd(i, _):
        k = nz - 2 - i
        x_ref[k] = dp_ref[k] - cp_ref[k] * x_ref[k + 1]
        return 0

    jax.lax.fori_loop(0, nz - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_pallas(dl, d, du, b, *, interpret: bool = False):
    """Solve batched tridiagonal systems with the VMEM-resident kernel.

    dl, d, du, b: [n, ...] (broadcastable batch dims, as ops.tridiag.solve).
    Returns x with the broadcast shape.
    """
    shape = jnp.broadcast_shapes(dl.shape, d.shape, du.shape, b.shape)
    n = shape[0]
    batch = shape[1:]
    m = 1
    for s in batch:
        m *= s
    dtype = jnp.result_type(dl, d, du, b)

    def prep(a):
        return jnp.broadcast_to(a, shape).reshape(n, m).astype(dtype)

    dl2, d2, du2, b2 = prep(dl), prep(d), prep(du), prep(b)

    # pad the batch axis to the tile width with identity systems (d=1)
    m_pad = max(_TM, ((m + _TM - 1) // _TM) * _TM)
    if m_pad != m:
        pad = m_pad - m
        z = jnp.zeros((n, pad), dtype)
        dl2 = jnp.concatenate([dl2, z], axis=1)
        du2 = jnp.concatenate([du2, z], axis=1)
        b2 = jnp.concatenate([b2, z], axis=1)
        d2 = jnp.concatenate([d2, jnp.ones((n, pad), dtype)], axis=1)

    grid = (m_pad // _TM,)
    spec = pl.BlockSpec((n, _TM), lambda i: (0, i), memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m_pad), dtype),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((n, _TM), dtype),
                        pltpu.VMEM((n, _TM), dtype)],
        interpret=interpret,
    )(dl2, d2, du2, b2)
    return x[:, :m].reshape(shape)
