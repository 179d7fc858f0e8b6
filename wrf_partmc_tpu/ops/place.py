"""Row placement primitives: the TPU-native replacement for every particle
gather/scatter in the framework.

Motivation (measured on TPU v5e, tools/microbench.py): XLA row
gathers/scatters and lane-axis ``take_along_axis`` run at ~2-6 GB/s
effective — two orders of magnitude below HBM bandwidth — while MXU matmuls
and elementwise ops run near roofline.  Every data-dependent particle
rearrangement (transport rebucketing, mover extraction, compaction,
doubling) is therefore expressed as a *batched dense one-hot matmul*:
moving row i of batch b to slot o multiplies the [CH, L1] payload by a
locally generated one-hot [L1, L2] matrix on the MXU.

Precision: the payload is split into three bf16 slabs (x = s1 + s2 + s3,
successive bf16 remainders) stacked on the M axis, so one bf16 MXU matmul
of [3*CH, L1] x [L1, L2] moves all three; the f32 re-sum recovers the
payload to within ~1 ulp, and integer-valued channels with |v| < 2**22
(ids, classes, destination metadata — stored as *values*, never bitcasts)
are exact after rounding.  This runs at full bf16 MXU rate with M ~ 120,
vs the ~8x slower exact-f32 path.

There is deliberately no sparsity machinery here: TPUs like big regular
work, so callers exploit structure by choosing the *batch granularity*
(e.g. per-cell extraction of movers into a small per-cell region is a
batched [L1 x F] matmul — the block-diagonal structure of "particles move
at most one cell" becomes batching, not masking).  See
``models/coupled/transport.py`` for the multi-pass rebucket built on top.

Two primitives, both batched over dim 0, payload layout [B, CH, L]
(channels on sublanes, slots on lanes — unpadded VMEM tiles):

* ``scatter_rows(x, dst, L2)``: out[b, :, dst[b, i]] = x[b, :, i]
  (dst == -1 drops the row; caller guarantees dst uniqueness per batch).
* ``gather_rows(x, src)``:      out[b, :, o] = x[b, :, src[b, o]]
  (src == -1 yields a zero row; duplicate src duplicates rows — used for
  population doubling).

Reference analogue: PartMC moves particles with per-cell Fortran array
shuffles and MPI pack/unpack (``wrf_pmc_trans_aero.F90:356-804``); this
module is the single device-side engine that replaces all of it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

GROUP = 8           # batches per grid step (also the sublane tile of idx)
MAX_CH = 42         # 3 * MAX_CH must stay within one MXU M tile (128)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# reference implementations (CPU tests, virtual-device dryruns)
# ---------------------------------------------------------------------------

def scatter_rows_ref(x, dst, L2: int):
    B, CH, L1 = x.shape
    xr = jnp.moveaxis(x, 1, 2).reshape(B * L1, CH)            # rows
    d = jnp.where(dst >= 0, dst, L2)
    dflat = (jnp.arange(B, dtype=jnp.int32)[:, None] * (L2 + 1) + d).reshape(-1)
    out = jnp.zeros((B * (L2 + 1), CH), x.dtype).at[dflat].set(xr)
    return jnp.moveaxis(out.reshape(B, L2 + 1, CH)[:, :L2], 2, 1)


def gather_rows_ref(x, src):
    B, CH, L1 = x.shape
    L2 = src.shape[1]
    xr = jnp.moveaxis(x, 1, 2).reshape(B * L1, CH)
    s = jnp.clip(src, 0, L1 - 1)
    sflat = (jnp.arange(B, dtype=jnp.int32)[:, None] * L1 + s).reshape(-1)
    rows = xr[sflat].reshape(B, L2, CH)
    rows = jnp.where((src >= 0)[..., None], rows, 0.0)
    return jnp.moveaxis(rows, 2, 1)


# ---------------------------------------------------------------------------
# pallas kernels: dense batched one-hot matmul (bf16x3 exact-enough path)
# ---------------------------------------------------------------------------

def _split3(x):
    """f32 [CH, L] -> bf16 [3*CH, L] with s1 + s2 + s3 ~= x (1-ulp)."""
    s1 = x.astype(jnp.bfloat16)
    r1 = x - s1.astype(jnp.float32)
    s2 = r1.astype(jnp.bfloat16)
    r2 = r1 - s2.astype(jnp.float32)
    s3 = r2.astype(jnp.bfloat16)
    return jnp.concatenate([s1, s2, s3], axis=0)


def _scatter_kernel(x_ref, dst_ref, o_ref, *, chp, L1p, OB):
    ob = pl.program_id(1)

    def body(g, _):
        xs = _split3(x_ref[pl.ds(g, 1), :, :][0])           # [3chp, L1p]
        dr = dst_ref[pl.ds(g, 1), :]                        # [1, L1p]
        iota_o = (lax.broadcasted_iota(jnp.int32, (OB, L1p), 0)
                  + ob * OB)
        ohT = (dr == iota_o).astype(jnp.bfloat16)           # [OB, L1p]
        y = lax.dot_general(xs, ohT, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        o_ref[pl.ds(g, 1), :, :] = (y[:chp] + y[chp:2 * chp]
                                    + y[2 * chp:])[None]
        return 0

    lax.fori_loop(0, GROUP, body, 0)


def _gather_kernel(x_ref, src_ref, o_ref, *, chp, L1p, OB):
    ob = pl.program_id(1)

    def body(g, _):
        xs = _split3(x_ref[pl.ds(g, 1), :, :][0])           # [3chp, L1p]
        sr = src_ref[pl.ds(g, 1), pl.ds(ob * OB, OB)]       # [1, OB]
        iota_i = lax.broadcasted_iota(jnp.int32, (L1p, OB), 0)
        oh = (sr == iota_i).astype(jnp.bfloat16)            # [L1p, OB]
        y = lax.dot_general(xs, oh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        o_ref[pl.ds(g, 1), :, :] = (y[:chp] + y[chp:2 * chp]
                                    + y[2 * chp:])[None]
        return 0

    lax.fori_loop(0, GROUP, body, 0)


_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_ob(chp, L1p, L2p) -> int:
    """Largest out-block (multiple of 128) whose working set fits VMEM."""
    for ob in range(L2p, 0, -128):
        b = (GROUP * chp * (L1p + ob) * 4 + 2 * L1p * ob * 2
             + GROUP * max(L1p, L2p) * 4)
        if b <= _VMEM_BUDGET:
            return ob
    raise ValueError(f"place_rows input row-length too large for VMEM: "
                     f"chp={chp} L1p={L1p}")


def _pallas_place(kernel, x, idx, L2: int, idx_on_input: bool,
                  interpret: bool):
    B, CH, L1 = x.shape
    if CH > MAX_CH:
        raise ValueError(f"payload channels {CH} > {MAX_CH}")
    L1p = _pad_to(L1, 128)
    chp = _pad_to(CH, 8)
    Bp = _pad_to(B, GROUP)
    OB = _pick_ob(chp, L1p, _pad_to(L2, 128))
    L2p = _pad_to(L2, OB)
    x = jnp.pad(x, ((0, Bp - B), (0, chp - CH), (0, L1p - L1)))
    Lidxp = L1p if idx_on_input else L2p
    idx = jnp.pad(idx, ((0, Bp - B), (0, Lidxp - idx.shape[1])),
                  constant_values=-1)

    kern = functools.partial(kernel, chp=chp, L1p=L1p, OB=OB)
    flops = 2 * Bp * L1p * L2p * 3 * chp
    out = pl.pallas_call(
        kern,
        grid=(Bp // GROUP, L2p // OB),
        in_specs=[
            pl.BlockSpec((GROUP, chp, L1p), lambda b, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, Lidxp), lambda b, o: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, chp, OB), lambda b, o: (b, 0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, chp, L2p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(x.nbytes * 2),
            transcendentals=0),
        interpret=interpret,
    )(x, idx)
    return out[:B, :CH, :L2]


@functools.partial(jax.jit, static_argnames=("L2", "interpret"))
def _scatter_rows_pallas(x, dst, L2: int, interpret: bool = False):
    return _pallas_place(_scatter_kernel, x, dst, L2, True, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_pallas(x, src, interpret: bool = False):
    return _pallas_place(_gather_kernel, x, src, src.shape[1], False,
                         interpret)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def scatter_rows(x, dst, L2: int, interpret: bool | None = None):
    """out[b, :, dst[b, i]] = x[b, :, i];  dst == -1 drops the row.

    x: [B, CH, L1] f32; dst: [B, L1] int32 with unique non-negative values
    per batch.  Returns [B, CH, L2] f32 (unwritten slots zero).  On TPU the
    payload moves through bf16x3 MXU matmuls: ~1-ulp accurate; integer-
    valued channels < 2**22 are exact after rounding."""
    if interpret is None:
        if not (_HAVE_PALLAS and _use_pallas()):
            return scatter_rows_ref(x, dst, L2)
        interpret = False
    return _scatter_rows_pallas(x, dst, L2, interpret=interpret)


def gather_rows(x, src, interpret: bool | None = None):
    """out[b, :, o] = x[b, :, src[b, o]];  src == -1 yields a zero row.

    x: [B, CH, L1] f32; src: [B, L2] int32.  Duplicates allowed (used for
    population doubling).  Returns [B, CH, L2] f32.  Same precision contract
    as scatter_rows."""
    if interpret is None:
        if not (_HAVE_PALLAS and _use_pallas()):
            return gather_rows_ref(x, src)
        interpret = False
    return _gather_rows_pallas(x, src, interpret=interpret)
