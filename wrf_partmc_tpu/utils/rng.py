"""Deterministic, decomposition-invariant random streams.

Replaces the reference's per-rank GSL seeding (``pmc_srand(seed, rank)``,
``wrf_pmc_init.F90:131``; ``partmc/src/rand_gsl.c``), whose streams depend on
the MPI decomposition.  Here every stochastic site derives its key from
(base_seed, step, substream-tag) with counter-based ``jax.random`` — results
are bitwise independent of the device mesh shape.
"""

from __future__ import annotations

import hashlib

import jax


# stable tags for the stochastic subsystems (one substream each)
STREAM_INIT = 0
STREAM_COAG = 1
STREAM_EMISSION = 2
STREAM_TRANSPORT = 3
STREAM_DEPOSITION = 4
STREAM_REBALANCE = 5
STREAM_BC = 6


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def step_key(key: jax.Array, step, stream: int) -> jax.Array:
    """Key for (step, subsystem).  ``step`` may be a traced int32."""
    return jax.random.fold_in(jax.random.fold_in(key, stream), step)


def name_seed(name: str) -> int:
    """Stable 31-bit seed from a string (for named ensembles/tests)."""
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little") & 0x7FFFFFFF
