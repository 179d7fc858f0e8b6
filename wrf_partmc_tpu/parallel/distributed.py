"""Multi-process (multi-host) runtime scaffolding.

TPU-native replacement for the reference's MPI world setup
(``external/RSL_LITE/module_dm.F:207`` wrf_dm_initialize + the
``local_communicator`` plumbing): one ``jax.distributed`` controller per
host, a global 2-D ('y','x') device mesh spanning all hosts, and
process-local -> global array assembly so each host feeds only its shard
(the patch-decomposition contract of ``patch_domain_rsl_lite``).

Usage (same script on every host):

    from wrf_partmc_tpu.parallel import distributed as dist
    dist.init_from_env()          # no-op when single-process
    mesh = dist.global_mesh()     # ('y','x') over ALL processes' devices
    state = jax.tree.map(lambda a: dist.host_to_global(a, mesh, spec), local)

Environment (set by the launcher, mirroring jax.distributed conventions):
    WPMC_COORDINATOR   host:port of process 0 (absent -> single process)
    WPMC_NUM_PROCS     total process count
    WPMC_PROC_ID       this process's rank
"""

from __future__ import annotations

import os

import jax
import numpy as np


def init_from_env() -> bool:
    """Initialize jax.distributed from WPMC_* env vars.  Returns True when a
    multi-process runtime was started; False for the single-process case."""
    coord = os.environ.get("WPMC_COORDINATOR")
    if not coord:
        return False
    n = int(os.environ["WPMC_NUM_PROCS"])
    pid = int(os.environ["WPMC_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coord, num_processes=n,
                               process_id=pid)
    return True


def global_mesh(shape=None, devices=None):
    """2-D ('y','x') mesh over all devices of all processes (MPASPECT
    factorization when shape is None)."""
    from .mesh import factor_2d, make_mesh

    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = factor_2d(len(devices))
    return make_mesh(devices, shape=shape)


def process_block(mesh):
    """(py_index_range, px_index_range) of the mesh rows/cols whose devices
    belong to this process — the patch this host owns."""
    pid = jax.process_index()
    dev = np.asarray(mesh.devices)
    mine = np.array([[d.process_index == pid for d in row] for row in dev])
    ys, xs = np.nonzero(mine)
    return (int(ys.min()), int(ys.max()) + 1), (int(xs.min()), int(xs.max()) + 1)


def host_to_global(local_block, mesh, spec):
    """Assemble a globally-sharded jax.Array from this process's block of
    data (jax.make_array_from_process_local_data): the multi-host version of
    device_put(NamedSharding).  ``local_block`` holds this process's rows of
    the global array along the sharded axes."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_block)


def global_to_host(garr):
    """Gather this process's addressable shards into one numpy block
    (inverse of host_to_global for the process's patch)."""
    shards = sorted(garr.addressable_shards, key=lambda s: s.index)
    # single-axis-contiguous assembly: rely on the process owning a
    # rectangular block of the mesh (process_block)
    arrs = {}
    for s in shards:
        arrs[tuple((sl.start or 0) for sl in s.index)] = np.asarray(s.data)
    keys = sorted(arrs)
    if len(keys) == 1:
        return arrs[keys[0]]
    # stack along the axes that vary
    ys = sorted({k[-2] for k in keys})
    xs = sorted({k[-1] for k in keys})
    rows = [np.concatenate([arrs[k] for k in keys if k[-2] == y], axis=-1)
            for y in ys]
    return np.concatenate(rows, axis=-2)
