"""Multi-host execution environment (P8).

TPU-native replacement for the reference's MPI environment
(initialize_mpi / terminate_mpi, io_routines.f90:3610-3656): each host
runs the SAME program (the reference's ranks do too); jax.distributed
connects them, the device mesh spans every chip of every host, and the
host-side round driver stays deterministic so all processes drive the
same global batches with their local device shards.

Entry points:

* ``initialize()`` — call once at program start on every host.  Reads the
  standard coordination settings from the environment when arguments are
  omitted (``DARTRAY_COORDINATOR``, ``DARTRAY_NUM_PROCS``,
  ``DARTRAY_PROC_ID``; cloud TPU environments auto-detect without any).
  The CLI calls this when ``--multihost`` is passed (or
  ``DARTRAY_MULTIHOST=1``).
* ``global_ray_mesh()`` — 1-D 'rays' mesh over ALL devices of all hosts.
* ``host_local_batch(mesh, spec, arrays)`` — wrap per-process host numpy
  into global jax Arrays sharded by `spec` (each process feeds the shard
  its devices own; the host data must be identical on every process,
  exactly like the reference's replicated source loop,
  rt_routines.f90:1003-1005).
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None):
    """jax.distributed.initialize with env-var fallbacks; no-op if the
    distributed runtime is already up.  Must run before ANY other jax
    call that initializes the backend (so also before jax.devices /
    jax.process_count)."""
    if getattr(initialize, "_done", False):
        return
    coordinator = coordinator or os.environ.get("DARTRAY_COORDINATOR")
    if num_processes is None and os.environ.get("DARTRAY_NUM_PROCS"):
        num_processes = int(os.environ["DARTRAY_NUM_PROCS"])
    if process_id is None and os.environ.get("DARTRAY_PROC_ID"):
        process_id = int(os.environ["DARTRAY_PROC_ID"])
    kw = {}
    if coordinator:
        kw.update(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    initialize._done = True


def global_ray_mesh() -> Mesh:
    """1-D 'rays' mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), ("rays",))


# ---------------------------------------------------------------------------
# Source-decomposition multi-process execution (the production P8 path)
# ---------------------------------------------------------------------------
#
# The reference's MPI model is rank-wise source splitting with a field
# reduction at stage end (the src loop strides by rank, and
# reduce_u_fest_arr/reduce_u_final_arr sum the per-rank accumulators,
# io_routines.f90:3667-3986).  The TPU-native equivalent keeps that outer
# layer: each PROCESS traces an interleaved slice of the stage's sources on
# its own local device mesh (where rays/wave shard_map parallelism still
# applies), and the per-process field/scaspe accumulators are summed once
# per stage.  All stage-level control flow (convergence tests, scattering
# source selection, the ladder regroup) runs on the REDUCED arrays, so
# every process takes identical decisions and the collectives stay aligned
# without any explicit synchronization — exactly the reference's
# "every rank runs the same program" contract.


def split_sources(n: int):
    """Indices of this process's share of `n` stage sources (the
    reference's rank-strided source loop)."""
    return np.arange(jax.process_index(), n, jax.process_count())


def allreduce_sum(x):
    """Sum `x` (device array / numpy / scalar) across processes; no-op in
    single-process runs.  Goes through host allgather — one call per
    stage, the analog of reduce_u_*_arr (io_routines.f90:3667-3986)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    import jax.numpy as jnp

    host = np.asarray(x)
    tot = np.asarray(multihost_utils.process_allgather(host)).sum(axis=0)
    return jnp.asarray(tot) if isinstance(x, jax.Array) else tot


def host_local_batch(mesh: Mesh, spec: P, value: np.ndarray):
    """Host numpy (identical on every process) -> global Array sharded by
    `spec` over `mesh`; each process supplies only the shards its local
    devices own."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.make_array_from_callback(
        np.shape(value), sharding, lambda idx: np.asarray(value)[idx]
    )
