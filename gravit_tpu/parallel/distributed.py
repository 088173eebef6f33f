"""jax.distributed multi-process runtime — the MPI replacement.

The reference initializes MPI in gvtInit (api/api.cpp:76-102), sizes the
world via MPI_Comm_size, and moves rays between ranks through the
communicator (core/comm/communicator/scomm.cpp:39-120).  The TPU-native
equivalent keeps the exact SPMD shape but none of the message plumbing:

  1. every process calls `initialize()` (MPI_Init analog),
  2. `global_mesh()` builds ONE `jax.sharding.Mesh` over *all* processes'
     devices (MPI_COMM_WORLD analog),
  3. the SAME shard_map schedulers (schedule/domain_sched.py,
     schedule/volume_domain.py) run unchanged — their `all_to_all`/`psum`
     collectives are compiled by XLA onto ICI within a slice and DCN
     across slices.  There is no rank-conditional code anywhere.

`host_array` is the one genuinely multi-process-specific helper: building
a globally-sharded array from per-host shards (the analog of each MPI
rank loading only its domains from disk — PlyApp reads only rank-local
.ply files, Readers/PlyReader/PlyReader.cpp).

Proof run: scripts/multihost_dryrun.py spawns 2 CPU processes that
initialize a cluster, build a 2-device global mesh, and run the real
domain scheduler to an image identical to the single-process render.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """MPI_Init analog (reference api/api.cpp:76-102).

    All arguments optional: on TPU pods jax.distributed auto-discovers the
    topology from the metadata server; elsewhere (CPU dryrun, GPU) pass
    them or set GRAVIT_COORDINATOR / GRAVIT_NUM_PROCESSES /
    GRAVIT_PROCESS_ID.  Idempotent — safe to call from every entry point
    the way every reference app calls gvtInit.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "GRAVIT_COORDINATOR")
    if num_processes is None and "GRAVIT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GRAVIT_NUM_PROCESSES"])
    if process_id is None and "GRAVIT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GRAVIT_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # single-process mode: nothing to set up (mpiexec -n 1 analog);
        # all helpers below still work.
        _initialized = True
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def shutdown() -> None:
    """MPI_Finalize analog."""
    global _initialized
    if _initialized and jax.process_count() > 1:
        jax.distributed.shutdown()
    _initialized = False


def is_initialized() -> bool:
    return _initialized


def process_count() -> int:
    """MPI_Comm_size analog."""
    return jax.process_count()


def process_index() -> int:
    """MPI_Comm_rank analog."""
    return jax.process_index()


def global_mesh(axis_names: Sequence[str] = ("domains",),
                shape: Optional[Sequence[int]] = None) -> Mesh:
    """A Mesh spanning every device of every process (MPI_COMM_WORLD).

    Default: 1-D mesh over all global devices on the given axis — the
    domain scheduler's layout.  Pass `shape` for 2-D domain x ray meshes
    (trace_domain's composed model+data parallelism).
    """
    devs = np.array(jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(tuple(shape)), tuple(axis_names))


def host_array(mesh: Mesh, spec: P, local_shards: np.ndarray) -> jax.Array:
    """Assemble a globally-sharded jax.Array from THIS process's shard(s).

    The multi-host analog of each MPI rank loading only its local domains
    (PlyApp: rank r reads only files r, r+size, ...).  `local_shards` is
    the data for this process's addressable devices, leading axis = number
    of local devices on the sharded dimension.
    """
    sharding = NamedSharding(mesh, spec)
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    arrs = np.array_split(local_shards, n_local, axis=0)
    return jax.make_array_from_single_device_arrays(
        _global_shape(mesh, spec, local_shards),
        sharding,
        [jax.device_put(a, d) for a, d in zip(
            arrs, [d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])])


def _global_shape(mesh: Mesh, spec: P, local_shards: np.ndarray):
    # local_shards covers this process's slice of axis 0; every process
    # contributes an equal slice (round-robin domain ownership), so the
    # global extent is local * process_count when axis 0 is sharded.
    shape = list(local_shards.shape)
    if spec and spec[0] is not None:
        shape[0] = local_shards.shape[0] * jax.process_count()
    return tuple(shape)
