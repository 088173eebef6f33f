"""Multi-process (multi-host) execution layer.

The reference's entire distribution story is MPI: every rank runs the same
binary, `gvtInit` calls MPI_Init (api/api.cpp:76-102), the communicator
moves rays between ranks (core/comm/communicator/scomm.cpp:39-120) and IceT
composites over MPI. The TPU-native equivalent is jax.distributed: every
process runs the same SPMD program, a `jax.sharding.Mesh` spans ALL
processes' devices, and the SAME shard_map code (schedule/domain_sched.py)
that runs on one chip's virtual axis runs across hosts — ray migration
all_to_alls ride ICI within a slice and DCN across slices, with zero code
change in the scheduler.

See scripts/multihost_dryrun.py for the 2-process CPU proof run.
"""

from gravit_tpu.parallel.distributed import (global_mesh, host_array,
                                             initialize, is_initialized,
                                             process_count, process_index,
                                             shutdown)

__all__ = [
    "initialize", "shutdown", "is_initialized", "process_count",
    "process_index", "global_mesh", "host_array",
]
