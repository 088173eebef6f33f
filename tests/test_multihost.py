"""Multi-process (multi-host) layer: jax.distributed replaces MPI.

Reference: gvtInit -> MPI_Init (api/api.cpp:76-102), ray exchange over the
communicator (core/comm/communicator/scomm.cpp:39-120).  Here the SAME
shard_map scheduler code spans processes via one global Mesh; the proof is
a real 2-OS-process run of the domain scheduler matching single-process.
"""

import os
import subprocess
import sys

def test_parallel_single_process_helpers():
    import jax
    from gravit_tpu import parallel

    parallel.initialize()  # single-process mode: no coordinator
    assert parallel.is_initialized()
    assert parallel.process_count() == jax.process_count()
    assert parallel.process_index() == jax.process_index()
    mesh = parallel.global_mesh(("domains",))
    assert mesh.devices.size == len(jax.devices())
    mesh2 = parallel.global_mesh(("domains", "rays"),
                                 shape=(len(jax.devices()), 1))
    assert mesh2.shape == {"domains": len(jax.devices()), "rays": 1}
    parallel.shutdown()


def test_two_process_domain_render_matches():
    """Spawn 2 real OS processes (the mpiexec -n 2 analog) and require the
    domain-scheduled image to match the single-process render."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "multihost_dryrun.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")}
    env["GRAVIT_DRYRUN_PORT"] = "12931"
    out = subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST_OK" in out.stdout
