"""2-process multi-host proof run (CPU backend, no TPU pod required).

The reference's distribution test is "run the same binary under
mpiexec -n 2" (e.g. Test/GVTTest run scripts); this is the jax.distributed
analog: spawn 2 OS processes, each with 1 CPU device, form a 2-device
global mesh across them, and run the REAL domain scheduler
(schedule/domain_sched.trace_domain — same shard_map code as single
process) to a framebuffer that must match the single-process render
bit-for-bit.

Usage:
    python scripts/multihost_dryrun.py            # parent: spawns 2 workers
    (workers are re-invocations of this file with GRAVIT_PROCESS_ID set)

Exits 0 and prints MULTIHOST_OK on success.
"""

import os
import subprocess
import sys


def worker() -> None:
    # JAX_PLATFORMS/XLA_FLAGS are set by parent() BEFORE spawn — this
    # interpreter's sitecustomize imports jax at startup, so env set here
    # would be too late to pick the CPU backend.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax
    from gravit_tpu import parallel

    parallel.initialize()  # reads GRAVIT_* env (gvtInit analog)
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import scenes
    from gravit_tpu.render.scene_build import Instance, build_scene
    from gravit_tpu.render.tracer import make_arena, trace_image
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.scene.light import point_light
    from gravit_tpu.schedule.domain_sched import (DomainRenderer,
                                                  partition_scene)

    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    instances = [
        Instance(mesh_id=k % 2,
                 m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                        (0.4, 0.4, 0.4)))
        for k, (i, j) in enumerate(
            (i, j) for i in range(-1, 2) for j in range(-1, 2))
    ]
    lights = [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))]
    _, cam = scenes.simple_scene(24, 24)

    mesh = parallel.global_mesh(("domains",))
    assert mesh.devices.size == 2

    dr = DomainRenderer.build(meshes, instances, lights, mesh)
    fb = dr.render(cam, max_rounds=16)
    # fully-replicated output: every process can fetch the whole image
    fb_np = np.asarray(fb)

    if jax.process_index() == 0:
        # single-process reference (plain trace_image on the global scene)
        scene = build_scene(meshes, instances, lights)
        arena = make_arena(cam.generate_rays(), 1)
        fb_ref = np.asarray(trace_image(scene, arena, 24, 24, max_rounds=16))
        err = np.abs(fb_ref[:, :3] - fb_np[:, :3]).max()
        assert err < 1e-5, f"multihost image differs by {err}"
        assert (fb_np[:, :3].sum(-1) > 0).sum() > 20, "image is empty"
        print(f"MULTIHOST_OK err={err:.2e} "
              f"procs={jax.process_count()} devices={mesh.devices.size}")
    parallel.shutdown()


def parent() -> int:
    port = int(os.environ.get("GRAVIT_DRYRUN_PORT", "12127"))
    env_base = {
        # drop any TPU-plugin vars (PALLAS_AXON_*) so the workers'
        # sitecustomize doesn't initialize a backend before
        # jax.distributed.initialize runs
        **{k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")},
        "GRAVIT_COORDINATOR": f"localhost:{port}",
        "GRAVIT_NUM_PROCESSES": "2",
        # before interpreter start: sitecustomize imports jax immediately
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=1"),
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "GRAVIT_PROCESS_ID": str(pid),
               "GRAVIT_DRYRUN_WORKER": "1"}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    ok = True
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        ok = ok and (p.returncode == 0)
    sys.stdout.write(outs[0] or "")
    if not ok or "MULTIHOST_OK" not in (outs[0] or ""):
        sys.stderr.write("--- worker 1 output ---\n" + (outs[1] or ""))
        return 1
    return 0


if __name__ == "__main__":
    if os.environ.get("GRAVIT_DRYRUN_WORKER"):
        worker()
    else:
        sys.exit(parent())
