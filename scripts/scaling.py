"""Scaling-efficiency harness: rays/s vs device count for each scheduler.

The SURVEY §6 target: >=80% efficiency 1 host -> 4 hosts for the domain
scheduler. On real multi-chip hardware this measures truly; on one chip /
virtual CPU devices it validates the harness and prints relative numbers
(virtual-device timings share one physical machine — not a speedup claim).

  python scripts/scaling.py [--devices 1 2 4 8] [--size 64]
"""

import argparse
import sys
import time
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def measure(fn, frames=3):
    fb = fn(1000)
    float(np.asarray(fb[:8, :]).sum())
    times = []
    for i in range(frames):
        t0 = time.time()
        fb = fn(i)
        float(np.asarray(fb[:8, :]).sum())
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--json", default="", help="also write rows to this file")
    args = ap.parse_args()
    rows = []

    # force the virtual-CPU mesh platform PROGRAMMATICALLY: this repo's
    # sitecustomize imports jax with JAX_PLATFORMS=axon at interpreter
    # boot, and relying on inherited env once silently put this harness on
    # the one-chip TPU backend (avail=1 -> every multi-device row skipped)
    import os
    flags = os.environ.get("XLA_FLAGS", "")
    want = max(args.devices)
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={want}"
        ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu" or len(jax.devices()) < want:
        raise RuntimeError(
            f"needed {want} virtual CPU devices, got "
            f"{len(jax.devices())} on {jax.default_backend()!r}")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import scenes
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render.scene_build import Instance
    from gravit_tpu.render.tracer import make_arena, trace_image
    from gravit_tpu.schedule.domain_sched import DomainRenderer
    from gravit_tpu.schedule.image_sched import trace_image_sharded
    from gravit_tpu.scene.light import point_light

    size = args.size
    scene, cam = scenes.simple_scene(size, size)
    meshes = [scenes.cone_mesh(), scenes.cube_mesh()]
    instances = []
    k = 0
    for i in range(-2, 3):
        for j in range(-2, 3):
            instances.append(Instance(
                mesh_id=k % 2,
                m=mat4_translate_scale((0.0, i * 0.5, j * 0.5),
                                       (0.4, 0.4, 0.4))))
            k += 1
    lights = [point_light((1.0, 0.0, -1.0), (1.0, 1.0, 1.0))]
    arena0 = make_arena(cam.generate_rays(), 1)
    rays = size * size

    print(f"# backend={jax.default_backend()} film={size}x{size} "
          f"avail={len(jax.devices())}")
    print("scheduler,devices,ms_frame,mray_s,efficiency_vs_1")
    base = {}
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        arena = arena0
        if arena.capacity % n:
            pad = n - arena.capacity % n
            arena = jax.tree.map(lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), arena)

        if n == 1:
            def img_fn(i, arena=arena):
                a = arena.replace(origin=arena.origin + 1e-6 * (i + 1))
                return trace_image(scene, a, size, size, max_rounds=48)
        else:
            mesh = Mesh(np.array(jax.devices()[:n]).reshape(n), ("rays",))

            def img_fn(i, arena=arena, mesh=mesh):
                a = arena.replace(origin=arena.origin + 1e-6 * (i + 1))
                return trace_image_sharded(scene, a, size, size, mesh,
                                           max_rounds=48)
        dt = measure(img_fn)
        base.setdefault("image", dt * 1)
        eff = base["image"] / (dt * n)
        print(f"image,{n},{dt*1000:.2f},{rays/dt/1e6:.2f},{eff:.2f}")
        rows.append({"scheduler": "image", "devices": n,
                     "ms_frame": round(dt * 1000, 2),
                     "rays_per_s": round(rays / dt),
                     "efficiency_vs_1": round(eff, 3)})

        if n > 1:
            mesh = Mesh(np.array(jax.devices()[:n]).reshape(n),
                        ("domains",))
            dr = DomainRenderer.build(meshes, instances, lights, mesh)

            def dom_fn(i, dr=dr):
                cam2 = scenes.PerspectiveCamera(
                    eye=(4.0 + 1e-6 * (i + 1), 0.0, 0.0),
                    focus=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
                    fov=cam.fov, film_width=size, film_height=size,
                    samples=1, max_depth=1, jitter_window=0.5,
                    jitter_mode="golden")
                return dr.render(cam2, max_rounds=48)
            dt = measure(dom_fn)
            base.setdefault("domain", dt * n)
            eff = base["domain"] / (dt * n)
            # work balance: per-device traced ray-rounds (what virtual
            # devices CAN prove — wall-clock on a shared machine cannot)
            _, load = dr.render(cam, max_rounds=48, return_load=True)
            load = np.asarray(load, np.int64).tolist()
            bal = (min(load) / max(load)) if max(load) else 0.0
            print(f"domain,{n},{dt*1000:.2f},{rays/dt/1e6:.2f},{eff:.2f}"
                  f",load={load}")
            rows.append({"scheduler": "domain", "devices": n,
                         "ms_frame": round(dt * 1000, 2),
                         "rays_per_s": round(rays / dt),
                         "efficiency_vs_1": round(eff, 3),
                         "per_device_ray_rounds": load,
                         "load_balance_min_over_max": round(bal, 3)})

    if args.json:
        import json

        pathlib.Path(args.json).write_text(json.dumps({
            "backend": jax.default_backend(), "film": size,
            "note": ("virtual CPU devices share one machine: rows validate "
                     "the sharded code paths, relative dispatch overhead "
                     "and WORK BALANCE (per_device_ray_rounds), not "
                     "hardware speedup (BASELINE.md protocol). The round-3 "
                     "artifact's 40x 1->2-device collapse was per-frame "
                     "retrace+recompile of the un-jitted shard_map "
                     "closures, fixed in image_sched/domain_sched: "
                     "shard_map at n=1 now measures ~2% over the plain "
                     "tracer on this machine."),
            "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
