"""Per-phase domain-round profile at n = 1/2/4/8 virtual CPU devices
(VERDICT r4 next #1: split CPU-collective cost from structural cost).

Builds the scaling.py scene and times FOUR variants of a fixed-round
domain program (no early-exit while_loop, so every variant runs the same
round count):

  trace    : claim + K rounds of trace_round only (no exchange at all)
  pack     : + the one-hot destination pack each round (no all_to_all)
  a2a      : + the all_to_all on the packed buffers (no merge)
  full     : + the incoming merge (the real round loop)

Differences between consecutive variants isolate each phase's wall cost.
Per-device work in every phase is over the REPLICATED arena (capacity C
regardless of n), so on one shared host total work grows ~n x; this
script quantifies exactly how much of SCALING_r04's inflation is that
structural replication vs the CPU collective backend.

  python scripts/profile_domain.py [--devices 1 2 4 8] [--rounds 12]
"""

import argparse
import functools
import sys
import time
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    import os
    flags = os.environ.get("XLA_FLAGS", "")
    want = max(args.devices)
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={want}"
        ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    import scenes
    from gravit_tpu.core.math3d import mat4_translate_scale
    from gravit_tpu.render import tracer as tracer_lib
    from gravit_tpu.render.scene_build import Instance
    from gravit_tpu.render.tracer import make_arena
    from gravit_tpu.schedule.domain_sched import (
        _merge_incoming, _pack_exchange, build_routes, one_hot_residency,
        partition_scene, round_robin_owners)
    from gravit_tpu.scene import image as image_lib
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
    K = args.rounds

    print(f"# backend={jax.default_backend()} film={size} "
          f"C={arena0.capacity} rounds={K}")
    print("devices,variant,ms_frame")

    for n in args.devices:
        owners = round_robin_owners(len(instances), n)
        resident = one_hot_residency(owners, n)
        route_np, n_rep_np = build_routes(resident)
        stacked, owners_j = partition_scene(meshes, instances, lights, n,
                                            owners=owners)
        mesh = Mesh(np.array(jax.devices()[:n]).reshape(n), ("domains",))
        cap = max(1024, arena0.capacity // n)
        route = jnp.asarray(route_np)
        n_rep = jnp.asarray(n_rep_np)
        res = jnp.asarray(resident.astype(np.int32))
        n_inst = len(instances)

        def build(variant):
            scene_specs = jax.tree.map(lambda _: P("domains"), stacked)
            arena_specs = jax.tree.map(lambda _: P(), arena0)

            @jax.jit
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(scene_specs, P(), P(), P(), arena_specs),
                out_specs=P(), check_vma=False)
            def run(scene_d, route, n_rep, res, arena):
                unstack = lambda a: (a[0] if a.ndim and a.shape[0] == 1
                                     else a)
                scene_l = jax.tree.map(unstack, scene_d)
                me = jax.lax.axis_index("domains")
                tile = tracer_lib._choose_tile(scene_l.tri_v0.shape[0])
                fb = image_lib.new_framebuffer(size, size)

                def serving_device(inst, ray_id):
                    i = jnp.clip(inst, 0, n_inst - 1)
                    return route[i, ray_id % n_rep[i]]

                arena2, fb = tracer_lib.shuffle(scene_l, arena, fb)
                claim = serving_device(arena2.inst, arena2.id) == me
                arena2 = arena2.replace(
                    active=arena2.active & ((arena2.inst < 0) | claim))

                def round_fn(r, state):
                    arena, fb = state
                    arena, fb = tracer_lib.trace_round(
                        scene_l, arena, fb, r, tile, accel=None)
                    if variant == "trace":
                        return arena, fb
                    here = res[jnp.clip(arena.inst, 0, n_inst - 1), me] > 0
                    send = arena.active & (arena.inst >= 0) & ~here
                    dest = jnp.where(
                        send, serving_device(arena.inst, arena.id), -1)
                    arena, packed, _, _ = _pack_exchange(arena, dest, n,
                                                         cap)
                    if variant == "pack":
                        # consume `packed` so it isn't DCE'd: fold one
                        # scalar per round into the framebuffer's pad lane
                        s = jnp.sum(packed.t_max) * 0.0
                        return arena, fb + s
                    incoming = jax.tree.map(
                        lambda a: jax.lax.all_to_all(
                            a, "domains", split_axis=0, concat_axis=0,
                            tiled=False), packed)
                    if variant == "a2a":
                        s = jnp.sum(incoming.t_max) * 0.0
                        return arena, fb + s
                    arena, _ = _merge_incoming(arena, incoming)
                    return arena, fb

                arena3, fb = jax.lax.fori_loop(
                    0, K, lambda r, st: round_fn(r, st), (arena2, fb))
                return jax.lax.psum(fb, "domains")

            return run

        for variant in ("trace", "pack", "a2a", "full"):
            if n == 1 and variant in ("a2a",):
                pass  # all_to_all at n=1 is legal; keep for the baseline
            run = build(variant)
            fb = run(stacked, route, n_rep, res, arena0)
            float(np.asarray(fb[:8]).sum())
            ts = []
            for i in range(5):
                a = arena0.replace(origin=arena0.origin + 1e-6 * (i + 1))
                t0 = time.time()
                fb = run(stacked, route, n_rep, res, a)
                float(np.asarray(fb[:8]).sum())
                ts.append(time.time() - t0)
            ts.sort()
            print(f"{n},{variant},{ts[len(ts) // 2] * 1000:.2f}")


if __name__ == "__main__":
    main()
