"""Image scheduler: rays sharded over the device mesh, scene replicated.

The TPU analog of Tracer<ImageScheduler> (algorithm/ImageTracer.h:111-269):
GraviT statically slices the camera rays size/world_size per MPI rank and
each rank renders its slice with all needed domains resident, then the
framebuffers are reduced. Here the RayArena is sharded over a mesh axis via
shard_map, every chip traces its slice independently (zero communication in
the loop — the "data parallel" axis), and the framebuffer is psum'd
(the MPI image-reduce of TracerBase.h:418 / IceT gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gravit_tpu.core.rays import RayArena
from gravit_tpu.render.scene_build import SceneData
from gravit_tpu.render.tracer import make_arena, trace_image


@functools.partial(jax.jit, static_argnames=("width", "height", "mesh",
                                             "axis", "max_rounds"))
def trace_image_sharded(scene: SceneData, arena: RayArena, width: int,
                        height: int, mesh: Mesh, axis: str = "rays",
                        max_rounds: int = 64, accel=None) -> jax.Array:
    """Trace with rays sharded along `axis` of `mesh`; returns replicated fb.

    Requires arena.capacity divisible by the axis size (and by the Pallas
    PACKET when accel is given).

    The whole call is ONE jitted program (mesh/axis ride as static args):
    an un-jitted shard_map closure would re-trace AND re-compile on every
    frame — measured 2.8 s/frame vs 80 ms at n=1 on CPU, the entire "40x
    sharding overhead" of the round-3 scaling artifact (SCALING_r03).
    """
    scene_specs = jax.tree.map(lambda _: P(), scene)
    arena_specs = jax.tree.map(lambda _: P(axis), arena)
    if accel is None:
        accel_specs = None
    else:
        accel_specs = jax.tree.map(lambda _: P(), accel)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(scene_specs, arena_specs, accel_specs), out_specs=P(),
        check_vma=False,
    )
    def run(scene_l, arena_l, accel_l):
        fb = trace_image(scene_l, arena_l, width, height,
                         max_rounds=max_rounds, accel=accel_l)
        return jax.lax.psum(fb, axis)

    fb = run(scene, arena, accel)
    from gravit_tpu.scene.image import clamp_rgb
    return clamp_rgb(fb)


class StreamedImageRenderer:
    """Out-of-core image scheduling: domains streamed on demand.

    The reference image scheduler loads domains lazily with an adapter
    cache so a replicate-on-demand scene can exceed one rank's memory
    (ImageTracer.h:184-233: pick the fullest queue -> cache-lookup/build
    the adapter -> trace -> shuffle). TPU re-design: meshes are bin-packed
    into GROUPS whose triangle totals fit `budget_tris`; group scenes stay
    in HOST memory; each pick device_puts the chosen group (device_put is
    async — the next-best group is prefetched while the current one
    traces: a double-buffered adapter cache) and runs one bounded trace
    round. Rays whose instance is not in the resident group park exactly
    as under the domain scheduler (inst_mesh == -1) and are picked up when
    their group is scheduled. All groups pad to one common triangle-buffer
    shape so a single compiled program serves every group.

    Depth-1/point-light frames are bit-identical to the all-resident
    tracer (per-ray work is round-invariant); RNG-bearing configs
    (area lights, RR bounces) differ because the counter-based hashes mix
    in the round index.
    """

    # device bytes per triangle of a built SceneData: 49 f32 per-tri
    # attribute columns (v0/e1/e2/ng 12, ns 9, vcol 9, kd/ks/eta/k/hsc 15,
    # alpha/rough/bs/hsf 4) + 5 i32 (mat_type, tri_mesh, faces) + 1 bool,
    # plus ~1.5 f32 of shared vertex rows. The Pallas accel (when used)
    # adds (12 f32 tri rows + ~2 nodes/tri x 12 words) ~= 144 B/tri.
    BYTES_PER_TRI = 228
    BYTES_PER_TRI_ACCEL = 144

    def __init__(self, meshes, instances, lights,
                 budget_tris: int | None = None,
                 budget_bytes: int | None = None,
                 use_accel: bool = False):
        import numpy as np

        from gravit_tpu.render.scene_build import Instance, build_scene

        if budget_bytes is not None:
            per_tri = self.BYTES_PER_TRI + (
                self.BYTES_PER_TRI_ACCEL if use_accel else 0)
            budget_tris = max(1, int(budget_bytes) // per_tri)
        if budget_tris is None:
            raise ValueError("pass budget_tris or budget_bytes")
        biggest = max(m.num_triangles for m in meshes)
        if budget_tris < biggest:
            raise ValueError(
                f"budget_tris={budget_tris} below largest mesh ({biggest})")
        # greedy first-fit pack of mesh ids into groups under the budget
        groups: list[list[int]] = []
        fill: list[int] = []
        order = sorted(range(len(meshes)),
                       key=lambda i: -meshes[i].num_triangles)
        mesh2group = {}
        for mi in order:
            t = meshes[mi].num_triangles
            for g, f in enumerate(fill):
                if f + t <= budget_tris:
                    groups[g].append(mi)
                    fill[g] += t
                    break
            else:
                groups.append([mi])
                fill.append(t)
            mesh2group[mi] = next(g for g, ms in enumerate(groups)
                                  if mi in ms)
        self.num_groups = len(groups)
        self.inst_group = np.array(
            [mesh2group[i.mesh_id] for i in instances], np.int32)

        # per-group SceneData: local meshes only, foreign inst_mesh = -1,
        # global instance tables (same construction as
        # domain_sched.partition_scene, groups-over-time not over-devices)
        ref = build_scene(meshes, instances, lights)
        pad_to = max(fill)
        host = []
        for g, mids in enumerate(groups):
            gl2loc = {mi: l for l, mi in enumerate(mids)}
            inst = [Instance(mesh_id=gl2loc.get(i.mesh_id, 0), m=i.m)
                    for i in instances]
            sd = build_scene([meshes[mi] for mi in mids], inst, lights,
                             pad_tris_to=pad_to)
            resident = np.array(
                [1 if i.mesh_id in gl2loc else 0 for i in instances],
                np.int32)
            sd = sd.replace(
                inst_mesh=jnp.where(jnp.asarray(resident) > 0,
                                    sd.inst_mesh, -1),
                inst_lo=ref.inst_lo, inst_hi=ref.inst_hi,
                inst_bvh=ref.inst_bvh,
                num_meshes=max(len(m) for m in groups),
                mesh_tri_offset=(), mesh_tri_count=(),
                has_embree_materials=ref.has_embree_materials)
            # spill to host: the whole point is that only ONE group's
            # triangles are device-resident at a time
            host.append(jax.tree.map(
                lambda a: np.asarray(a) if hasattr(a, "dtype") else a, sd))
        self.host_scenes = host
        self.lights_count = int(ref.num_lights)
        self._dev_cache: dict[int, SceneData] = {}

        # per-group Pallas accel, padded to common shapes so one compiled
        # program serves every group (partition_accel's device padding,
        # repurposed groups-over-time)
        self.host_accels = None
        if use_accel:
            from gravit_tpu.schedule.domain_sched import partition_accel

            res = np.zeros((len(instances), self.num_groups), bool)
            for i, inst_i in enumerate(instances):
                res[i, mesh2group[inst_i.mesh_id]] = True
            stacked = partition_accel(meshes, instances, self.num_groups,
                                      res)
            self.host_accels = [
                jax.tree.map(
                    lambda a, g=g: (np.asarray(a[g])
                                    if hasattr(a, "dtype") else a),
                    stacked)
                for g in range(self.num_groups)
            ]

    def _fetch(self, g: int):
        # 2-slot cache: current + prefetched next (the double buffer)
        if g not in self._dev_cache:
            put = lambda t: jax.tree.map(
                lambda a: jax.device_put(a) if hasattr(a, "dtype") else a, t)
            self._dev_cache[g] = (
                put(self.host_scenes[g]),
                put(self.host_accels[g]) if self.host_accels else None)
        return self._dev_cache[g]

    def _evict_except(self, keep: set):
        for k in list(self._dev_cache):
            if k not in keep:
                del self._dev_cache[k]

    def render(self, camera, max_rounds: int = 64):
        import numpy as np

        from gravit_tpu.render import tracer as tracer_lib

        arena = make_arena(camera.generate_rays(), self.lights_count)
        w, h = camera.film_width, camera.film_height
        scene0, _ = self._fetch(0)
        arena, fb = tracer_lib._initial_shuffle(scene0, arena, w, h)
        for r in range(max_rounds):
            inst = np.asarray(arena.inst)
            act = np.asarray(arena.active)
            live = act & (inst >= 0)
            if not live.any():
                break
            counts = np.bincount(self.inst_group[inst[live]],
                                 minlength=self.num_groups)
            ranked = np.argsort(-counts)
            g = int(ranked[0])
            scene_g, accel_g = self._fetch(g)
            # prefetch the runner-up while g traces (async device_put)
            nxt = int(ranked[1]) if (self.num_groups > 1
                                     and counts[ranked[1]] > 0) else g
            self._evict_except({g, nxt})
            if nxt != g:
                self._fetch(nxt)
            arena, fb, _ = tracer_lib._round_step(
                scene_g, arena, fb, jnp.int32(r), w, h, accel=accel_g)
        return fb


def render_image_scheduler(scene: SceneData, camera, mesh: Mesh | None = None,
                           axis: str = "rays", max_rounds: int = 64):
    """Convenience: camera -> arena -> (sharded) trace -> framebuffer."""
    rays = camera.generate_rays()
    arena = make_arena(rays, scene.num_lights)
    w, h = camera.film_width, camera.film_height
    if mesh is None or len(mesh.devices) == 1:
        return trace_image(scene, arena, w, h, max_rounds=max_rounds)
    n = len(mesh.devices)
    if arena.capacity % n:
        pad = n - arena.capacity % n
        arena = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), arena)
    return trace_image_sharded(scene, arena, w, h, mesh, axis, max_rounds)
