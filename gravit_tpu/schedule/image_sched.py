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


def trace_image_sharded(scene: SceneData, arena: RayArena, width: int,
                        height: int, mesh: Mesh, axis: str = "rays",
                        max_rounds: int = 64, accel=None) -> jax.Array:
    """Trace with rays sharded along `axis` of `mesh`; returns replicated fb.

    Requires arena.capacity divisible by the axis size (and by the Pallas
    PACKET when accel is given).
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
