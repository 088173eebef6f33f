"""Renderer facade — gvtRenderer (render/Renderer.cpp:37-115).

reload(name): read the Scheduler node, build the camera from the DB,
compile the scene into device arrays (+ BVH accel for surface scenes), and
pick the tracer by scheduler enum; render(): generate rays and trace;
write_image(): PPM out (rank-0 write, IceTComposite.cpp:119-157).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gravit_tpu.core.context import RenderContext


class Renderer:
    _instance: "Optional[Renderer]" = None

    def __init__(self):
        self._fb = {}
        self._films = {}

    @classmethod
    def instance(cls) -> "Renderer":
        if cls._instance is None:
            cls._instance = Renderer()
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        cls._instance = None

    # -- scene compilation ------------------------------------------------

    def _camera(self, db: RenderContext, cam_name: str, film_name: str):
        from gravit_tpu.scene.camera import PerspectiveCamera

        cam = db.group("Cameras").children[cam_name]
        film = db.group("Films").children[film_name]
        return PerspectiveCamera(
            eye=cam["eyePoint"], focus=cam["focus"], up=cam["upVector"],
            fov=cam["fov"], film_width=film["width"],
            film_height=film["height"], samples=cam["raySamples"],
            max_depth=cam["rayMaxDepth"],
            jitter_window=cam["jitterWindowSize"])

    def _lights(self, db: RenderContext):
        from gravit_tpu.scene.light import (ambient_light, area_light,
                                            point_light)

        out = []
        for node in db.group("Lights").children.values():
            if node.type == "PointLight":
                out.append(point_light(node["position"], node["color"]))
            elif node.type == "AreaLight":
                out.append(area_light(node["position"], node["color"],
                                      node["normal"], node["width"],
                                      node["height"]))
            elif node.type == "AmbientLight":
                out.append(ambient_light(node["color"]))
        return out

    def _surface_scene(self, db: RenderContext):
        from gravit_tpu.render.scene_build import Instance, build_scene

        mesh_nodes = [n for n in db.group("Data").children.values()
                      if n.type == "Mesh"]
        name2id = {n.name: i for i, n in enumerate(mesh_nodes)}
        meshes = [n["ptr"].compile() for n in mesh_nodes]
        instances = [
            Instance(mesh_id=name2id[n["meshRef"]], m=n["mat"])
            for n in db.group("Instances").children.values()
        ]
        lights = self._lights(db)
        scene = build_scene(meshes, instances, lights)
        return scene, meshes, instances, lights

    def _volume_scene(self, db: RenderContext):
        from gravit_tpu.render.volume_scene import build_volume_scene

        vol_nodes = [n for n in db.group("Data").children.values()
                     if n.type == "Volume"]
        name2id = {n.name: i for i, n in enumerate(vol_nodes)}
        volumes = []
        for n in vol_nodes:
            v = n["ptr"]
            # attach AMR subgrids registered via api.addAmrSubgrid
            v.subgrids = []
            for _gid, level, sub in n.get("subgrids", []):
                sub.level = level
                v.subgrids.append(sub)
            volumes.append(v)
        instances = [
            (name2id[n["meshRef"]], n["mat"])
            for n in db.group("Instances").children.values()
        ]
        return build_volume_scene(volumes, instances)

    # -- rendering --------------------------------------------------------

    def render(self, name: str) -> None:
        import jax

        from gravit_tpu.api import Schedule

        db = RenderContext.instance()
        sched = db.group("Schedulers").children[name]
        camera = self._camera(db, sched["camera"], sched["film"])
        self._films[name] = (camera.film_width, camera.film_height,
                             db.group("Films").children[sched["film"]])

        if sched["volume"]:
            from gravit_tpu.api import Schedule
            from gravit_tpu.render.tracer import make_arena
            from gravit_tpu.render.volume_tracer import trace_volume

            scene = self._volume_scene(db)
            arena = make_arena(camera.generate_rays(volume=True), 0)
            n_dev = len(jax.devices())
            stype = int(sched["type"])
            same_shape = len({s.shape for s in scene.vol_samples}) == 1
            if stype in (int(Schedule.Domain), int(Schedule.AsyncDomain)) \
                    and n_dev > 1 and same_shape \
                    and scene.num_instances > 1:
                from jax.sharding import Mesh

                from gravit_tpu.schedule.volume_domain import (
                    partition_volume_scene, trace_volume_domain)

                vol_nodes = [n for n in db.group("Data").children.values()
                             if n.type == "Volume"]
                volumes = [n["ptr"] for n in vol_nodes]
                name2id = {n.name: i for i, n in enumerate(vol_nodes)}
                instances = [(name2id[n["meshRef"]], n["mat"]) for n in
                             db.group("Instances").children.values()]
                from gravit_tpu.render.volume_tracer import slice_axes_for

                jmesh = Mesh(np.array(jax.devices()).reshape(n_dev),
                             ("domains",))
                stacked, owners = partition_volume_scene(
                    volumes, instances, n_dev)
                import os
                interp = (os.environ.get("GRAVIT_PALLAS_INTERPRET",
                                         "0") == "1"
                          or jax.default_backend() not in ("tpu", "axon"))
                rays_v = camera.generate_rays(volume=True)
                fb = trace_volume_domain(
                    stacked, owners, arena, camera.film_width,
                    camera.film_height, jmesh,
                    slice_axes=slice_axes_for(stacked, rays_v.direction),
                    slice_interpret=interp)
            else:
                from gravit_tpu.render.volume_tracer import (
                    can_slice_march, slice_axes_for, trace_volume_fast)

                rays = camera.generate_rays(volume=True)
                ok, axis, flip = can_slice_march(scene, rays.direction)
                if ok:
                    # single-brick megapass: the whole frame in one
                    # slice-march kernel dispatch (the ospTraceRays-speed
                    # engine; AMR/iso/slice scenes keep the gather march)
                    fb = trace_volume_fast(scene, rays, camera.film_width,
                                           camera.film_height,
                                           axis=axis, flip=flip)
                else:
                    # multi-brick / featureful: the wavefront tracer, with
                    # the slice engine serving each qualifying brick
                    # (march_round slice_axes) and the gather march the
                    # rest — the volume analog of the fast adapter running
                    # under every scheduler
                    import os

                    interp = (os.environ.get("GRAVIT_PALLAS_INTERPRET",
                                             "0") == "1"
                              or jax.default_backend() not in
                              ("tpu", "axon"))
                    fb = trace_volume(
                        scene, arena, camera.film_width,
                        camera.film_height,
                        slice_axes=slice_axes_for(scene, rays.direction),
                        slice_interpret=interp)
            self._fb[name] = fb
            return

        scene, meshes, instances, lights = self._surface_scene(db)
        stype = int(sched["type"])
        n_dev = len(jax.devices())
        if stype in (int(Schedule.Domain), int(Schedule.AsyncDomain)) \
                and n_dev > 1:
            from jax.sharding import Mesh

            from gravit_tpu.schedule.domain_sched import DomainRenderer

            mesh = Mesh(np.array(jax.devices()).reshape(n_dev),
                        ("domains",))
            dr = DomainRenderer.build(meshes, instances, lights, mesh)
            fb = dr.render(camera)
        else:
            from gravit_tpu.render.tracer import (make_arena, trace_image,
                                                  trace_image_fast,
                                                  trace_image_fast_multi)

            accel = self._maybe_accel(meshes)
            if scene.num_instances == 1 and camera.max_depth <= 6:
                # megapass: whole frame in max_depth+1 dense intersection
                # dispatches, bit-equal to the loop for any depth on one
                # instance (tests/test_fast_path); the depth cap only
                # bounds the static generation unroll
                fb = trace_image_fast(scene, camera.generate_rays(),
                                      camera.film_width, camera.film_height,
                                      accel=accel,
                                      samples=camera.samples,
                                      max_depth=camera.max_depth)
            elif camera.max_depth <= 1:
                # multi-instance megapass: dense 3-phase resolution,
                # bit-equal to the loop incl. area lights (phase A records
                # each ray's freeze round to seed the light-sample hashes;
                # tests/test_fast_multi)
                fb = trace_image_fast_multi(
                    scene, camera.generate_rays(), camera.film_width,
                    camera.film_height, accel=accel, samples=camera.samples)
            else:
                arena = make_arena(camera.generate_rays(), scene.num_lights)
                fb = trace_image(scene, arena, camera.film_width,
                                 camera.film_height, accel=accel)
        self._fb[name] = fb

    def _maybe_accel(self, meshes):
        """Pallas BVH on TPU backends; jnp brute force elsewhere (the
        Mosaic kernel needs real hardware; tests run on CPU)."""
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return None
        total = sum(m.num_triangles for m in meshes)
        if total < 512:
            return None
        from gravit_tpu.accel.scene_accel import build_scene_bvh

        return build_scene_bvh(meshes)

    def framebuffer(self, name: str):
        return self._fb[name]

    def write_image(self, name: str, output: str = "") -> str:
        from gravit_tpu.scene import image as img

        w, h, film = self._films[name]
        path = (output or film["outputPath"] or name)
        if not path.endswith(".ppm"):
            path = path + ".ppm"
        img.write_ppm(path, np.asarray(self._fb[name]), w, h)
        return path
