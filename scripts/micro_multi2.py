"""Sub-stage split of one full-width fast-multi round (A0) on hardware:
(a) to_object_space, (b) in-place kernel passes, (c) _next_instance hop,
(d) shade-table row gather, (e) dense shade math. Each stage timed e2e
(one dispatch+fetch, ~25 ms tunnel floor rides every row — compare
DIFFERENCES)."""

import functools
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path[:0] = [str(ROOT), str(ROOT / "tests")]

import jax
jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
import jax.numpy as jnp

import scenes
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.ops.pallas_bvh import PACKET
from gravit_tpu.render import tracer as T
from gravit_tpu.scene import image as image_lib

WIDTH = HEIGHT = 512


REPS = 20


def timeit(name, scan_fn):
    """scan_fn(k) runs the stage k times INSIDE one program, perturbing
    its input per iteration (the axon layer memoizes identical
    executions and dispatches do not pipeline — only in-program scans
    measure device time). Reports (t - floor)/REPS using a 1-rep call
    as the floor."""
    out = scan_fn(1)
    np.asarray(out)
    t0 = time.time()
    np.asarray(scan_fn(1))
    floor = time.time() - t0
    out = scan_fn(REPS)
    np.asarray(out)
    t0 = time.time()
    np.asarray(scan_fn(REPS))
    dt = time.time() - t0
    print(f"{name},{(dt - floor) / (REPS - 1) * 1000:.2f}")


def main():
    scene, cam = scenes.simple_scene(WIDTH, HEIGHT)
    accel = build_scene_bvh([scenes.cone_mesh(), scenes.cube_mesh()])
    rays0 = cam.generate_rays()
    Tt = int(PACKET ** 0.5)
    rays = T._tile_remap(rays0, WIDTH, HEIGHT, Tt)
    fb0 = image_lib.new_framebuffer(WIDTH, HEIGHT)

    @jax.jit
    def init(rays):
        arena, fb = T.shuffle(scene, rays, fb0)
        return arena

    arena = init(rays)
    n = arena.capacity

    @jax.jit
    def obj_full(arena):
        return T.to_object_space(scene, arena)

    o_obj, d_obj, mesh = obj_full(arena)
    queued = arena.active & (arena.inst >= 0) & (mesh >= 0)

    def scanner(stage):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(k):
            def body(acc, i):
                a2 = arena.replace(
                    origin=arena.origin + jnp.float32(1.7e-6) * (i + 1))
                return acc + stage(a2, i), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return acc
        return run

    def st_obj(a2, i):
        oo, dd, mm = T.to_object_space(scene, a2)
        return oo.sum() + dd.sum() + mm.sum()

    def st_kern(a2, i):
        oo = o_obj + jnp.float32(1e-6) * (i + 1)
        h = T._intersect_bvh(scene, accel, oo, d_obj, mesh, queued)
        return h.t.sum() * 0.0 + h.prim.sum().astype(jnp.float32) \
            + a2.origin[0, 0] * 0.0

    def st_hop(a2, i):
        pending = a2.active & (a2.inst < 0)
        found, nxt, t_entry = T._next_instance(
            scene, a2.origin, a2.direction, a2.t_max, a2.prev, pending)
        return (found.sum().astype(jnp.float32)
                + jnp.where(jnp.isfinite(t_entry), t_entry, 0.0).sum()
                * 1e-9)

    tab = T._pack_shade_table(scene)

    def st_shade_gather(a2, i):
        prim = jnp.clip(
            (a2.origin[:, 0] * 1e3).astype(jnp.int32) + i, 0,
            scene.num_triangles - 1)
        return tab[prim].sum()

    def st_noop(a2, i):
        return a2.origin.sum()

    timeit("noop", scanner(st_noop))
    timeit("obj_space", scanner(st_obj))
    timeit("kernel_inplace", scanner(st_kern))
    timeit("hop_scan", scanner(st_hop))
    timeit("shade_row_gather", scanner(st_shade_gather))


if __name__ == "__main__":
    main()
