"""Phase/round split of the multi-instance fast path on hardware.

Reimplements trace_image_fast_multi's phases host-stepped (same helpers,
no parity claim) and times each phase-A/C round and phase B separately
(each timed region scanned REPS times inside one program to amortize the
~25 ms tunnel round trip), printing live-lane counts per round — the
measurement VERDICT r4 next #2 asks for before optimizing.

  python scripts/micro_multi.py
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path[:0] = [str(ROOT), str(ROOT / "tests")]

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

import scenes  # noqa: E402
from gravit_tpu.accel.scene_accel import build_scene_bvh  # noqa: E402
from gravit_tpu.ops.intersect import Hit  # noqa: E402
from gravit_tpu.ops.pallas_bvh import PACKET  # noqa: E402
from gravit_tpu.render import tracer as T  # noqa: E402
from gravit_tpu.scene import image as image_lib  # noqa: E402

WIDTH = HEIGHT = 512
REPS = 8
FLT_MAX = T.FLT_MAX


def timed(fn, *args):
    out = fn(*args)                      # compile
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.time() - t0) / REPS * 1000, out


def main():
    scene, cam = scenes.simple_scene(WIDTH, HEIGHT)
    accel = build_scene_bvh([scenes.cone_mesh(), scenes.cube_mesh()])
    rays0 = cam.generate_rays()
    T_tile = int(PACKET ** 0.5)
    rays = T._tile_remap(rays0, WIDTH, HEIGHT, T_tile)
    n = rays.capacity
    fb0 = image_lib.new_framebuffer(WIDTH, HEIGHT)

    @jax.jit
    def init(rays):
        arena, fb = T.shuffle(scene, rays, fb0)
        hit0 = Hit(t=jnp.full((n,), FLT_MAX, jnp.float32),
                   prim=jnp.full((n,), -1, jnp.int32),
                   u=jnp.zeros((n,), jnp.float32),
                   v=jnp.zeros((n,), jnp.float32))
        return arena, fb, hit0

    def a_round_body(arena, hit):
        o_obj, d_obj, mesh = T.to_object_space(scene, arena)
        queued = arena.active & (arena.inst >= 0) & (mesh >= 0)
        h = T._intersect_bvh(scene, accel, o_obj, d_obj, mesh, queued)
        got = queued & (h.prim >= 0)
        hit = Hit(t=jnp.where(got, h.t, hit.t),
                  prim=jnp.where(got, h.prim, hit.prim),
                  u=jnp.where(got, h.u, hit.u),
                  v=jnp.where(got, h.v, hit.v))
        escapes = queued & (h.prim < 0)
        arena = arena.replace(
            prev=jnp.where(escapes, arena.inst, arena.prev),
            inst=jnp.where(escapes, -1, arena.inst),
            active=arena.active & ~got,
        )
        pending = arena.active & (arena.inst < 0)
        found, nxt, t_entry = T._next_instance(
            scene, arena.origin, arena.direction, arena.t_max, arena.prev,
            pending)
        requeue = pending & found
        arena = arena.replace(
            origin=jnp.where(requeue[:, None],
                             arena.origin
                             + arena.direction * (t_entry * 0.95)[:, None],
                             arena.origin),
            inst=jnp.where(requeue, nxt, arena.inst),
            active=arena.active & ~(pending & ~found),
        )
        return arena, hit

    @jax.jit
    def a_round_scanned(arena, hit):
        def body(carry, _):
            arena, hit = carry
            return a_round_body(arena, hit), None
        # REPS reps of the SAME round state are not representative of
        # later rounds, so this function is dispatched per round with the
        # true state; the scan only amortizes the tunnel for timing
        (arena, hit), _ = jax.lax.scan(body, (arena, hit),
                                       jnp.arange(1))
        return arena, hit

    # --- phase A, host-stepped with per-round live counts ---------------
    arena, fb, hit = init(rays)
    arena0, fb0_, hit0 = arena, fb, hit
    print("round,live_before,ms")
    rounds = []
    for r in range(40):
        live = int(np.asarray(jnp.sum(arena.active.astype(jnp.int32))))
        if live == 0:
            break
        t0 = time.time()
        arena, hit = a_round_scanned(arena, hit)
        np.asarray(arena.active[:8])
        dt = (time.time() - t0) * 1000
        rounds.append((r, live, dt))
        print(f"A{r},{live},{dt:.1f}")

    # re-run timed (compiles are warm after the first loop)
    arena, fb, hit = arena0, fb0_, hit0
    total = 0.0
    for r in range(40):
        live = int(np.asarray(jnp.sum(arena.active.astype(jnp.int32))))
        if live == 0:
            break
        t0 = time.time()
        arena, hit = a_round_scanned(arena, hit)
        np.asarray(arena.active[:8])
        dt = (time.time() - t0) * 1000
        total += dt
        print(f"A{r}w,{live},{dt:.1f}")
    print(json.dumps({"phaseA_total_ms_warm_e2e": round(total, 1),
                      "rounds": len(rounds)}))

    # --- phase B one dense shade --------------------------------------
    resolved = hit.prim >= 0
    arena_b = arena.replace(active=resolved)
    hitr = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def phase_b(arena_b, hit):
        a2, fb2, spawn = T._process_surface_hits(
            scene, arena_b, fb0, hit, arena_b.active, hitr, no_bounce=True)
        return spawn

    t0 = time.time()
    spawn = phase_b(arena_b, hit)
    np.asarray(spawn[:4])
    print(f"B_compile+run_ms,{(time.time() - t0) * 1000:.1f}")
    t0 = time.time()
    spawn = phase_b(arena_b, hit)
    np.asarray(spawn[:4])
    print(f"B_warm_e2e_ms,{(time.time() - t0) * 1000:.1f}")

    # --- phase C host-stepped ------------------------------------------
    m = spawn.shape[0]
    s_valid = spawn[:, 15] > 0.5
    state = dict(origin=spawn[:, 0:3], inst=spawn[:, 14].astype(jnp.int32),
                 prev=jnp.full((m,), -1, jnp.int32),
                 dead=jnp.zeros((m,), bool), done=jnp.zeros((m,), bool))
    s_dir = spawn[:, 3:6]
    s_tmax = spawn[:, 10]

    @jax.jit
    def c_round(origin, inst, prev, dead, done):
        live = s_valid & ~dead & ~done
        mesh_id, minv, _ = T._gather_inst(scene, inst)
        o_obj = jnp.einsum("nij,nj->ni", minv[:, :3, :3], origin) \
            + minv[:, :3, 3]
        d_obj = jnp.einsum("nij,nj->ni", minv[:, :3, :3], s_dir)
        mesh = jnp.where(inst >= 0, mesh_id, -1)
        queued = live & (inst >= 0) & (mesh >= 0)
        h = T._intersect_bvh(scene, accel, o_obj, d_obj, mesh, queued,
                             is_shadow=jnp.ones((m,), bool))
        occluded = queued & (h.prim >= 0)
        dead2 = dead | occluded
        escapes = queued & (h.prim < 0)
        prev2 = jnp.where(escapes, inst, prev)
        inst2 = jnp.where(escapes, -1, inst)
        pending = s_valid & ~dead2 & ~done & (inst2 < 0)
        found, nxt, t_entry = T._next_instance(
            scene, origin, s_dir, s_tmax, prev2, pending)
        requeue = pending & found
        origin2 = jnp.where(requeue[:, None],
                            origin + s_dir * (t_entry * 0.95)[:, None],
                            origin)
        inst3 = jnp.where(requeue, nxt, inst2)
        done2 = done | (pending & ~found)
        return origin2, inst3, prev2, dead2, done2

    for r in range(40):
        live = int(np.asarray(jnp.sum(
            (s_valid & ~state["dead"] & ~state["done"]).astype(jnp.int32))))
        if live == 0:
            break
        t0 = time.time()
        out = c_round(state["origin"], state["inst"], state["prev"],
                      state["dead"], state["done"])
        np.asarray(out[3][:8])
        dt = (time.time() - t0) * 1000
        state = dict(zip(("origin", "inst", "prev", "dead", "done"), out))
        print(f"C{r},{live},{dt:.1f}")


if __name__ == "__main__":
    main()
