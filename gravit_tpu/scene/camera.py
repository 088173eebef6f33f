"""Perspective camera with multi-jittered sampling.

Bit-parity target: gvtPerspectiveCamera (data/scene/gvtCamera.cpp:89-312),
RIGHT_HAND_CAMERA convention (gvtCamera.h:46). Ray generation is a single
vectorized jnp expression over the whole film (the reference TBB-parallel
per-row loop, gvtCamera.cpp:233-312) and is differentiable wrt eye/focus/up.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gravit_tpu.core.rays import (FLT_MAX, RAY_EPSILON, RayArena, RayType,
                                  VolumeRayType)


@dataclasses.dataclass
class PerspectiveCamera:
    eye: tuple = (0.0, 0.0, 0.0)
    focus: tuple = (0.0, 0.0, -1.0)
    up: tuple = (0.0, 1.0, 0.0)
    fov: float = 0.5235987755982988  # radians; all reference apps pass radians
    film_width: int = 512
    film_height: int = 512
    samples: int = 1          # rays per pixel = samples^2
    max_depth: int = 1
    jitter_window: float = 0.5
    # "current": half_sample = samples*0.5 (gvtCamera.cpp:250);
    # "golden": integer samples/2, matching the build that produced the
    # reference golden images (offset 0 at samples=1)
    jitter_mode: str = "current"

    @property
    def num_rays(self) -> int:
        return self.film_width * self.film_height * self.samples * self.samples

    def basis(self):
        """Camera basis (u, v, w): gvtCamera.cpp:92-144, RIGHT_HAND branch."""
        eye = jnp.asarray(self.eye, jnp.float32)
        focus = jnp.asarray(self.focus, jnp.float32)
        up = jnp.asarray(self.up, jnp.float32)
        w = (focus - eye) / jnp.linalg.norm(focus - eye)
        v0 = up / jnp.linalg.norm(up)
        u = jnp.cross(w, v0)
        u = u / jnp.linalg.norm(u)
        v = jnp.cross(u, w)
        v = v / jnp.linalg.norm(v)
        return u, v, w

    def generate_rays(self, volume: bool = False) -> RayArena:
        """Whole-film primary ray wavefront (gvtCamera.cpp:233-312).

        Pixel NDC uses the W-1/H-1 convention (x0 = i*2/(W-1) - 1); the
        multi-jitter offset for sub-sample (k, s) is
        (s - samples/2) * jitter_window / samples — deterministic, no RNG.
        `id` is the PIXEL index (j*W + i), shared by all samples of a pixel.
        """
        W, H, S = self.film_width, self.film_height, self.samples
        u, v, w = self.basis()
        eye = jnp.asarray(self.eye, jnp.float32)

        vert = jnp.tan(jnp.float32(self.fov) * 0.5)
        horz = vert * (W / float(H))
        offset = self.jitter_window / float(S)
        half = float(S // 2) if self.jitter_mode == "golden" else S * 0.5

        i = jax.lax.broadcasted_iota(jnp.float32, (H, W, S, S), 1)
        j = jax.lax.broadcasted_iota(jnp.float32, (H, W, S, S), 0)
        k = jax.lax.broadcasted_iota(jnp.float32, (H, W, S, S), 2)
        s = jax.lax.broadcasted_iota(jnp.float32, (H, W, S, S), 3)

        x0 = i * (2.0 / (W - 1)) - 1.0
        y0 = j * (2.0 / (H - 1)) - 1.0
        x = (x0 + (s - half) * offset) * horz
        y = (y0 + (k - half) * offset) * vert

        d = x[..., None] * u + y[..., None] * v + w
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        n = self.num_rays
        direction = d.reshape(n, 3)
        pixel = (j * W + i).reshape(n).astype(jnp.int32)

        if volume:
            # volume rays: w accumulates opacity, depth holds term flags
            # (gvtCamera.cpp:293-299)
            t = jnp.full((n,), FLT_MAX, jnp.float32)
            return RayArena(
                origin=jnp.broadcast_to(eye, (n, 3)),
                direction=direction,
                color=jnp.zeros((n, 3), jnp.float32),
                t_max=jnp.full((n,), FLT_MAX, jnp.float32),
                t=t,
                w=jnp.zeros((n,), jnp.float32),
                id=pixel,
                depth=jnp.zeros((n,), jnp.int32),
                type=jnp.full((n,), int(VolumeRayType.PRIMARY), jnp.int32),
                inst=jnp.full((n,), -1, jnp.int32),
                prev=jnp.full((n,), -1, jnp.int32),
                active=jnp.ones((n,), jnp.bool_),
            )
        contri = 1.0 / float(S * S)
        return RayArena(
            origin=jnp.broadcast_to(eye, (n, 3)),
            direction=direction,
            color=jnp.zeros((n, 3), jnp.float32),
            t_max=jnp.full((n,), FLT_MAX, jnp.float32),
            t=jnp.full((n,), FLT_MAX, jnp.float32),
            w=jnp.full((n,), contri, jnp.float32),
            id=pixel,
            depth=jnp.full((n,), self.max_depth, jnp.int32),
            type=jnp.full((n,), int(RayType.PRIMARY), jnp.int32),
            inst=jnp.full((n,), -1, jnp.int32),
            prev=jnp.full((n,), -1, jnp.int32),
            active=jnp.ones((n,), jnp.bool_),
        )


_ = RAY_EPSILON  # parity note: generated rays implicitly use t_min=RAY_EPSILON
