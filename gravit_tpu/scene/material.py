"""Materials and shading models.

Reference: data/primitives/Material.{h,cpp}. Shading math is vectorized over
rays; `shade()` replicates Shade() (Material.cpp:90-139): model color scaled
by light contribution then clamped to [0, 1]. Light falloff is min(1, 1/d)
(Light.cpp:58-62) — NOT physical 1/d^2; reproduced for pixel parity.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class MaterialType(enum.IntEnum):
    """Material.h:50-57."""

    LAMBERT = 0
    PHONG = 1
    BLINN = 2


@dataclasses.dataclass
class Material:
    type: int = int(MaterialType.LAMBERT)
    kd: tuple = (0.5, 0.5, 0.5)
    ks: tuple = (0.5, 0.5, 0.5)
    alpha: float = 1.0


def shade(mat_type, kd, ks, alpha, ray_dir, ray_w, normal, wi):
    """Per-ray shading model dispatch. All args batched (N, ...) arrays.

    Returns (N, 3) model color BEFORE the light contribution factor.
      lambert:     kd * NdotL * w                         (Material.cpp:50-57)
      phong:       + ks * (VdotR * VdotR^alpha) * w       (Material.cpp:59-73)
      blinn-phong: + ks * (NdotH * NdotH^alpha) * w       (Material.cpp:75-87)
    """
    ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
    diffuse = kd * (ndotl * ray_w)[:, None]

    r = normal * (2.0 * ndotl)[:, None] - wi
    vdotr = jnp.maximum(0.0, jnp.sum(r * (-ray_dir), axis=-1))
    phong_pow = vdotr * jnp.power(vdotr, alpha)
    phong = diffuse + ks * (phong_pow * ray_w)[:, None]

    h = wi - ray_dir
    h2 = jnp.sum(h * h, axis=-1, keepdims=True)
    h = h / jnp.sqrt(jnp.maximum(h2, 1e-30))
    ndoth = jnp.maximum(0.0, jnp.sum(h * normal, axis=-1))
    blinn_pow = ndoth * jnp.power(ndoth, alpha)
    blinn = diffuse + ks * (blinn_pow * ray_w)[:, None]

    color = jnp.where(
        (mat_type == int(MaterialType.PHONG))[:, None],
        phong,
        jnp.where((mat_type == int(MaterialType.BLINN))[:, None], blinn, diffuse),
    )
    return color


def shade_with_light(mat_type, kd, ks, alpha, ray_dir, ray_w, normal,
                     hit_point, light_pos, light_contrib):
    """Full Shade(): model * Li, clamped; returns (color, valid) per ray.

    valid=False when NdotL == 0 or Li == 0 (Shade() returns false and no
    shadow ray is spawned, Material.cpp:97-101).
    """
    wi = light_pos - hit_point
    w2 = jnp.sum(wi * wi, axis=-1, keepdims=True)
    wi = wi / jnp.sqrt(jnp.maximum(w2, 1e-30))
    ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
    li = light_contrib
    valid = (ndotl > 0.0) & jnp.any(li != 0.0, axis=-1)
    color = shade(mat_type, kd, ks, alpha, ray_dir, ray_w, normal, wi)
    color = jnp.clip(color * li, 0.0, 1.0)
    return color, valid
