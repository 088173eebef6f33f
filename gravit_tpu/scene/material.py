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
    EMBREE_MATERIAL_METAL = 3
    EMBREE_MATERIAL_VELVET = 4
    EMBREE_MATERIAL_MATTE = 5


@dataclasses.dataclass
class Material:
    type: int = int(MaterialType.LAMBERT)
    kd: tuple = (0.5, 0.5, 0.5)
    ks: tuple = (0.5, 0.5, 0.5)
    alpha: float = 1.0
    # Embree-material params, reference defaults = copper
    # (Material.h:61-75)
    eta: tuple = (0.19, 1.45, 1.50)
    k: tuple = (3.06, 2.40, 1.88)
    roughness: float = 0.05
    horizon_scatter_color: tuple = (0.5, 0.5, 0.5)
    back_scattering: float = 0.0
    horizon_scatter_falloff: float = 0.0


def _clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def eval_embree(mat_type, ks, eta, k_, roughness, hsc, bs, hsf,
                wo, normal, wi, kd):
    """Embree-shaders BRDF family (EmbreeMaterial.h / optics.h):
    matte = Lambertian kd*clamp(N.wi) (the 1/pi is commented out in the
    reference, EmbreeMaterial.h:130); velvet = Minneart + Velvety;
    metal = microfacet conductor. Returns eval BEFORE the 2*w factor the
    Shade() dispatcher applies (Material.cpp:112-120)."""
    ndwi = jnp.sum(normal * wi, axis=-1)
    ndwo = jnp.sum(normal * wo, axis=-1)

    matte = kd * _clamp01(ndwi)[:, None]

    # velvet: Minneart(ks, b) + Velvety(hsc, f)   (EmbreeMaterial.h:161-203)
    one_over_pi = 1.0 / jnp.pi
    cos_i = _clamp01(ndwi)
    back = jnp.power(_clamp01(jnp.sum(wo * wi, axis=-1)), bs)
    minneart = ks * (back * cos_i * one_over_pi)[:, None]
    cos_o = _clamp01(ndwo)
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
    horizon = jnp.power(sin_o, hsf)
    velvety = hsc * (horizon * cos_i * one_over_pi)[:, None]
    velvet = minneart + velvety

    # metal: FresnelConductor * PowerCosine D * G / (4 cosThetaO)
    # (EmbreeMaterial.h:233-249, optics.h:75-137)
    wh = wi + wo
    wh = wh / jnp.sqrt(jnp.maximum(
        jnp.sum(wh * wh, axis=-1, keepdims=True), 1e-30))
    cos_h = jnp.sum(wh * normal, axis=-1)
    cos_t = jnp.sum(wi * wh, axis=-1)
    tmp = eta * eta + k_ * k_
    c2 = (cos_t * cos_t)[:, None]
    ct = cos_t[:, None]
    rpar = (tmp * c2 - 2.0 * eta * ct + 1.0) /         jnp.maximum(tmp * c2 + 2.0 * eta * ct + 1.0, 1e-30)
    rper = (tmp - 2.0 * eta * ct + c2) /         jnp.maximum(tmp + 2.0 * eta * ct + c2, 1e-30)
    fres = 0.5 * (rpar + rper)
    exp = 1.0 / jnp.maximum(roughness, 1e-6)
    dist = (exp + 2.0) * (1.0 / (2.0 * jnp.pi)) *         jnp.power(jnp.abs(cos_h), exp)
    safe_ct = jnp.where(jnp.abs(cos_t) < 1e-30, 1.0, cos_t)
    g = jnp.minimum(1.0, jnp.minimum(2.0 * cos_h * ndwo / safe_ct,
                                     2.0 * cos_h * ndwi / safe_ct))
    metal = ks * fres * (dist * g)[:, None] /         jnp.maximum(4.0 * ndwo, 1e-30)[:, None]
    metal = jnp.where(((ndwi <= 0.0) | (ndwo <= 0.0))[:, None], 0.0, metal)

    out = jnp.where(
        (mat_type == int(MaterialType.EMBREE_MATERIAL_METAL))[:, None],
        metal,
        jnp.where(
            (mat_type == int(MaterialType.EMBREE_MATERIAL_VELVET))[:, None],
            velvet, matte))
    return out


def shade(mat_type, kd, ks, alpha, ray_dir, ray_w, normal, wi,
          has_specular: bool = True):
    """Per-ray shading model dispatch. All args batched (N, ...) arrays.

    Returns (N, 3) model color BEFORE the light contribution factor.
      lambert:     kd * NdotL * w                         (Material.cpp:50-57)
      phong:       + ks * (VdotR * VdotR^alpha) * w       (Material.cpp:59-73)
      blinn-phong: + ks * (NdotH * NdotH^alpha) * w       (Material.cpp:75-87)

    has_specular=False (static, scene-level): no triangle is phong/blinn,
    so the two jnp.power branches are provably dead — removing them saves
    ~6 ms/frame at 262K lanes on v5e (the selects pick `diffuse` on every
    lane either way; bit-equal).
    """
    ndotl = jnp.maximum(0.0, jnp.sum(normal * wi, axis=-1))
    diffuse = kd * (ndotl * ray_w)[:, None]
    if not has_specular:
        return diffuse

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


def shade_full(mat_type, kd, ks, alpha, embree_params, ray_dir, ray_w,
               normal, wi, has_specular: bool = True):
    """shade() extended with the Embree material family: legacy models get
    model*w (already inside shade()); embree types get 2*eval*w
    (Material.cpp:112-120)."""
    legacy = shade(mat_type, kd, ks, alpha, ray_dir, ray_w, normal, wi,
                   has_specular=has_specular)
    if embree_params is None:
        return legacy
    eta, k_, rough, hsc, bs, hsf = embree_params
    emb = eval_embree(mat_type, ks, eta, k_, rough, hsc, bs, hsf,
                      -ray_dir, normal, wi, kd)
    emb = 2.0 * emb * ray_w[:, None]
    is_emb = (mat_type >= int(MaterialType.EMBREE_MATERIAL_METAL))[:, None]
    return jnp.where(is_emb, emb, legacy)


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
