"""Counter-based per-ray RNG (sharding-invariant sampling).

The reference's RandEngine (core/math/RandEngine.h:42-76, CMR/RSR xorshift
seeded per TBB chunk) makes area-light samples and Russian-roulette depend
on the thread chunk layout — results change with thread count. Here random
draws are a pure hash of (pixel id, bounce depth, round, purpose), so any
sharding of the wavefront produces identical samples: the property MPI
codes give up, SPMD keeps.

PCG-style integer mixing; returns uniforms in [0, 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def _mix(x: jnp.ndarray) -> jnp.ndarray:
    """xxhash/murmur-style avalanche on uint32."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_uniform(ray_id, salt: int, extra=None) -> jnp.ndarray:
    """Uniform [0,1) per lane from (ray_id, salt[, extra])."""
    h = _mix(ray_id.astype(jnp.uint32)
             ^ jnp.uint32((salt * 0x9E3779B9) & 0xFFFFFFFF))
    if extra is not None:
        h = _mix(h ^ extra.astype(jnp.uint32))
    # 24-bit mantissa like the reference's (seed & 0xFFFFFF)/0x1000000
    return (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


def hash_uniform2(ray_id, salt: int, extra=None) -> jnp.ndarray:
    """(N, 2) uniforms."""
    u1 = hash_uniform(ray_id, salt * 2 + 1, extra)
    u2 = hash_uniform(ray_id, salt * 2 + 2, extra)
    return jnp.stack([u1, u2], axis=-1)
