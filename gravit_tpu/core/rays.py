"""Ray actor state as a fixed-capacity SoA arena (pytree of arrays).

The reference keeps rays as a 68-byte packed AoS POD (actor/Ray.h:45-96) so
they can memcpy in and out of MPI buffers. On TPU the natural layout is SoA:
every field is a `(N,)` or `(N, 3)` device array, `N` static, so the whole
wavefront maps onto the VPU and `lax.all_to_all` can migrate rays between
chips without packing. "Dead" lanes are masked by `active`; queue membership
(which GraviT models as per-instance RayVectors) is the integer `inst` field.

Field semantics mirror actor/Ray.h:68-79 and actor/ORays.h:5-14:
  - surface rays: `depth` is the remaining bounce budget, `w` the contribution
  - volume rays:  `depth` is the termination bitmask (RAY_BOUNDARY & co),
                  `w` the accumulated opacity
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
from flax import struct

RAY_EPSILON = 1e-6  # actor/Ray.cpp:33
FLT_MAX = float(jnp.finfo(jnp.float32).max)


class RayType(enum.IntEnum):
    """Surface ray types (actor/Ray.h:50-55)."""

    PRIMARY = 0
    SHADOW = 1
    SECONDARY = 2


class VolumeRayType(enum.IntEnum):
    """Volume ray types (actor/ORays.h:5-8)."""

    PRIMARY = 1
    SHADOW = 2
    AO = 3
    EMPTY = 4


# Volume termination bitmask, stored in `depth` (actor/ORays.h:10-14).
RAY_SURFACE = 0x1
RAY_OPAQUE = 0x2
RAY_BOUNDARY = 0x4
RAY_TIMEOUT = 0x8
RAY_EXTERNAL_BOUNDARY = 0x10

NO_INSTANCE = -1


@struct.dataclass
class RayArena:
    """Fixed-capacity wavefront of rays; all arrays share leading dim N."""

    origin: jax.Array     # (N, 3) f32
    direction: jax.Array  # (N, 3) f32
    color: jax.Array      # (N, 3) f32
    t_max: jax.Array      # (N,)  f32
    t: jax.Array          # (N,)  f32
    w: jax.Array          # (N,)  f32
    id: jax.Array         # (N,)  i32  pixel index into the framebuffer
    depth: jax.Array      # (N,)  i32  bounce budget | volume term flags
    type: jax.Array       # (N,)  i32  RayType / VolumeRayType
    inst: jax.Array       # (N,)  i32  target domain/instance, NO_INSTANCE if none
    prev: jax.Array       # (N,)  i32  instance the ray just left (shuffle excludes it)
    active: jax.Array     # (N,)  bool lane carries a live ray

    @property
    def capacity(self) -> int:
        return self.origin.shape[0]

    @classmethod
    def zeros(cls, n: int) -> "RayArena":
        return cls(
            origin=jnp.zeros((n, 3), jnp.float32),
            direction=jnp.zeros((n, 3), jnp.float32),
            color=jnp.zeros((n, 3), jnp.float32),
            t_max=jnp.full((n,), FLT_MAX, jnp.float32),
            t=jnp.full((n,), FLT_MAX, jnp.float32),
            w=jnp.zeros((n,), jnp.float32),
            id=jnp.zeros((n,), jnp.int32),
            depth=jnp.zeros((n,), jnp.int32),
            type=jnp.zeros((n,), jnp.int32),
            inst=jnp.full((n,), NO_INSTANCE, jnp.int32),
            prev=jnp.full((n,), NO_INSTANCE, jnp.int32),
            active=jnp.zeros((n,), jnp.bool_),
        )

    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))

    def mask_where(self, mask: jax.Array) -> "RayArena":
        """Deactivate lanes where `mask` is False."""
        return self.replace(active=self.active & mask)

    def sort_by_inst(self) -> tuple["RayArena", jax.Array]:
        """Stable-sort lanes by (inactive-last, inst) for queue-coherent tracing.

        Returns the permuted arena and the permutation (for unsorting).
        TPU-native replacement for GraviT's per-instance queues
        (algorithm/TracerBase.h:405-409): after the sort, rays destined for
        the same instance are contiguous, so a blocked Pallas kernel sees one
        instance per block almost everywhere.
        """
        key = jnp.where(self.active, self.inst, jnp.int32(2**30))
        perm = jnp.argsort(key, stable=True)
        return self.gather(perm), perm

    def gather(self, idx: jax.Array) -> "RayArena":
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), self)

    def scatter_into(self, other: "RayArena", idx: jax.Array) -> "RayArena":
        """Write this arena's lanes into `other` at positions `idx`."""
        return jax.tree.map(lambda dst, src: dst.at[idx].set(src), other, self)
