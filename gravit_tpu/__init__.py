"""gravit_tpu — a TPU-native distributed, differentiable ray-tracing framework.

A from-scratch JAX/Pallas re-design of the capabilities of TACC/GraviT
(reference: /root/reference, C++/MPI/Embree): large scenes decompose into
*domains* (mesh instances or volume bricks); *rays* are the migrating state;
*schedulers* decide how rays and domains map onto a `jax.sharding.Mesh` of
TPU chips. Intersection/shading/ray-marching run as vectorized wavefront
kernels (jnp + Pallas); ray migration is `lax.all_to_all` / `ppermute`
over ICI; compositing is a sharded reduce. The whole pipeline is
differentiable wrt scene parameters (vertices, materials, lights, camera,
transfer functions) — a capability the reference does not have.

Layer map (mirrors reference SURVEY.md §1, re-imagined TPU-first):

  core/      math, ray SoA arena, RNG, context DB        (ref: src/gvt/core)
  scene/     mesh/material/light/camera/volume/image     (ref: render/data)
  accel/     triangle & instance BVH builders            (ref: data/accel)
  ops/       intersection / shading / marching kernels   (ref: adapters)
  schedule/  image & domain & hybrid schedulers          (ref: algorithm/, schedule/)
  parallel/  device-mesh helpers, composite reductions   (ref: comm, IceT)
  render/    tracer loops and the Renderer facade        (ref: Renderer.cpp)
  api.py     the ~30-function public API                 (ref: render/api/api.h)
"""

__version__ = "0.1.0"

from gravit_tpu.core.rays import RayArena, RayType, RAY_EPSILON  # noqa: F401
from gravit_tpu.scene.camera import PerspectiveCamera  # noqa: F401
