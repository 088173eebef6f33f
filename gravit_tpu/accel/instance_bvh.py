"""Top-level instance BVH — log-time domain culling for the shuffle.

Reference: data/accel/BVH.cpp:77-216 builds a SAH tree over *instance*
AABBs (leaf = 1 instance, TRAVERSAL_COST 0.5, split axis = largest extent)
and traverses ray packets against it (BVH.h:61-135) to pick each ray's next
domain. The repo's default shuffle is an exact vectorized O(N x I) slab
scan (render/tracer.shuffle) — fine to ~10^4 instances, quadratic beyond.

This module supplies the missing log-time component, TPU-shaped:
  * Host-side binned-SAH build (numpy; binned rather than the reference's
    exhaustive edge splits, which are O(I^2) per node — the capability is
    log-time culling, not a bit-equal tree).
  * STACKLESS skip-link flattening: nodes in preorder; each node stores the
    next node to visit on hit (preorder successor) and on miss/leaf-done
    (its skip pointer). Traversal is then a single per-ray int32 pointer
    advanced in lock-step inside one lax.while_loop — no per-lane stack,
    no scatter, every step a dense gather + elementwise slab test, which
    is exactly what the VPU wants.
  * The leaf hit predicate replicates the scan's semantics bit-for-bit
    (tfar > tnear, tnear > RAY_EPSILON, tnear < t_max, inst != prev,
    lowest-index argmin tie-break), so tree and scan shuffles agree
    exactly; equality is pinned by tests/test_instance_bvh.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

RAY_EPSILON = 1e-6
FLT_MAX = float(np.finfo(np.float32).max)
SAH_BINS = 16


@struct.dataclass
class InstanceBVH:
    node_lo: jax.Array   # (Nn, 3) f32
    node_hi: jax.Array   # (Nn, 3) f32
    inst_id: jax.Array   # (Nn,) i32: instance at leaf, -1 interior
    miss: jax.Array      # (Nn,) i32: next node on miss / after leaf (-1 end)

    @property
    def num_nodes(self) -> int:
        return self.node_lo.shape[0]


def build_instance_bvh(lo: np.ndarray, hi: np.ndarray) -> InstanceBVH:
    """Binned-SAH over instance AABBs, flattened preorder with skip links."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    n = lo.shape[0]
    centroid = (lo + hi) * 0.5

    node_lo: list = []
    node_hi: list = []
    inst_id: list = []
    miss: list = []

    def emit(ids: np.ndarray, miss_ptr: int) -> int:
        """Append the subtree over `ids`; returns its root index.
        `miss_ptr` = node to visit after this subtree is exhausted."""
        me = len(node_lo)
        node_lo.append(lo[ids].min(axis=0))
        node_hi.append(hi[ids].max(axis=0))
        if ids.size == 1:
            inst_id.append(int(ids[0]))
            miss.append(miss_ptr)
            return me
        inst_id.append(-1)
        miss.append(miss_ptr)
        c = centroid[ids]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))  # largest extent (BVH.cpp:112)
        if ext[axis] <= 0:
            half = ids.size // 2
            left_ids, right_ids = ids[:half], ids[half:]
        else:
            # binned SAH along `axis`
            rel = (c[:, axis] - c[:, axis].min()) / ext[axis]
            bins = np.minimum((rel * SAH_BINS).astype(np.int32),
                              SAH_BINS - 1)
            best_cost, best_split = np.inf, None
            for s in range(1, SAH_BINS):
                lmask = bins < s
                nl = int(lmask.sum())
                if nl == 0 or nl == ids.size:
                    continue
                bl_lo = lo[ids[lmask]].min(axis=0)
                bl_hi = hi[ids[lmask]].max(axis=0)
                br_lo = lo[ids[~lmask]].min(axis=0)
                br_hi = hi[ids[~lmask]].max(axis=0)
                sa = lambda a, b: float(np.prod(np.maximum(b - a, 0))
                                        ) or 1e-30
                # SAH cost shape per BVH.cpp:39-40 (leaf=1, traversal 0.5)
                cost = 0.5 + sa(bl_lo, bl_hi) * nl + sa(br_lo, br_hi) * (
                    ids.size - nl)
                if cost < best_cost:
                    best_cost, best_split = cost, s
            if best_split is None:
                half = ids.size // 2
                order = np.argsort(c[:, axis], kind="stable")
                left_ids, right_ids = ids[order[:half]], ids[order[half:]]
            else:
                lmask = bins < best_split
                left_ids, right_ids = ids[lmask], ids[~lmask]
        # left child sits at me+1; its skip target is the right child,
        # whose skip target is this node's own miss pointer
        left_root = emit(left_ids, miss_ptr=-2)  # patched below
        right_root = emit(right_ids, miss_ptr=miss_ptr)
        # patch the left subtree: every -2 placeholder inside it points at
        # the right sibling
        for k in range(left_root, right_root):
            if miss[k] == -2:
                miss[k] = right_root
        return me

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * n + 100))
    try:
        emit(np.arange(n), -1)
    finally:
        sys.setrecursionlimit(old_limit)
    return InstanceBVH(
        node_lo=jnp.asarray(np.stack(node_lo)),
        node_hi=jnp.asarray(np.stack(node_hi)),
        inst_id=jnp.asarray(np.array(inst_id, np.int32)),
        miss=jnp.asarray(np.array(miss, np.int32)))


def closest_instance(bvh: InstanceBVH, origin: jax.Array, inv_dir: jax.Array,
                     t_max: jax.Array, exclude: jax.Array,
                     active: jax.Array):
    """Per-ray closest instance AABB (BVH::intersect update=true semantics).

    Returns (found, inst, t_entry) matching the scan shuffle exactly:
    smallest tnear wins, lowest instance id breaks ties, `exclude` skipped.
    Lock-step stackless walk: one int32 pointer per ray.
    """
    n = origin.shape[0]
    ptr0 = jnp.where(active, 0, -1).astype(jnp.int32)
    best_t = jnp.full((n,), FLT_MAX, jnp.float32)
    best_i = jnp.full((n,), -1, jnp.int32)

    def cond(state):
        ptr, _, _ = state
        return jnp.any(ptr >= 0)

    def body(state):
        ptr, best_t, best_i = state
        node = jnp.maximum(ptr, 0)
        lo = bvh.node_lo[node]
        hi = bvh.node_hi[node]
        l = (lo - origin) * inv_dir
        u = (hi - origin) * inv_dir
        tnear = jnp.max(jnp.minimum(l, u), axis=-1)
        tfar = jnp.min(jnp.maximum(l, u), axis=-1)
        inst = bvh.inst_id[node]
        is_leaf = inst >= 0

        leaf_ok = (
            is_leaf & (tfar > tnear) & (tnear > RAY_EPSILON)
            & (tnear < t_max) & (inst != exclude)
            & ((tnear < best_t) | ((tnear == best_t) & (inst < best_i)))
        )
        best_t = jnp.where(leaf_ok, tnear, best_t)
        best_i = jnp.where(leaf_ok, inst, best_i)

        # descend iff the subtree could still contain a better leaf;
        # interior tnear can be <= RAY_EPSILON while a leaf inside is not
        descend = (~is_leaf & (tfar >= tnear) & (tfar > RAY_EPSILON)
                   & (tnear < t_max) & (tnear <= best_t))
        nxt = jnp.where(descend, node + 1, bvh.miss[node])
        ptr = jnp.where(ptr < 0, -1, nxt)
        return ptr, best_t, best_i

    _, best_t, best_i = jax.lax.while_loop(
        cond, body, (ptr0, best_t, best_i))
    return best_i >= 0, best_i, best_t
