"""Ray reordering between bounces: liveness compaction + coherence sorting.

The TPU-native form of wavefront compaction (SURVEY.md §7's "central
architectural experiment"). XLA programs have static shapes, so paths are
never physically removed from the wave; instead lanes are *permuted* so that

  * dead lanes cluster at the tail — the packet BVH kernel
    (ops/wide_bvh.py) walks a tile only while ANY of its rays is live, so
    an all-dead tile exits after one root test; the XLA skip-link walk
    likewise drains them in one step, and the brute-force shape kernels get
    their hits masked off;
  * live lanes sort by direction octant then by a Morton code of the ray
    origin — secondary rays that scatter incoherently across the scene
    regroup into spatially-coherent packets, which is what keeps lockstep
    packet traversal from degenerating to per-ray worst case on big meshes.

The reference has no analogue (one CPU thread per tile never diverges); this
replaces the warp-compaction / ray-binning step of GPU wavefront tracers.
"""
from __future__ import annotations

import jax.numpy as jnp


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 7 bits of x so there are 2 zero bits between each
    (Morton interleave helper)."""
    x = x & 0x7F
    x = (x | (x << 8)) & 0x0700F
    x = (x | (x << 4)) & 0x430C3
    x = (x | (x << 2)) & 0x49249
    return x


def morton3(q: jnp.ndarray) -> jnp.ndarray:
    """21-bit Morton code from [N,3] integer coords in [0, 127]."""
    return (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << 1)
        | (_part1by2(q[:, 2]) << 2)
    )


def ray_sort_key(active, o, d, world_lo, world_inv) -> jnp.ndarray:
    """Sort key per lane: (dead, direction octant, origin Morton).

    world_lo: [3] scene AABB min; world_inv: [3] 1/extent. Dead lanes get
    the largest keys so live rays pack densely at the front of the wave."""
    q = jnp.clip(
        ((o - world_lo) * world_inv * 128.0).astype(jnp.int32), 0, 127
    )
    code = morton3(q)
    octant = (
        (d[:, 0] > 0).astype(jnp.int32)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | ((d[:, 2] > 0).astype(jnp.int32) << 2)
    )
    key = (octant << 21) | code
    return jnp.where(active, key, jnp.int32(1 << 26))
