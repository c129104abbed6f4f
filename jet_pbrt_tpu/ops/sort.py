"""Ray reordering between bounces: liveness compaction + coherence sorting.

The TPU-native form of wavefront compaction (SURVEY.md §7's "central
architectural experiment"). XLA programs have static shapes, so paths are
never physically removed from the wave; instead lanes are *permuted* so that

  * dead lanes cluster at the tail — the cull-sweep kernel
    (ops/sweep_bvh.py) skips an all-dead 128-ray packet after one root
    test, so compaction alone collapses a 5%-live bounce wave from "every
    packet pays a sphere sweep" to a handful of dense live packets; the
    XLA skip-link walk likewise drains dead lanes in one step;
  * live lanes sort by the 128-tri GROUP id of their previous hit, then by
    direction octant — rays that bounced off the same patch of mesh cull
    to nearly the same group set, a far tighter traversal-locality proxy
    than world-space position (measured: world-Morton keys GREW pop counts
    on real bounce waves by concentrating unrelated rays into one packet).

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
    """Sort key per lane: (dead, origin Morton, direction octant).

    world_lo: [3] scene AABB min; world_inv: [3] 1/extent. Dead lanes get
    the largest keys so live rays pack densely at the front of the wave.

    Origin-MAJOR, octant-minor: bounce-ray origins are hit points, so
    fine spatial clustering groups rays that will cull to the same
    128-triangle sweep groups. (The r3 octant-major ordering measurably
    GREW traversal work: it concentrated unrelated far-apart rays into
    single packets.)"""
    q = jnp.clip(
        ((o - world_lo) * world_inv * 128.0).astype(jnp.int32), 0, 127
    )
    code = morton3(q)
    octant = (
        (d[:, 0] > 0).astype(jnp.int32)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | ((d[:, 2] > 0).astype(jnp.int32) << 2)
    )
    key = (code << 3) | octant
    return jnp.where(active, key, jnp.int32(1 << 26))
