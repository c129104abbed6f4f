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


def ray_sort_key(active, o, d, world_lo, world_inv,
                 needs_bvh=None) -> jnp.ndarray:
    """Sort key per lane: (dead, [no-BVH-work], origin Morton, octant).

    world_lo: [3] scene AABB min; world_inv: [3] 1/extent. Dead lanes get
    the largest keys so live rays pack densely at the front of the wave.

    needs_bvh: optional [N] bool — live lanes whose ray cannot touch any
    BVH root sphere sort BEHIND the ones that can, so the (expensive)
    traversal packets stay dense and the rest retire on the kernel's
    per-packet root pre-test. See bvh_needed().

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
    if needs_bvh is not None:
        key = key | jnp.where(needs_bvh, 0, jnp.int32(1 << 25))
    return jnp.where(active, key, jnp.int32(1 << 26))


def bvh_needed(meta, pack, o, d, tmin, tmax) -> jnp.ndarray:
    """[N] bool: could the ray segment touch ANY BVH root sphere?

    A ~30-flop/lane/instance dense pre-test (XLA elementwise, no kernel)
    that feeds the sort keys: most bounce/shadow rays in an instanced
    scene miss every instance, and packing the misses together turns
    whole 128-ray packets into one-root-test exits inside the sweep
    kernel. Conservative: padding-radius slack over-includes only."""
    n = o.shape[0]
    need = jnp.zeros((n,), bool)

    def seg_hits_sphere(c, r):
        oc = c[None, :] - o
        tc = jnp.sum(oc * d, axis=-1)
        m2 = jnp.sum(oc * oc, axis=-1) - tc * tc
        return ((m2 <= r * r * 1.0001 + 1e-5)
                & (tc + r >= tmin) & (tc - r <= tmax) & (tmax >= tmin))

    if meta.use_bvh and meta.n_tri:
        # bvh_s_root is always a real sphere (builder computes it for every
        # mesh regardless of traversal route)
        root = pack.bvh_s_root
        need = need | seg_hits_sphere(root[0:3], root[5])
    for mi in range(len(meta.n_inst)):
        root = pack.inst_s_root[mi]
        c_l = root[0:3]
        r_l = root[5]
        for i in range(meta.n_inst[mi]):
            c = c_l * pack.inst_scale[mi][i] + pack.inst_off[mi][i]
            need = need | seg_hits_sphere(
                c, r_l * pack.inst_scale[mi][i])
    return need


def shadow_sort_key(meta, pack, alive, o, d, tmin, tmax) -> jnp.ndarray:
    """Shadow-batch key: (dead, no-BVH-work, direction octant, origin
    Morton) — octant-major works better than origin-major for shadow
    bundles, whose origins are already coherent from the parent sort."""
    need = bvh_needed(meta, pack, o, d, tmin, tmax)
    octant = (
        (d[:, 0] > 0).astype(jnp.int32)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | ((d[:, 2] > 0).astype(jnp.int32) << 2)
    )
    world_lo = pack.world_center - pack.world_radius
    world_inv = 1.0 / jnp.maximum(2.0 * pack.world_radius, 1e-12)
    q = jnp.clip(((o - world_lo) * world_inv * 128.0).astype(jnp.int32),
                 0, 127)
    code = morton3(q)
    key = code | (octant << 21) | jnp.where(need, 0, jnp.int32(1 << 24))
    return jnp.where(alive, key, jnp.int32(1 << 30))
