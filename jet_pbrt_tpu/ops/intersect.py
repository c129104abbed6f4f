"""Batched ray ↔ shape intersection kernels.

TPU-native replacement for the reference's virtual FShape::Intersect scalar
methods (reference: src/shape.h:200-221 disk, 291-327 triangle, 399-435
rectangle, 487-526 sphere). Design: geometry lives in SoA device arrays, one
array family per shape kind, and each kernel intersects a whole ray batch
against a whole shape batch at once — pure VPU work with no divergence. The
reference's mutable `ray.max_t` shrinking becomes a functional min-reduction
over candidate ts.

Convention: a ray is (o, d, tmin, tmax) with d unit length; a "kind hit" is
the tuple (t, index, valid) of per-ray closest hit among shapes of that kind.
Closest-hit across kinds is a simple min-merge (see `merge_hits`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .linalg import cross, dot, normalize, RAY_EPS


class KindHit(NamedTuple):
    t: jnp.ndarray      # [N] hit distance (inf if none)
    index: jnp.ndarray  # [N] int32 index into the kind's shape arrays
    valid: jnp.ndarray  # [N] bool


NO_HIT_T = jnp.float32(jnp.inf)


def _closest(t_nm: jnp.ndarray, valid_nm: jnp.ndarray) -> KindHit:
    """Reduce [N, M] candidate hits to the per-ray closest."""
    t_masked = jnp.where(valid_nm, t_nm, NO_HIT_T)
    idx = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    t = jnp.min(t_masked, axis=1)
    return KindHit(t=t, index=idx, valid=jnp.isfinite(t))


def empty_hit(n: int) -> KindHit:
    return KindHit(
        t=jnp.full((n,), NO_HIT_T),
        index=jnp.zeros((n,), jnp.int32),
        valid=jnp.zeros((n,), bool),
    )


# ---------------------------------------------------------------------------
# Triangles — Möller-Trumbore. Mathematically equivalent hit set / t to the
# reference's SmallVCM sign-consistency test (reference: src/shape.h:291-327)
# but branch-free and it yields barycentrics for UV interpolation.
# ---------------------------------------------------------------------------

def intersect_triangles(o, d, tmin, tmax, p0, p1, p2) -> KindHit:
    """o,d: [N,3]; p0,p1,p2: [T,3]. Full [N,T] broadcast (use the BVH kernel
    for large T)."""
    e1 = (p1 - p0)[None, :, :]                     # [1,T,3]
    e2 = (p2 - p0)[None, :, :]
    dxe2 = cross(d[:, None, :], e2)                # [N,T,3]
    det = dot(e1, dxe2)                            # [N,T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[:, None, :] - p0[None, :, :]
    u = dot(tvec, dxe2) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d[:, None, :], qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin[:, None]) & (t < tmax[:, None])
    )
    return _closest(t, valid)


def triangle_normal(p0, p1, p2, flip=None) -> jnp.ndarray:
    """Face normal per triangle (reference: src/shape.h:284-286); one normal
    per face, no shading-normal interpolation — matching the reference, which
    discards loaded OBJ normals (reference: src/shape.cc:38-65)."""
    n = normalize(cross(p1 - p0, p2 - p0))
    if flip is not None:
        n = jnp.where(flip[:, None], -n, n)
    return n


# ---------------------------------------------------------------------------
# Spheres (reference: src/shape.h:487-526).
# ---------------------------------------------------------------------------

def intersect_spheres(o, d, tmin, tmax, center, radius) -> KindHit:
    """center: [S,3], radius: [S]."""
    oc = center[None, :, :] - o[:, None, :]         # [N,S,3]
    b = dot(oc, d[:, None, :])                      # [N,S]
    det = b * b - dot(oc, oc) + radius[None, :] ** 2
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t_near = b - sq
    t_far = b + sq
    in_near = (t_near > tmin[:, None]) & (t_near < tmax[:, None])
    in_far = (t_far > tmin[:, None]) & (t_far < tmax[:, None])
    t = jnp.where(in_near, t_near, t_far)
    valid = (det >= 0.0) & (in_near | in_far)
    return _closest(t, valid)


# ---------------------------------------------------------------------------
# Rectangles — convex-quad sign test, same predicate as the reference
# (reference: src/shape.h:399-435). Quad corners p0..p3 in loop order; the
# geometric normal is Cross(p1-p0, p2-p0) with optional flip at build.
# ---------------------------------------------------------------------------

def intersect_rects(o, d, tmin, tmax, q0, q1, q2, q3, n) -> KindHit:
    oa = q0[None, :, :] - o[:, None, :]
    ob = q1[None, :, :] - o[:, None, :]
    oc = q2[None, :, :] - o[:, None, :]
    od = q3[None, :, :] - o[:, None, :]
    dN = d[:, None, :]
    v0d = dot(cross(oc, ob), dN)
    v1d = dot(cross(ob, oa), dN)
    v2d = dot(cross(oa, od), dN)
    v3d = dot(cross(od, oc), dN)
    same_neg = (v0d < 0) & (v1d < 0) & (v2d < 0) & (v3d < 0)
    same_pos = (v0d >= 0) & (v1d >= 0) & (v2d >= 0) & (v3d >= 0)
    inside = same_neg | same_pos
    denom = dot(n[None, :, :], dN)
    t = jnp.where(jnp.abs(denom) > 1e-12, dot(n[None, :, :], oa) / denom, NO_HIT_T)
    valid = inside & (t > tmin[:, None]) & (t < tmax[:, None])
    return _closest(t, valid)


def rect_hit_normal(n_gathered: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Rect normals face the ray (reference: src/shape.h:427)."""
    return jnp.where(dot(n_gathered, d)[:, None] <= 0.0, n_gathered, -n_gathered)


# ---------------------------------------------------------------------------
# Disks (reference: src/shape.h:200-221). Canonical (unflipped) normal.
# ---------------------------------------------------------------------------

def intersect_disks(o, d, tmin, tmax, center, n, radius) -> KindHit:
    dN = d[:, None, :]
    denom = dot(n[None, :, :], dN)                  # [N,D]
    op = center[None, :, :] - o[:, None, :]
    t = jnp.where(jnp.abs(denom) > 1e-9, dot(n[None, :, :], op) / denom, NO_HIT_T)
    hit_p = o[:, None, :] + t[..., None] * dN
    r2 = dot(hit_p - center[None, :, :], hit_p - center[None, :, :])
    valid = (
        (jnp.abs(denom) > 1e-9)
        & (t > tmin[:, None]) & (t < tmax[:, None])
        & (r2 <= (radius[None, :] ** 2))
    )
    return _closest(t, valid)


# ---------------------------------------------------------------------------
# Merging hits across shape kinds.
# ---------------------------------------------------------------------------

def merge_hits(hits: list[KindHit], kinds: list[int]):
    """Min-merge per-kind closest hits. Returns (t, kind, index, valid)."""
    t = hits[0].t
    kind = jnp.full_like(hits[0].index, kinds[0])
    index = hits[0].index
    for h, k in zip(hits[1:], kinds[1:]):
        closer = h.t < t
        t = jnp.where(closer, h.t, t)
        kind = jnp.where(closer, k, kind)
        index = jnp.where(closer, h.index, index)
    return t, kind, index, jnp.isfinite(t)


def offset_ray_origin(p: jnp.ndarray) -> tuple[jnp.ndarray, float]:
    """Spawned rays start at the hit point with tmin = 1e-3, the reference's
    shadow epsilon (reference: src/geometry.h:395-396, src/shape.h:61-76)."""
    return p, RAY_EPS
