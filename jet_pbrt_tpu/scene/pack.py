"""ScenePack: the whole scene as a pytree of packed SoA device arrays.

TPU-native replacement for the reference's FScene registry of shared_ptr
object graphs (reference: src/scene.h:130-143) and FPrimitive
{shape*, material*, arealight*} triples (reference: src/primitive.h:20-64).
A primitive here is a row: geometry arrays carry parallel `*_mat` and
`*_light` int32 columns (light = -1 when not emissive), and "virtual
dispatch" is a static Python loop over the (small, host-known) set of shape
kinds plus per-lane selects.

Static facts about the scene (array sizes, light descriptors) live in
`SceneMeta`, a hashable dataclass passed as a static jit argument; everything
numeric — including every differentiable parameter (material colors,
roughness, light radiance) — lives in `ScenePack`, a pytree of jnp arrays.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from ..ops import intersect as isect_ops
from ..ops.linalg import dot, normalize, RAY_EPS
from ..ops.intersect import KindHit

KIND_TRI = 0
KIND_SPHERE = 1
KIND_RECT = 2
KIND_DISK = 3

LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1
LIGHT_AREA = 2
LIGHT_ENV = 3


@dataclasses.dataclass(frozen=True)
class LightMeta:
    """Static description of one light (its kind and, for area lights, which
    shape row it wraps). Radiance/intensity values live in ScenePack.light_c
    so they stay differentiable."""
    kind: int
    shape_kind: int = -1
    shape_idx: int = -1


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    name: str
    n_tri: int
    n_sph: int
    n_rect: int
    n_disk: int
    n_mat: int
    lights: tuple  # tuple[LightMeta, ...]
    use_bvh: bool = False

    @property
    def n_lights(self) -> int:
        return len(self.lights)

    @property
    def env_light_indices(self) -> tuple:
        return tuple(
            i for i, l in enumerate(self.lights) if l.kind == LIGHT_ENV
        )


class ScenePack(NamedTuple):
    # triangles
    tri_p0: jnp.ndarray     # [T,3]
    tri_p1: jnp.ndarray
    tri_p2: jnp.ndarray
    tri_n: jnp.ndarray      # [T,3] fixed face normal (reference: src/shape.h:284-286)
    tri_mat: jnp.ndarray    # [T] int32
    tri_light: jnp.ndarray  # [T] int32, -1 = not emissive
    # spheres
    sph_c: jnp.ndarray      # [S,3]
    sph_r: jnp.ndarray      # [S]
    sph_mat: jnp.ndarray
    sph_light: jnp.ndarray
    # rectangles (convex quads, corners in loop order p0..p3)
    rect_q: jnp.ndarray     # [R,4,3]
    rect_n: jnp.ndarray     # [R,3] canonical normal
    rect_mat: jnp.ndarray
    rect_light: jnp.ndarray
    # disks
    disk_c: jnp.ndarray     # [D,3]
    disk_n: jnp.ndarray     # [D,3]
    disk_r: jnp.ndarray     # [D]
    disk_mat: jnp.ndarray
    disk_light: jnp.ndarray
    # material table (reference: src/material.h; kinds in ops/bsdf.py)
    mat_kind: jnp.ndarray   # [M] int32
    mat_c0: jnp.ndarray     # [M,3]
    mat_c1: jnp.ndarray     # [M,3]
    mat_s0: jnp.ndarray     # [M]
    mat_s1: jnp.ndarray     # [M]
    mat_remap: jnp.ndarray  # [M] bool
    # light parameter table (kinds are static, in SceneMeta.lights)
    light_c: jnp.ndarray    # [L,3] radiance / intensity / irradiance
    light_pos: jnp.ndarray  # [L,3]
    light_dir: jnp.ndarray  # [L,3]
    # world bounding sphere (reference: src/scene.cc:35-45, light Preprocess)
    world_center: jnp.ndarray  # [3]
    world_radius: jnp.ndarray  # []
    # flattened skip-link BVH over triangles (empty when meta.use_bvh=False)
    bvh_bmin: jnp.ndarray       # [B,3]
    bvh_bmax: jnp.ndarray       # [B,3]
    bvh_miss: jnp.ndarray       # [B] int32 skip link (node idx or B = done)
    bvh_leaf_first: jnp.ndarray  # [B] int32 first tri slot, -1 for inner nodes
    bvh_leaf_count: jnp.ndarray  # [B] int32


class Hit(NamedTuple):
    """Batched FIntersection (reference: src/shape.h:33-77)."""
    valid: jnp.ndarray     # [N] bool
    t: jnp.ndarray         # [N]
    position: jnp.ndarray  # [N,3]
    normal: jnp.ndarray    # [N,3] geometric normal per reference semantics
    wo: jnp.ndarray        # [N,3] world-space -ray.dir
    mat_id: jnp.ndarray    # [N] int32 (0 when invalid — callers mask)
    light_id: jnp.ndarray  # [N] int32, -1 = not an emitter


def _kind_hits(meta: SceneMeta, pack: ScenePack, o, d, tmin, tmax):
    """Closest hit per shape kind; only kinds present in the scene are
    traced (static dispatch — array sizes are trace-time constants)."""
    hits, kinds = [], []
    if meta.n_tri:
        if meta.use_bvh:
            from ..ops import bvh as bvh_ops
            hits.append(bvh_ops.intersect_bvh(pack, o, d, tmin, tmax))
        else:
            hits.append(
                isect_ops.intersect_triangles(
                    o, d, tmin, tmax, pack.tri_p0, pack.tri_p1, pack.tri_p2
                )
            )
        kinds.append(KIND_TRI)
    if meta.n_sph:
        hits.append(
            isect_ops.intersect_spheres(o, d, tmin, tmax, pack.sph_c, pack.sph_r)
        )
        kinds.append(KIND_SPHERE)
    if meta.n_rect:
        q = pack.rect_q
        hits.append(
            isect_ops.intersect_rects(
                o, d, tmin, tmax, q[:, 0], q[:, 1], q[:, 2], q[:, 3], pack.rect_n
            )
        )
        kinds.append(KIND_RECT)
    if meta.n_disk:
        hits.append(
            isect_ops.intersect_disks(
                o, d, tmin, tmax, pack.disk_c, pack.disk_n, pack.disk_r
            )
        )
        kinds.append(KIND_DISK)
    return hits, kinds


def intersect(meta: SceneMeta, pack: ScenePack, o, d, tmin, tmax) -> Hit:
    """Closest-hit over the whole scene (reference: src/scene.cc:25-33)."""
    n = o.shape[0]
    hits, kinds = _kind_hits(meta, pack, o, d, tmin, tmax)
    if not hits:
        z3 = jnp.zeros((n, 3), jnp.float32)
        return Hit(
            valid=jnp.zeros((n,), bool), t=jnp.full((n,), jnp.inf),
            position=z3, normal=z3, wo=-d,
            mat_id=jnp.zeros((n,), jnp.int32),
            light_id=jnp.full((n,), -1, jnp.int32),
        )

    t, kind, index, valid = isect_ops.merge_hits(hits, kinds)
    t_safe = jnp.where(valid, t, 1.0)
    p = o + t_safe[:, None] * d

    normal = jnp.zeros((n, 3), jnp.float32)
    mat_id = jnp.zeros((n,), jnp.int32)
    light_id = jnp.full((n,), -1, jnp.int32)
    for k in kinds:
        sel = kind == k
        sel3 = sel[:, None]
        if k == KIND_TRI:
            nk = pack.tri_n[index]
            mk, lk = pack.tri_mat[index], pack.tri_light[index]
        elif k == KIND_SPHERE:
            # outward normal (reference: src/shape.h:520)
            nk = normalize(p - pack.sph_c[index])
            mk, lk = pack.sph_mat[index], pack.sph_light[index]
        elif k == KIND_RECT:
            # rect normals face the ray (reference: src/shape.h:427)
            nk = isect_ops.rect_hit_normal(pack.rect_n[index], d)
            mk, lk = pack.rect_mat[index], pack.rect_light[index]
        else:
            nk = pack.disk_n[index]
            mk, lk = pack.disk_mat[index], pack.disk_light[index]
        normal = jnp.where(sel3, nk, normal)
        mat_id = jnp.where(sel, mk, mat_id)
        light_id = jnp.where(sel, lk, light_id)

    return Hit(
        valid=valid,
        t=t,
        position=p,
        normal=normal,
        wo=-d,
        mat_id=jnp.where(valid, mat_id, 0),
        light_id=jnp.where(valid, light_id, -1),
    )


def occluded(meta: SceneMeta, pack: ScenePack, p_from, p_to) -> jnp.ndarray:
    """Visibility between two points, ray range [eps, dist-eps]
    (reference: src/scene.h:36-52). Any hit in range occludes; unlike the
    reference — which runs a full closest-hit trace — we only need the
    validity bit, and XLA dead-code-eliminates the attribute work."""
    delta = p_to - p_from
    dist = jnp.sqrt(jnp.maximum(dot(delta, delta), 1e-20))
    d = delta / dist[:, None]
    tmin = jnp.full_like(dist, RAY_EPS)
    tmax = dist - RAY_EPS
    hits, kinds = _kind_hits(meta, pack, p_from, d, tmin, tmax)
    if not hits:
        return jnp.zeros(dist.shape, bool)
    occ = hits[0].valid
    for h in hits[1:]:
        occ = occ | h.valid
    return occ


def emitted(pack: ScenePack, hit: Hit) -> jnp.ndarray:
    """Le at a hit point: one-sided area-light emission
    (reference: src/primitive.h:60-63, src/light.h:234-238)."""
    is_emitter = hit.light_id >= 0
    lid = jnp.maximum(hit.light_id, 0)
    radiance = pack.light_c[lid]
    facing = dot(hit.normal, hit.wo) > 0.0
    return jnp.where(
        (is_emitter & facing & hit.valid)[:, None], radiance, 0.0
    )


def light_is_delta(meta: SceneMeta, light_index: int) -> bool:
    """Static is_delta_light (reference: src/light.h:25-28)."""
    return meta.lights[light_index].kind in (LIGHT_POINT, LIGHT_DIRECTIONAL)


def gather_material(pack: ScenePack, mat_id):
    """Gather material rows for a ray batch."""
    return (
        pack.mat_kind[mat_id],
        pack.mat_c0[mat_id],
        pack.mat_c1[mat_id],
        pack.mat_s0[mat_id],
        pack.mat_s1[mat_id],
        pack.mat_remap[mat_id],
    )
