"""Intersection-kernel tests against analytic cases (math of reference
src/shape.h intersectors)."""
import numpy as np
import jax.numpy as jnp

from jet_pbrt_tpu.ops import intersect as I


def rays(o_list, d_list):
    o = jnp.asarray(o_list, jnp.float32)
    d = jnp.asarray(d_list, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    n = o.shape[0]
    return o, d, jnp.full((n,), 1e-3), jnp.full((n,), jnp.inf)


def test_triangle_hit_miss():
    p0 = jnp.asarray([[0, 0, 0]], jnp.float32)
    p1 = jnp.asarray([[1, 0, 0]], jnp.float32)
    p2 = jnp.asarray([[0, 1, 0]], jnp.float32)
    o, d, tmin, tmax = rays(
        [[0.2, 0.2, -1], [0.9, 0.9, -1], [0.2, 0.2, -1]],
        [[0, 0, 1], [0, 0, 1], [0, 0, -1]],
    )
    h = I.intersect_triangles(o, d, tmin, tmax, p0, p1, p2)
    assert bool(h.valid[0]) and abs(float(h.t[0]) - 1.0) < 1e-5
    assert not bool(h.valid[1])   # outside the triangle
    assert not bool(h.valid[2])   # wrong direction


def test_triangle_closest_of_two():
    p0 = jnp.asarray([[0, 0, 0], [0, 0, 2]], jnp.float32)
    p1 = jnp.asarray([[1, 0, 0], [1, 0, 2]], jnp.float32)
    p2 = jnp.asarray([[0, 1, 0], [0, 1, 2]], jnp.float32)
    o, d, tmin, tmax = rays([[0.2, 0.2, -1]], [[0, 0, 1]])
    h = I.intersect_triangles(o, d, tmin, tmax, p0, p1, p2)
    assert int(h.index[0]) == 0 and abs(float(h.t[0]) - 1.0) < 1e-5


def test_sphere_roots():
    c = jnp.asarray([[0, 0, 0]], jnp.float32)
    r = jnp.asarray([1.0], jnp.float32)
    o, d, tmin, tmax = rays(
        [[0, 0, -3], [0, 0, 0], [0, 2, -3]],
        [[0, 0, 1], [0, 0, 1], [0, 0, 1]],
    )
    h = I.intersect_spheres(o, d, tmin, tmax, c, r)
    assert abs(float(h.t[0]) - 2.0) < 1e-5       # outside: near root
    assert abs(float(h.t[1]) - 1.0) < 1e-5       # inside: far root
    assert not bool(h.valid[2])                  # miss


def test_sphere_respects_tmax():
    c = jnp.asarray([[0, 0, 0]], jnp.float32)
    r = jnp.asarray([1.0], jnp.float32)
    o = jnp.asarray([[0, 0, -3]], jnp.float32)
    d = jnp.asarray([[0, 0, 1]], jnp.float32)
    h = I.intersect_spheres(o, d, jnp.asarray([1e-3]), jnp.asarray([1.5]), c, r)
    assert not bool(h.valid[0])


def test_rect_hit_and_normal_faces_ray():
    # unit square in xy plane at z=0, canonical normal +z
    q0 = jnp.asarray([[0, 0, 0]], jnp.float32)
    q1 = jnp.asarray([[1, 0, 0]], jnp.float32)
    q2 = jnp.asarray([[1, 1, 0]], jnp.float32)
    q3 = jnp.asarray([[0, 1, 0]], jnp.float32)
    n = jnp.asarray([[0, 0, 1]], jnp.float32)
    o, d, tmin, tmax = rays(
        [[0.5, 0.5, 2], [0.5, 0.5, -2], [1.5, 0.5, 2]],
        [[0, 0, -1], [0, 0, 1], [0, 0, -1]],
    )
    h = I.intersect_rects(o, d, tmin, tmax, q0, q1, q2, q3, n)
    assert bool(h.valid[0]) and abs(float(h.t[0]) - 2.0) < 1e-5
    assert bool(h.valid[1])
    assert not bool(h.valid[2])
    # hit normal flips toward the ray (reference: src/shape.h:427)
    nh0 = I.rect_hit_normal(n[h.index[0:1]], d[0:1])
    nh1 = I.rect_hit_normal(n[h.index[1:2]], d[1:2])
    assert float(nh0[0, 2]) == 1.0
    assert float(nh1[0, 2]) == -1.0


def test_disk():
    c = jnp.asarray([[0, 0, 0]], jnp.float32)
    n = jnp.asarray([[0, 0, 1]], jnp.float32)
    r = jnp.asarray([0.5], jnp.float32)
    o, d, tmin, tmax = rays(
        [[0.3, 0, 1], [0.6, 0, 1]], [[0, 0, -1], [0, 0, -1]]
    )
    h = I.intersect_disks(o, d, tmin, tmax, c, n, r)
    assert bool(h.valid[0]) and abs(float(h.t[0]) - 1.0) < 1e-5
    assert not bool(h.valid[1])


def test_merge_hits_picks_closest():
    h1 = I.KindHit(
        t=jnp.asarray([2.0, jnp.inf]), index=jnp.asarray([0, 0], jnp.int32),
        valid=jnp.asarray([True, False]),
    )
    h2 = I.KindHit(
        t=jnp.asarray([1.0, 3.0]), index=jnp.asarray([5, 6], jnp.int32),
        valid=jnp.asarray([True, True]),
    )
    t, kind, idx, valid = I.merge_hits([h1, h2], [0, 1])
    assert float(t[0]) == 1.0 and int(kind[0]) == 1 and int(idx[0]) == 5
    assert float(t[1]) == 3.0 and int(kind[1]) == 1
    assert bool(valid[0]) and bool(valid[1])


def test_triangle_normals():
    p0 = jnp.asarray([[0, 0, 0]], jnp.float32)
    p1 = jnp.asarray([[1, 0, 0]], jnp.float32)
    p2 = jnp.asarray([[0, 1, 0]], jnp.float32)
    n = I.triangle_normal(p0, p1, p2)
    assert np.allclose(np.asarray(n), [[0, 0, 1]], atol=1e-6)
    nf = I.triangle_normal(p0, p1, p2, flip=jnp.asarray([True]))
    assert np.allclose(np.asarray(nf), [[0, 0, -1]], atol=1e-6)
