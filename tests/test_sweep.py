"""MXU cull-sweep intersection (ops/sweep_bvh.py) vs the XLA skip-link walk
(interpret mode — semantics; on-chip behavior covered by
tests/test_tpu_kernels.py in the bench environment)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jet_pbrt_tpu.ops.bvh import (
    build_bvh, pack_node_table, intersect_bvh, intersect_instances,
    build_box_bvh,
)
from jet_pbrt_tpu.ops import sweep_bvh as S


def _random_mesh(seed, t=800, spread=10.0, size=0.8):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (t, 1, 3)).astype(np.float32)
    return base + rng.uniform(-size, size, (t, 3, 3)).astype(np.float32)


def _rays(seed, n, origin=(0.0, 0.0, 12.0), jitter=0.0):
    rng = np.random.default_rng(seed)
    o = np.asarray(origin, np.float32)[None] + rng.normal(
        0, jitter, (n, 3)
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-3, jnp.float32),
            jnp.full((n,), jnp.inf, jnp.float32))


@pytest.fixture(scope="module")
def tables():
    tris = _random_mesh(3)
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    leaf = 16
    bvh, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    nodes = pack_node_table(bvh, len(order), leaf)
    bw, sph, root, n_groups = S.build_sweep_tables(mt)
    return dict(nodes=jnp.asarray(nodes), tris=jnp.asarray(mt),
                bw=jnp.asarray(bw), sph=jnp.asarray(sph),
                root=jnp.asarray(root), n_groups=n_groups,
                inst=jnp.asarray(S.flat_inst(
                    np.zeros((0, 3), np.float32), np.zeros(0, np.float32))),
                leaf=leaf, n_tris=mt.shape[0])


def test_sweep_matches_xla(tables):
    s = tables
    n = 2 * S.RAYS + 17   # exercise padding
    o, d, tmin, tmax = _rays(1, n)
    h_s = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                            s["n_tris"], s["n_groups"], o, d, tmin, tmax,
                            interpret=True)
    h_x = intersect_bvh(s["nodes"], s["tris"], o, d, tmin, tmax,
                        leaf_size=s["leaf"])
    assert np.array_equal(np.asarray(h_s.valid), np.asarray(h_x.valid))
    assert np.asarray(h_s.valid).sum() > 20
    ok = np.asarray(h_s.valid)
    np.testing.assert_allclose(np.asarray(h_s.t)[ok],
                               np.asarray(h_x.t)[ok], rtol=1e-4, atol=1e-3)
    # Baldwin-Weber vs Moller-Trumbore rounding could in principle flip a
    # near-tie, but on this mesh the closest triangle is unambiguous
    assert np.array_equal(np.asarray(h_s.index)[ok],
                          np.asarray(h_x.index)[ok])


def test_sweep_any_hit_finite_tmax(tables):
    """Shadow semantics: geometry beyond tmax must not occlude; geometry
    before it must."""
    s = tables
    n = S.RAYS
    o, d, tmin, tmax_inf = _rays(7, n)
    h_x = intersect_bvh(s["nodes"], s["tris"], o, d, tmin, tmax_inf,
                        leaf_size=s["leaf"])
    t_ref = np.asarray(h_x.t)
    valid = np.asarray(h_x.valid)
    tmax_short = jnp.where(jnp.asarray(valid),
                           jnp.asarray(t_ref) * 0.9, 0.5)
    h_s = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                            s["n_tris"], s["n_groups"], o, d, tmin,
                            tmax_short, any_hit=True, interpret=True)
    assert not np.asarray(h_s.valid).any()
    tmax_long = jnp.where(jnp.asarray(valid),
                          jnp.asarray(t_ref) * 1.1, -1.0)
    h_s2 = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                             s["n_tris"], s["n_groups"], o, d, tmin,
                             tmax_long, any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(h_s2.valid), valid)


def test_sweep_dead_lanes(tables):
    s = tables
    n = S.RAYS
    o, d, tmin, tmax = _rays(5, n)
    dead = np.zeros(n, bool)
    dead[::3] = True
    tmin2 = jnp.where(jnp.asarray(dead), jnp.inf, tmin)
    tmax2 = jnp.where(jnp.asarray(dead), -1.0, tmax)
    h_s = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                            s["n_tris"], s["n_groups"], o, d, tmin2, tmax2,
                            interpret=True)
    h_ref = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                              s["n_tris"], s["n_groups"], o, d, tmin, tmax,
                              interpret=True)
    v = np.asarray(h_s.valid)
    assert not v[dead].any()
    live = ~dead
    assert np.array_equal(v[live], np.asarray(h_ref.valid)[live])
    np.testing.assert_allclose(np.asarray(h_s.t)[live & v],
                               np.asarray(h_ref.t)[live & v], rtol=1e-6)


def test_sweep_instanced(tables):
    """4 instances vs the XLA two-level walk."""
    tris = _random_mesh(11, t=500)
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    leaf = 16
    blas, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    blas_nodes = pack_node_table(blas, len(order), leaf)
    off = np.array([[0, 0, 0], [25, 0, 0], [0, 25, 0], [25, 25, 0]],
                   np.float32)
    scale = np.array([1.0, 0.5, 2.0, 1.5], np.float32)
    bw, sph, root, n_groups = S.build_sweep_tables(mt)
    inst = S.flat_inst(off, scale)

    n = 3 * S.RAYS
    o, d, tmin, tmax = _rays(2, n, origin=(12.0, 12.0, 30.0))
    h_s = S.intersect_sweep(jnp.asarray(sph), jnp.asarray(bw),
                            jnp.asarray(inst), jnp.asarray(root),
                            mt.shape[0], n_groups, o, d, tmin, tmax,
                            n_inst=4, interpret=True)
    h_x = intersect_instances(
        jnp.asarray(off), jnp.asarray(scale),
        jnp.asarray(blas_nodes), jnp.asarray(mt), o, d, tmin, tmax,
        leaf_size=leaf)
    assert np.array_equal(np.asarray(h_s.valid), np.asarray(h_x.valid))
    assert np.asarray(h_s.valid).sum() > 20
    ok = np.asarray(h_s.valid)
    np.testing.assert_allclose(np.asarray(h_s.t)[ok],
                               np.asarray(h_x.t)[ok], rtol=1e-4, atol=1e-3)
    # instance attribution must agree (index // n_tris)
    assert np.array_equal(np.asarray(h_s.index)[ok] // mt.shape[0],
                          np.asarray(h_x.index)[ok] // mt.shape[0])


def test_sweep_streamed_matches_resident(tables):
    """HBM-streamed mode (per-group DMA of the BW table) returns exactly
    the resident-VMEM results."""
    s = tables
    n = S.RAYS + 40
    o, d, tmin, tmax = _rays(9, n)
    h_r = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                            s["n_tris"], s["n_groups"], o, d, tmin, tmax,
                            interpret=True, stream_bw=False)
    h_s = S.intersect_sweep(s["sph"], s["bw"], s["inst"], s["root"],
                            s["n_tris"], s["n_groups"], o, d, tmin, tmax,
                            interpret=True, stream_bw=True)
    assert np.array_equal(np.asarray(h_s.valid), np.asarray(h_r.valid))
    ok = np.asarray(h_s.valid)
    np.testing.assert_array_equal(np.asarray(h_s.t)[ok],
                                  np.asarray(h_r.t)[ok])
    np.testing.assert_array_equal(np.asarray(h_s.index)[ok],
                                  np.asarray(h_r.index)[ok])
