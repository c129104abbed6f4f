"""8-wide distance-ordered packet traversal (ops/wide_bvh.py) vs the XLA
skip-link walk (interpret mode — semantics; on-chip behavior is covered by
tests/test_tpu_kernels.py in the bench environment)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jet_pbrt_tpu.ops.bvh import (
    build_bvh, build_box_bvh, pack_node_table, intersect_bvh,
    intersect_instances,
)
from jet_pbrt_tpu.ops import wide_bvh as W


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
def single_tables():
    tris = _random_mesh(3)
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    leaf = 4
    bvh, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    nodes = pack_node_table(bvh, len(order), leaf)
    wb, wm, wt, wi, n_wide, root = W.wide_tables(bvh, mt, leaf)
    return dict(nodes=jnp.asarray(nodes), tris=jnp.asarray(mt),
                wb=jnp.asarray(wb), wm=jnp.asarray(wm), wt=jnp.asarray(wt),
                wi=jnp.asarray(wi), leaf=leaf, n_tris=mt.shape[0])


def test_collapse_structure(single_tables):
    wm = np.asarray(single_tables["wm"]).reshape(-1, W.WIDTH)
    # push templates: -1 = empty; internal children have no instance
    # override (bits 26+) and an entry code below LEAF_BIT
    nonempty = wm != -1
    ecode = wm & W.ENTRY_MASK
    internal = nonempty & (wm >> 26 == 0) & (ecode < W.LEAF_BIT)
    assert ecode[internal].max() < wm.shape[0]
    used = nonempty.sum(1)
    # padded slots are empty; real rows have at least two children
    assert (used[0] >= 2) and used.max() <= W.WIDTH


def test_wide_matches_xla_single(single_tables):
    s = single_tables
    n = 2 * W.TILE + 17   # exercise padding
    o, d, tmin, tmax = _rays(1, n)
    h_w = W.intersect_wide(s["wm"], s["wb"], s["wt"], s["wi"], s["n_tris"],
                           o, d, tmin, tmax, leaf_size=s["leaf"],
                           interpret=True)
    h_x = intersect_bvh(s["nodes"], s["tris"], o, d, tmin, tmax,
                        leaf_size=s["leaf"])
    assert np.array_equal(np.asarray(h_w.valid), np.asarray(h_x.valid))
    assert np.asarray(h_w.valid).sum() > 20
    ok = np.asarray(h_w.valid)
    np.testing.assert_allclose(np.asarray(h_w.t)[ok], np.asarray(h_x.t)[ok],
                               rtol=1e-5, atol=1e-4)
    assert np.array_equal(np.asarray(h_w.index)[ok],
                          np.asarray(h_x.index)[ok])


def test_wide_any_hit(single_tables):
    s = single_tables
    n = W.TILE
    o, d, tmin, tmax = _rays(2, n)
    h_w = W.intersect_wide(s["wm"], s["wb"], s["wt"], s["wi"], s["n_tris"],
                           o, d, tmin, tmax, leaf_size=s["leaf"],
                           any_hit=True, interpret=True)
    h_x = intersect_bvh(s["nodes"], s["tris"], o, d, tmin, tmax,
                        leaf_size=s["leaf"])
    assert np.array_equal(np.asarray(h_w.valid), np.asarray(h_x.valid))


def test_wide_any_hit_finite_tmax(single_tables):
    """Shadow-ray semantics: geometry BEYOND tmax must not occlude.

    Regression for the r3 any-hit bug where the per-triangle accept lost the
    world-distance cap, so a finite-tmax ray was falsely occluded by any
    triangle in a leaf whose box straddles tmax (ADVICE r3 high)."""
    s = single_tables
    n = W.TILE
    o, d, tmin, tmax_inf = _rays(7, n)
    # closest-hit distances (reference oracle)
    h_x = intersect_bvh(s["nodes"], s["tris"], o, d, tmin, tmax_inf,
                        leaf_size=s["leaf"])
    t_ref = np.asarray(h_x.t)
    valid = np.asarray(h_x.valid)
    # set tmax to 90% of the closest hit: NOTHING should occlude
    tmax_short = jnp.where(jnp.asarray(valid),
                           jnp.asarray(t_ref) * 0.9, 0.5)
    h_w = W.intersect_wide(s["wm"], s["wb"], s["wt"], s["wi"], s["n_tris"],
                           o, d, tmin, tmax_short, leaf_size=s["leaf"],
                           any_hit=True, interpret=True)
    assert not np.asarray(h_w.valid).any()
    # and with tmax at 110% of the closest hit, every valid lane occludes
    tmax_long = jnp.where(jnp.asarray(valid),
                          jnp.asarray(t_ref) * 1.1, -1.0)
    h_w2 = W.intersect_wide(s["wm"], s["wb"], s["wt"], s["wi"], s["n_tris"],
                            o, d, tmin, tmax_long, leaf_size=s["leaf"],
                            any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(h_w2.valid), valid)


def test_wide_dead_lanes(single_tables):
    """Dead lanes (tmin=inf / tmax=-1) report no hit and don't disturb
    neighbors."""
    s = single_tables
    n = W.TILE
    o, d, tmin, tmax = _rays(5, n)
    dead = np.zeros(n, bool)
    dead[::3] = True
    tmin = jnp.where(jnp.asarray(dead), jnp.inf, tmin)
    tmax = jnp.where(jnp.asarray(dead), -1.0, tmax)
    h_w = W.intersect_wide(s["wm"], s["wb"], s["wt"], s["wi"], s["n_tris"],
                           o, d, tmin, tmax, leaf_size=s["leaf"],
                           interpret=True)
    h_x = intersect_bvh(s["nodes"], s["tris"], o, d, tmin, tmax,
                        leaf_size=s["leaf"])
    assert not np.asarray(h_w.valid)[dead].any()
    assert np.array_equal(np.asarray(h_w.valid), np.asarray(h_x.valid))


@pytest.fixture(scope="module")
def inst_tables():
    tris = _random_mesh(4, t=500, spread=1.0, size=0.3)
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    leaf = 4
    blas, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    blas_nodes = pack_node_table(blas, len(order), leaf)

    inst_off = np.array([[0, 0, 0], [3, 0, 0], [0, 4, 0], [-3, -1, 2]],
                        np.float32)
    inst_scale = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    root_lo, root_hi = blas_nodes[0, :3], blas_nodes[0, 3:6]
    ib_lo = root_lo[None] * inst_scale[:, None] + inst_off
    ib_hi = root_hi[None] * inst_scale[:, None] + inst_off
    tlas, torder = build_box_bvh(ib_lo, ib_hi, leaf_size=1)
    inst_off, inst_scale = inst_off[torder], inst_scale[torder]

    wb, wm, wt, wi, n_wide, blas_root = W.wide_tables_instanced(
        tlas, blas, mt, inst_off, inst_scale, leaf)
    return dict(blas_nodes=jnp.asarray(blas_nodes), tris=jnp.asarray(mt),
                inst_off=jnp.asarray(inst_off),
                inst_scale=jnp.asarray(inst_scale),
                wb=jnp.asarray(wb), wm=jnp.asarray(wm), wt=jnp.asarray(wt),
                wi=jnp.asarray(wi), blas_root=blas_root, leaf=leaf,
                n_tris=mt.shape[0])


def test_wide_matches_xla_instanced(inst_tables):
    s = inst_tables
    rng = np.random.default_rng(7)
    n = W.TILE + 31
    targets = rng.uniform(-4, 5, (n, 3)).astype(np.float32)
    o = (np.array([[0.0, 0.0, 10.0]], np.float32)
         + rng.normal(0, 2, (n, 3)).astype(np.float32))
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), jnp.inf)

    h_x = intersect_instances(s["inst_off"], s["inst_scale"],
                              s["blas_nodes"], s["tris"],
                              jnp.asarray(o), jnp.asarray(d), tmin, tmax,
                              leaf_size=s["leaf"])
    h_w = W.intersect_wide(s["wm"], s["wb"], s["wt"], s["wi"], s["n_tris"],
                           jnp.asarray(o), jnp.asarray(d), tmin, tmax,
                           leaf_size=s["leaf"], blas_root=s["blas_root"],
                           has_inst=True, interpret=True)
    va = np.asarray(h_x.valid)
    assert va.sum() > 50
    assert np.array_equal(va, np.asarray(h_w.valid))
    np.testing.assert_allclose(np.asarray(h_w.t)[va], np.asarray(h_x.t)[va],
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(h_w.index)[va],
                          np.asarray(h_x.index)[va])


def test_fits_vmem_gate():
    assert W.fits_vmem(5_000, 280_000)   # ~300k-tri mesh
    assert not W.fits_vmem(20_000, 280_000)   # meta exceeds SMEM budget
    assert not W.fits_vmem(2_000_000, 2_000_000)
