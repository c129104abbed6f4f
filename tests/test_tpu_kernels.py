"""On-chip (non-interpret) Pallas cull-sweep regression tests.

These run the REAL pltpu lowering at bunny scale and assert parity with the
XLA skip-link walk — the class of bug they pin down is on-chip-only
numerics/control-flow divergence that interpret-mode tests
(tests/test_sweep.py) cannot see. They skip unless JAX has a real TPU
backend; run them in the bench environment with:

    JET_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

(JET_TPU_TESTS=1 tells conftest.py not to force the virtual CPU mesh.)
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-chip Pallas regression needs a real TPU backend",
)

from jet_pbrt_tpu.ops.bvh import (   # noqa: E402
    build_bvh, pack_node_table, intersect_bvh, intersect_instances,
)
from jet_pbrt_tpu.ops import sweep_bvh as S   # noqa: E402


def _bunny_mt(leaf=16):
    from jet_pbrt_tpu.scene import objio
    from jet_pbrt_tpu.scene.scenes import ASSET_DIR

    path = os.path.join(ASSET_DIR, "bunny.obj")
    if not os.path.exists(path):
        from jet_pbrt_tpu.scene.assets import generate_bunny_obj
        os.makedirs(os.path.dirname(path), exist_ok=True)
        generate_bunny_obj(path)
    tris, _ = objio.load_obj(path)
    tris = np.asarray(tris, np.float32)
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    bvh, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    nodes = pack_node_table(bvh, len(order), leaf)
    return mt, nodes, leaf


def _mixed_rays(n, lookfrom=(-0.6, 0.8, -0.6), seed=0):
    """Half coherent rays toward the mesh body, half scrambled/jittered —
    the incoherent half is what historically broke on-chip. Targets span
    the generated bunny's local bbox (~x,z in +-0.09, y in [0, 0.18])."""
    rng = np.random.default_rng(seed)
    o = np.asarray(lookfrom, np.float32)[None].repeat(n, 0)
    targets = rng.uniform(-0.08, 0.08, (n, 3)).astype(np.float32)
    targets[:, 1] = rng.uniform(0.02, 0.17, n).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    half = n // 2
    d[half:] += 0.5 * rng.normal(size=(n - half, 3)).astype(np.float32)
    d[half:] /= np.linalg.norm(d[half:], axis=1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-4, jnp.float32),
            jnp.full((n,), jnp.inf, jnp.float32))


def _mt64(o, d, row):
    """Float64 Möller-Trumbore of one ray against one (p0,e1,e2) row — the
    host-side oracle for the disagreement forensic. Returns
    (t, edge_margin) with t=inf on miss; edge_margin = min(u, v, 1-u-v),
    i.e. how far inside the triangle the hit lies (near-zero = grazing an
    edge, where f32 kernels can legitimately disagree on accept/reject)."""
    p0, e1, e2 = (np.asarray(row[0:3], np.float64),
                  np.asarray(row[3:6], np.float64),
                  np.asarray(row[6:9], np.float64))
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    pv = np.cross(d, e2)
    det = e1 @ pv
    if abs(det) < 1e-18:
        return np.inf, -np.inf
    tv = o - p0
    u = (tv @ pv) / det
    qv = np.cross(tv, e1)
    v = (d @ qv) / det
    t = (e2 @ qv) / det
    margin = min(u, v, 1.0 - u - v)
    if margin < -1e-6 or t <= 0:
        return np.inf, margin
    return t, margin


def test_onchip_sweep_matches_xla():
    """Real-kernel cull-sweep parity on the ~66k-tri bunny (local space),
    closest hit AND finite-tmax occlusion. Disagreeing lanes must be
    PROVABLE near-ties (r4 VERDICT task 4): both kernels' winning
    triangles are re-evaluated in float64 on the host, and each reported
    hit must be a genuine intersection of its own triangle whose exact
    distances differ by <= the gate tolerance — a systematic under-cull
    (sweep missing the truly nearer triangle by more than rounding) fails
    here even if the aggregate ratios pass."""
    mt, nodes, leaf = _bunny_mt()
    bw, sph, root, ng = S.build_sweep_tables(mt)
    inst = S.flat_inst(np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
    n = 16 * S.RAYS + 33
    o, d, tmin, tmax = _mixed_rays(n)
    h_s = S.intersect_sweep(jnp.asarray(sph), jnp.asarray(bw),
                            jnp.asarray(inst), jnp.asarray(root),
                            mt.shape[0], ng, o, d, tmin, tmax)
    h_x = intersect_bvh(jnp.asarray(nodes), jnp.asarray(mt), o, d,
                        tmin, tmax, leaf_size=leaf)
    assert np.array_equal(np.asarray(h_s.valid), np.asarray(h_x.valid))
    ok = np.asarray(h_s.valid)
    assert ok.sum() > 500
    ts, tx = np.asarray(h_s.t)[ok], np.asarray(h_x.t)[ok]
    # the sweep's MXU dot_generals round differently from the XLA walk's
    # elementwise MT chain: grazing edge hits can slide t or flip to the
    # co-incident neighbor on a few lanes per thousand. Tight agreement on
    # the bulk, loose bound on every lane (catches real under-culling).
    assert np.isclose(ts, tx, rtol=1e-4, atol=1e-4).mean() > 0.995
    same = np.asarray(h_s.index)[ok] == np.asarray(h_x.index)[ok]
    assert same.mean() > 0.995

    # ---- forensic on EVERY disagreeing lane (replaces the old blanket
    # rtol=2e-2 allclose, which was not a sound invariant: an f32 grazing
    # edge rejection can legitimately shift t arbitrarily far) ------------
    on = np.asarray(o)[ok]
    dn = np.asarray(d)[ok]
    is_, ix_ = np.asarray(h_s.index)[ok], np.asarray(h_x.index)[ok]
    bad = np.nonzero(~same | ~np.isclose(ts, tx, rtol=1e-4, atol=1e-4))[0]
    for j in bad:
        t_s64, m_s = _mt64(on[j], dn[j], mt[is_[j]])
        t_x64, m_x = _mt64(on[j], dn[j], mt[ix_[j]])
        # each kernel's reported hit is a real f64 intersection of its own
        # winning triangle at the t it reported
        assert np.isfinite(t_s64), (j, is_[j], ts[j])
        assert np.isfinite(t_x64), (j, ix_[j], tx[j])
        assert abs(ts[j] - t_s64) <= 1e-3 * t_s64 + 1e-4, (j, ts[j], t_s64)
        assert abs(tx[j] - t_x64) <= 1e-3 * t_x64 + 1e-4, (j, tx[j], t_x64)
        # and the disagreement itself is one of the two legitimate f32
        # classes: a genuine near-tie in distance (co-incident surfaces),
        # or the nearer hit grazes a triangle edge so closely that one
        # kernel's rounding rejected it (|barycentric margin| ~ f32 noise).
        # A systematic under-cull — missing a solidly-interior nearer
        # triangle — fails this.
        near_tie = abs(t_s64 - t_x64) <= 2e-2 * min(t_s64, t_x64) + 1e-3
        nearer_margin = m_s if t_s64 <= t_x64 else m_x
        edge_graze = abs(nearer_margin) <= 1e-3
        assert near_tie or edge_graze, (
            j, int(is_[j]), int(ix_[j]), t_s64, t_x64, nearer_margin)

    # occlusion with the light just past / just short of the hit
    t_ref = np.asarray(h_x.t)
    tmax_short = jnp.where(jnp.asarray(ok), jnp.asarray(t_ref) * 0.9, 0.1)
    h_o = S.intersect_sweep(jnp.asarray(sph), jnp.asarray(bw),
                            jnp.asarray(inst), jnp.asarray(root),
                            mt.shape[0], ng, o, d, tmin, tmax_short,
                            any_hit=True)
    assert not np.asarray(h_o.valid).any()
    tmax_long = jnp.where(jnp.asarray(ok), jnp.asarray(t_ref) * 1.1, -1.0)
    h_o2 = S.intersect_sweep(jnp.asarray(sph), jnp.asarray(bw),
                             jnp.asarray(inst), jnp.asarray(root),
                             mt.shape[0], ng, o, d, tmin, tmax_long,
                             any_hit=True)
    assert np.array_equal(np.asarray(h_o2.valid), ok)


def test_onchip_instanced_sweep_matches_xla():
    """Real-kernel instanced sweep == XLA per-instance walk at the bunny
    scene's scale (4 instances of the shared ~66k-tri BLAS)."""
    mt, blas_nodes, leaf = _bunny_mt()
    inst_off = np.array([[0, 0, 0], [-100, 0, -100], [0, 0, -100],
                         [-100, 0, 0]], np.float32)
    inst_scale = np.array([500.0, 500.0, 500.0, 500.0], np.float32)
    bw, sph, root, ng = S.build_sweep_tables(mt)
    inst = S.flat_inst(inst_off, inst_scale)

    n = 16 * S.RAYS
    o, d, tmin, tmax = _mixed_rays(n, lookfrom=(-300, 300, -300), seed=3)
    rng = np.random.default_rng(4)
    targets = rng.uniform(-150, 100, (n, 3)).astype(np.float32) * [1, 0.5, 1]
    d = jnp.asarray(targets) - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    h_x = intersect_instances(
        jnp.asarray(inst_off), jnp.asarray(inst_scale),
        jnp.asarray(blas_nodes), jnp.asarray(mt), o, d, tmin, tmax,
        leaf_size=leaf,
    )
    h_s = S.intersect_sweep(jnp.asarray(sph), jnp.asarray(bw),
                            jnp.asarray(inst), jnp.asarray(root),
                            mt.shape[0], ng, o, d, tmin, tmax, n_inst=4)
    va = np.asarray(h_x.valid)
    assert va.sum() > 500
    assert np.array_equal(va, np.asarray(h_s.valid))
    np.testing.assert_allclose(
        np.asarray(h_s.t)[va], np.asarray(h_x.t)[va], rtol=1e-4, atol=1e-3
    )
    assert np.array_equal(
        np.asarray(h_s.index)[va] // mt.shape[0],
        np.asarray(h_x.index)[va] // mt.shape[0],
    )


def test_onchip_wide_matches_xla():
    """PRODUCTION-route parity: the 8-wide packet kernel on-chip vs the XLA
    walk, bunny + 4 instances, closest hit and finite-tmax occlusion, with
    the float64 disagreement forensic (near-tie or edge-graze only)."""
    from jet_pbrt_tpu.ops import wide_bvh as W
    from jet_pbrt_tpu.ops.bvh import build_box_bvh

    mt, blas_nodes, leaf = _bunny_mt()
    inst_off = np.array([[0, 0, 0], [-100, 0, -100], [0, 0, -100],
                         [-100, 0, 0]], np.float32)
    inst_scale = np.array([500.0, 500.0, 500.0, 500.0], np.float32)
    import jet_pbrt_tpu.ops.bvh as bvh_mod
    bvh, order = bvh_mod.build_bvh(
        mt[:, 0:3], mt[:, 0:3] + mt[:, 3:6], mt[:, 0:3] + mt[:, 6:9],
        leaf_size=leaf)
    # rebuild the MT table in this build's order so indices line up
    p0 = mt[:, 0:3][order]
    p1 = (mt[:, 0:3] + mt[:, 3:6])[order]
    p2 = (mt[:, 0:3] + mt[:, 6:9])[order]
    mt2 = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    nodes2 = bvh_mod.pack_node_table(bvh, len(order), leaf)
    ib_lo = nodes2[0, :3][None] * inst_scale[:, None] + inst_off
    ib_hi = nodes2[0, 3:6][None] * inst_scale[:, None] + inst_off
    tlas, torder = build_box_bvh(ib_lo, ib_hi, leaf_size=1)
    off_p, scl_p = inst_off[torder], inst_scale[torder]
    wb, wm, wt, wi, _nw, wroot = W.wide_tables_instanced(
        tlas, bvh, mt2, off_p, scl_p, leaf)

    n = 16 * S.RAYS
    o, d, tmin, tmax = _mixed_rays(n, lookfrom=(-300, 300, -300), seed=11)
    rng = np.random.default_rng(12)
    targets = rng.uniform(-150, 100, (n, 3)).astype(np.float32) * [1, 0.5, 1]
    d = jnp.asarray(targets) - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    h_w = W.intersect_wide(jnp.asarray(wm), jnp.asarray(wb), jnp.asarray(wt),
                           jnp.asarray(wi), len(mt2), o, d, tmin, tmax,
                           leaf_size=leaf, blas_root=wroot, has_inst=True)
    h_x = intersect_instances(jnp.asarray(off_p), jnp.asarray(scl_p),
                              jnp.asarray(nodes2), jnp.asarray(mt2),
                              o, d, tmin, tmax, leaf_size=leaf)
    va = np.asarray(h_x.valid)
    assert va.sum() > 500
    assert np.array_equal(va, np.asarray(h_w.valid))
    tw, tx = np.asarray(h_w.t)[va], np.asarray(h_x.t)[va]
    assert np.isclose(tw, tx, rtol=1e-4, atol=1e-3).mean() > 0.995
    iw, ix = np.asarray(h_w.index)[va], np.asarray(h_x.index)[va]
    assert (iw == ix).mean() > 0.995
    on, dn = np.asarray(o)[va], np.asarray(d)[va]
    bad = np.nonzero((iw != ix) | ~np.isclose(tw, tx, rtol=1e-4,
                                              atol=1e-3))[0]
    for j in bad:
        # both hits genuine in their instance's local frame (f64 oracle)
        def t64(enc):
            i_, ti_ = int(enc) // len(mt2), int(enc) % len(mt2)
            o_l = (on[j] - off_p[i_]) / scl_p[i_]
            t_l, m = _mt64(o_l, dn[j], mt2[ti_])
            return t_l * scl_p[i_], m
        t_w64, m_w = t64(iw[j])
        t_x64, m_x = t64(ix[j])
        assert np.isfinite(t_w64) and np.isfinite(t_x64), (j, iw[j], ix[j])
        near_tie = abs(t_w64 - t_x64) <= 2e-2 * min(t_w64, t_x64) + 1e-2
        nearer_margin = m_w if t_w64 <= t_x64 else m_x
        assert near_tie or abs(nearer_margin) <= 1e-3, (
            j, int(iw[j]), int(ix[j]), t_w64, t_x64, nearer_margin)

    # occlusion: light just short / just past the known hit
    t_ref = np.asarray(h_x.t)
    t_safe = np.where(va, t_ref, 1.0)
    h_o = W.intersect_wide(jnp.asarray(wm), jnp.asarray(wb), jnp.asarray(wt),
                           jnp.asarray(wi), len(mt2), o, d, tmin,
                           jnp.asarray(np.where(va, t_safe * 0.98, 0.1)),
                           leaf_size=leaf, blas_root=wroot, has_inst=True,
                           any_hit=True)
    frac_occluded_short = np.asarray(h_o.valid)[va].mean()
    assert frac_occluded_short < 0.02, frac_occluded_short
    h_o2 = W.intersect_wide(jnp.asarray(wm), jnp.asarray(wb),
                            jnp.asarray(wt), jnp.asarray(wi), len(mt2),
                            o, d, tmin,
                            jnp.asarray(np.where(va, t_safe * 1.02, -1.0)),
                            leaf_size=leaf, blas_root=wroot, has_inst=True,
                            any_hit=True)
    assert np.asarray(h_o2.valid)[va].mean() > 0.98


def test_onchip_streamed_sweep_matches_resident():
    """HBM-streamed sweep (stream_bw=True) vs resident mode ON-CHIP: the
    interpret-mode bit-exactness test (tests/test_sweep.py) missed a real
    Mosaic lowering failure here for a full round — streamed DMA slices
    must be 8-sublane aligned (r5 fix: 16-row padded BW table)."""
    mt, nodes, leaf = _bunny_mt()
    bw, sph, root, ng = S.build_sweep_tables(mt)
    inst = S.flat_inst(np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
    n = 8 * S.RAYS
    o, d, tmin, tmax = _mixed_rays(n, seed=7)
    args = (jnp.asarray(sph), jnp.asarray(bw), jnp.asarray(inst),
            jnp.asarray(root), mt.shape[0], ng, o, d, tmin, tmax)
    h_r = S.intersect_sweep(*args, stream_bw=False)
    h_s = S.intersect_sweep(*args, stream_bw=True)
    assert np.array_equal(np.asarray(h_r.valid), np.asarray(h_s.valid))
    ok = np.asarray(h_r.valid)
    assert ok.sum() > 200
    np.testing.assert_array_equal(np.asarray(h_r.t)[ok],
                                  np.asarray(h_s.t)[ok])
    np.testing.assert_array_equal(np.asarray(h_r.index)[ok],
                                  np.asarray(h_s.index)[ok])


def test_onchip_bunny_render_finite():
    """One full shaded wave on-chip through whatever backend the scene pack
    selected (Pallas cull-sweep on TPU): finite, non-black — guards the
    whole compiled path, not just traversal."""
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from jet_pbrt_tpu.models.render import render

    bunny = bunny_scene(use_bvh=True)
    assert bunny.meta.wide_blas[0], (
        "bunny BLAS fits VMEM on TPU -> wide packet kernel route")
    img = np.asarray(render(bunny, 64, 64, spp=4, seed=0, max_depth=3))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
