"""On-chip (non-interpret) Pallas wide-BVH regression tests.

These run the REAL pltpu lowering at bunny scale and assert parity with the
XLA skip-link walk — the class of bug they pin down is on-chip-only
numerics/control-flow divergence (e.g. the bf16 miss-link rounding hang,
commit 084c54d) that interpret-mode tests (tests/test_wide_bvh.py) cannot
see. They skip unless JAX has a real TPU backend; run them in the bench
environment with:

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
    build_bvh, build_box_bvh, pack_node_table, intersect_bvh,
    intersect_instances,
)
from jet_pbrt_tpu.ops import wide_bvh as W   # noqa: E402


def _single_tables(tris, leaf):
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    bvh, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    nodes = pack_node_table(bvh, len(order), leaf)
    wb, wm, wt, wi, _, _ = W.wide_tables(bvh, mt, leaf)
    return jnp.asarray(nodes), jnp.asarray(mt), (
        jnp.asarray(wb), jnp.asarray(wm), jnp.asarray(wt), jnp.asarray(wi))


def _bunny_tris():
    from jet_pbrt_tpu.scene import objio
    from jet_pbrt_tpu.scene.scenes import ASSET_DIR

    path = os.path.join(ASSET_DIR, "bunny.obj")
    if not os.path.exists(path):
        from jet_pbrt_tpu.scene.assets import generate_bunny_obj
        os.makedirs(os.path.dirname(path), exist_ok=True)
        generate_bunny_obj(path)
    tris, _ = objio.load_obj(path)
    return np.asarray(tris, np.float32)


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


def test_onchip_single_level_wide_matches_xla():
    """Real-kernel single-BVH wide traversal parity on the ~66k-tri bunny
    mesh (local space)."""
    leaf = 8
    nodes, mt, (wb, wm, wt, wi) = _single_tables(_bunny_tris(), leaf)
    n = 4 * W.TILE + 33
    o, d, tmin, tmax = _mixed_rays(n)
    h_w = W.intersect_wide(wm, wb, wt, wi, mt.shape[0], o, d, tmin, tmax,
                           leaf_size=leaf)
    h_x = intersect_bvh(nodes, mt, o, d, tmin, tmax, leaf_size=leaf)
    assert np.array_equal(np.asarray(h_w.valid), np.asarray(h_x.valid))
    ok = np.asarray(h_w.valid)
    assert ok.sum() > 500
    np.testing.assert_allclose(
        np.asarray(h_w.t)[ok], np.asarray(h_x.t)[ok], rtol=1e-4, atol=1e-4
    )
    assert np.array_equal(
        np.asarray(h_w.index)[ok], np.asarray(h_x.index)[ok]
    )


def test_onchip_instanced_wide_matches_xla():
    """Real-kernel merged TLAS/BLAS wide traversal == XLA per-instance walk
    at the bunny scene's scale (4 instances of the shared ~66k-tri BLAS)."""
    leaf = 8
    tris = _bunny_tris()
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    blas, order = build_bvh(p0, p1, p2, leaf_size=leaf)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    blas_nodes = pack_node_table(blas, len(order), leaf)

    inst_off = np.array([[0, 0, 0], [-100, 0, -100], [0, 0, -100],
                         [-100, 0, 0]], np.float32)
    inst_scale = np.array([500.0, 500.0, 500.0, 500.0], np.float32)
    root_lo, root_hi = blas_nodes[0, :3], blas_nodes[0, 3:6]
    ib_lo = root_lo[None] * inst_scale[:, None] + inst_off
    ib_hi = root_hi[None] * inst_scale[:, None] + inst_off
    tlas, torder = build_box_bvh(ib_lo, ib_hi, leaf_size=1)
    inst_off, inst_scale = inst_off[torder], inst_scale[torder]
    wb, wm, wt, wi, _, blas_root = W.wide_tables_instanced(
        tlas, blas, mt, inst_off, inst_scale, leaf)

    n = 4 * W.TILE
    o, d, tmin, tmax = _mixed_rays(n, lookfrom=(-300, 300, -300), seed=3)
    # retarget the coherent half at the instanced copies
    rng = np.random.default_rng(4)
    targets = rng.uniform(-150, 100, (n, 3)).astype(np.float32) * [1, 0.5, 1]
    d = jnp.asarray(targets) - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    h_x = intersect_instances(
        jnp.asarray(inst_off), jnp.asarray(inst_scale),
        jnp.asarray(blas_nodes), jnp.asarray(mt), o, d, tmin, tmax,
        leaf_size=leaf,
    )
    h_w = W.intersect_wide(
        jnp.asarray(wm), jnp.asarray(wb), jnp.asarray(wt), jnp.asarray(wi),
        mt.shape[0], o, d, tmin, tmax, leaf_size=leaf,
        blas_root=blas_root, has_inst=True,
    )
    va = np.asarray(h_x.valid)
    assert va.sum() > 500
    assert np.array_equal(va, np.asarray(h_w.valid))
    np.testing.assert_allclose(
        np.asarray(h_w.t)[va], np.asarray(h_x.t)[va], rtol=1e-4, atol=1e-3
    )
    assert np.array_equal(
        np.asarray(h_w.index)[va], np.asarray(h_x.index)[va]
    )


def test_onchip_bunny_render_finite():
    """One full shaded wave on-chip through whatever backend the scene pack
    selected (Pallas wide kernel on TPU): finite, non-black — guards the
    whole compiled path, not just traversal."""
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from jet_pbrt_tpu.models.render import render

    bunny = bunny_scene(use_bvh=True)
    assert bunny.meta.pallas_blas, "bunny BLAS should fit VMEM on TPU"
    img = np.asarray(render(bunny, 64, 64, spp=4, seed=0, max_depth=3))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
