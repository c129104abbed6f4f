"""On-chip (non-interpret) Pallas packet-kernel regression tests.

These run the REAL pltpu lowering at bunny scale and assert parity with the
XLA skip-link walk — the class of bug they pin down is on-chip-only
numerics/control-flow divergence (e.g. the bf16 miss-link rounding hang,
commit 084c54d) that interpret-mode tests (tests/test_pallas_bvh.py) cannot
see. They skip unless JAX has a real TPU backend; run them in the bench
environment with:

    JET_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

(JET_TPU_TESTS=1 tells conftest.py not to force the virtual CPU mesh.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-chip Pallas regression needs a real TPU backend",
)


@pytest.fixture(scope="module")
def bunny():
    from jet_pbrt_tpu.scene.scenes import bunny_scene

    return bunny_scene(use_bvh=True)


def _camera_rays(scene, n):
    """Primary rays (coherent) plus scrambled copies (incoherent) — the
    incoherent half is what historically broke on-chip."""
    from jet_pbrt_tpu.models import camera as camera_mod

    w = int(np.sqrt(n))
    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (w, w),
    )
    ids = jnp.arange(w * w, dtype=jnp.int32)
    px = (ids % w).astype(jnp.float32) + 0.5
    py = (ids // w).astype(jnp.float32) + 0.5
    o, d = camera_mod.generate_rays(cam, jnp.stack([px, py], axis=-1))
    rng = np.random.default_rng(0)
    perm = rng.permutation(w * w)
    o2 = jnp.asarray(np.asarray(o)[perm])
    d2 = jnp.asarray(np.asarray(d)[perm])
    # jitter the scrambled half so packets see genuinely divergent rays
    d2 = d2 + 0.05 * jnp.asarray(rng.normal(size=d2.shape).astype(np.float32))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    return (jnp.concatenate([o, o2]), jnp.concatenate([d, d2]))


def test_onchip_instanced_packet_matches_xla(bunny):
    """Real-kernel TLAS/BLAS traversal == XLA per-instance walk on the
    actual 4-bunny scene (~66k shared-BLAS triangles)."""
    from jet_pbrt_tpu.ops.bvh import intersect_instances
    from jet_pbrt_tpu.ops.pallas_bvh import intersect_instanced_pallas

    p, m = bunny.pack, bunny.meta
    assert m.pallas_blas, "bunny BLAS should fit VMEM on TPU"
    o, d = _camera_rays(bunny, 64 * 64)
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), jnp.inf)

    # on TPU the builder keeps only the planar tables (one layout in HBM);
    # recover row layout for the XLA reference walk
    blas_nodes = jnp.asarray(np.asarray(p.blas_nodes_pl).T[: m.n_blas_nodes])
    blas_tris = jnp.asarray(np.asarray(p.blas_tris_pl).T[: m.n_blas_tris])
    h_x = intersect_instances(
        p.inst_off, p.inst_scale, blas_nodes, blas_tris, o, d, tmin, tmax
    )
    h_p = intersect_instanced_pallas(
        p.tlas_pl, p.blas_nodes_pl, p.blas_tris_pl,
        p.inst_pl, m.n_tlas_nodes, m.n_blas_nodes,
        m.n_blas_tris, o, d, tmin, tmax, interpret=False,
    )
    va = np.asarray(h_x.valid)
    assert va.sum() > 500  # most primary rays hit a bunny or the floor? env-only scene: bunnies
    assert np.array_equal(va, np.asarray(h_p.valid))
    np.testing.assert_allclose(
        np.asarray(h_p.t)[va], np.asarray(h_x.t)[va], rtol=1e-4, atol=1e-3
    )
    assert np.array_equal(
        np.asarray(h_p.index)[va], np.asarray(h_x.index)[va]
    )


def test_onchip_single_level_packet_matches_xla():
    """Real-kernel single-BVH traversal parity on a random 4k-tri soup."""
    from jet_pbrt_tpu.scene.builder import SceneBuilder
    from jet_pbrt_tpu.ops.bvh import intersect_bvh
    from jet_pbrt_tpu.ops.pallas_bvh import intersect_bvh_pallas, TILE

    rng = np.random.default_rng(5)
    t = 4000
    base = rng.uniform(-10, 10, (t, 1, 3)).astype(np.float32)
    tris = base + rng.uniform(-0.6, 0.6, (t, 3, 3)).astype(np.float32)
    b = SceneBuilder("onchip")
    b.set_camera(lookfrom=(0, 0, 40), lookat=(0, 0, 0))
    b.add_mesh(tris, b.add_matte((0.5, 0.5, 0.5)))
    scene = b.build(use_bvh=True)
    pack, meta = scene.pack, scene.meta
    assert meta.pallas_bvh

    n = 4 * TILE + 33
    o = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, 12.0])
    d = jax.random.normal(jax.random.key(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), jnp.inf)

    h_p = intersect_bvh_pallas(
        pack.bvh_nodes_pl, pack.bvh_tris_pl,
        meta.n_bvh_nodes, meta.n_bvh_tris,
        o, d, tmin, tmax, interpret=False,
    )
    # recover the row layout for the XLA reference walk
    nodes = jnp.asarray(np.asarray(pack.bvh_nodes_pl).T[: meta.n_bvh_nodes])
    tris_t = jnp.asarray(np.asarray(pack.bvh_tris_pl).T[: meta.n_bvh_tris])
    h_x = intersect_bvh(nodes, tris_t, o, d, tmin, tmax)
    assert np.array_equal(np.asarray(h_p.valid), np.asarray(h_x.valid))
    ok = np.asarray(h_p.valid)
    assert ok.sum() > 100
    np.testing.assert_allclose(
        np.asarray(h_p.t)[ok], np.asarray(h_x.t)[ok], rtol=1e-4, atol=1e-3
    )
    assert np.array_equal(
        np.asarray(h_p.index)[ok], np.asarray(h_x.index)[ok]
    )


def test_onchip_bunny_render_finite(bunny):
    """One full shaded wave on-chip through whatever backend the scene pack
    selected (Pallas on TPU): finite, non-black, bunny silhouettes darker
    than env — guards the whole compiled path, not just traversal."""
    from jet_pbrt_tpu.models.render import render

    img = np.asarray(render(bunny, 64, 64, spp=4, seed=0, max_depth=3))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
