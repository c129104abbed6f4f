"""Instanced-mesh (two-level BVH) end-to-end correctness: an instanced scene
renders the same image as the same geometry flattened into a triangle soup
(the reference's layout — it re-loads the bunny OBJ per copy,
reference: src/main.cc:94-107)."""
import numpy as np
import pytest

from jet_pbrt_tpu.scene.builder import SceneBuilder
from jet_pbrt_tpu.models.render import render


def _mesh(t=400, seed=11):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    return np.stack(
        [v0, v0 + rng.uniform(-0.35, 0.35, (t, 3)),
         v0 + rng.uniform(-0.35, 0.35, (t, 3))], axis=1,
    ).astype(np.float32)


INSTANCES = [((0, 0, 0), 1.0), ((2.5, 0, 0), 1.8), ((0, 2.5, 0), 0.7),
             ((-2.5, -1, 1), 1.3)]


def _build(instanced: bool):
    tris = _mesh()
    b = SceneBuilder("inst" if instanced else "flat")
    b.set_camera(lookfrom=(0, 0, 9), lookat=(0, 0, 0), vfov=60)
    b.add_env_light((0.2, 0.3, 0.5))
    mats = [b.add_matte((0.7, 0.3, 0.2)), b.add_matte((0.2, 0.6, 0.3))]
    light = b.add_matte((0.6, 0.6, 0.6))
    r = b.add_rect_xz(-2, 2, -2, 2, 6, light, flip_normal=True)
    b.add_area_light(r, (12.0, 12.0, 12.0))
    placed = [(off, s, mats[i % 2]) for i, (off, s) in enumerate(INSTANCES)]
    if instanced:
        b.add_instanced_mesh(tris, placed)
    else:
        for off, s, m in placed:
            b.add_mesh(tris, m, offset=off, scale=s)
    return b.build(use_bvh=not instanced)


@pytest.fixture(scope="module")
def scenes():
    return _build(True), _build(False)


def test_debug_normals_match(scenes):
    """Deterministic normal visualization: instanced == flattened
    (geometry, normals and materials resolve identically)."""
    s_inst, s_flat = scenes
    a = render(s_inst, 24, 24, spp=1, integrator="debug", clamp=False)
    b = render(s_flat, 24, 24, spp=1, integrator="debug", clamp=False)
    np.testing.assert_allclose(a, b, atol=1e-4)
    assert a.max() > 0.5  # instances actually visible


def test_path_trace_matches(scenes):
    """Same estimator through the instanced intersect path. Identical RNG
    streams on identical geometry; only float tie-breaks can differ."""
    s_inst, s_flat = scenes
    a = render(s_inst, 16, 16, spp=8, seed=3, max_depth=3, clamp=False)
    b = render(s_flat, 16, 16, spp=8, seed=3, max_depth=3, clamp=False)
    assert abs(a.mean() - b.mean()) / b.mean() < 0.02
    # pixelwise: allow rare tie-break flips, demand bulk equality
    close = np.isclose(a, b, rtol=1e-3, atol=2e-3).mean()
    assert close > 0.98, close


def test_instance_materials_resolve(scenes):
    """Each instance shades with its own material row."""
    s_inst, _ = scenes
    img = render(s_inst, 32, 32, spp=4, seed=1, max_depth=2, clamp=False)
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01


def test_sort_rays_bit_invisible(scenes):
    """sort_rays=True (the TPU production default) must be BIT-identical
    to the unsorted estimator: every per-lane computation — RNG streams,
    shading, gathers — travels with its lane through the permutations, and
    nothing reduces across lanes. A broken lane/key/unsort mapping flips
    pixels and fails exactly here (the machinery previously ran only on
    TPU, where no test asserted it)."""
    s_inst, _ = scenes
    a = render(s_inst, 20, 20, spp=4, seed=5, max_depth=4, clamp=False,
               sort_rays=True)
    b = render(s_inst, 20, 20, spp=4, seed=5, max_depth=4, clamp=False,
               sort_rays=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_occluded_sort_path_exact(scenes):
    """The shadow-batch permute -> any-hit -> unpermute path must return
    EXACTLY the unsorted result lane-for-lane (r4 VERDICT task 7: the sort
    machinery is now a parameter, so the CPU tier executes it — a wrong
    unpermute gather flips shadow bits and fails here)."""
    import jax.numpy as jnp
    from jet_pbrt_tpu.scene import pack as scene_pack

    s_inst, _ = scenes
    rng = np.random.default_rng(9)
    n = 700  # non-multiple of 128: exercises packet padding too
    p_from = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    p_to = jnp.asarray(
        rng.uniform(-2, 2, (n, 3)) * [1, 0, 1] + [0, 6, 0], jnp.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.6)
    occ_sorted = scene_pack.occluded(
        s_inst.meta, s_inst.pack, p_from, p_to, mask=mask, sort=True)
    occ_plain = scene_pack.occluded(
        s_inst.meta, s_inst.pack, p_from, p_to, mask=mask, sort=False)
    assert np.array_equal(np.asarray(occ_sorted), np.asarray(occ_plain))
    assert 0 < int(np.asarray(occ_sorted).sum()) < n  # non-trivial batch


def _build_emissive(instanced: bool):
    """A small emissive panel mesh (2 tris) instanced twice over a diffuse
    floor — the reference's CreateAreaLights-over-a-mesh case
    (reference: src/scene.cc:79-97)."""
    panel = np.array([
        [[-1, 3, -1], [1, 3, -1], [1, 3, 1]],
        [[-1, 3, -1], [1, 3, 1], [-1, 3, 1]],
    ], np.float32)
    b = SceneBuilder("em_inst" if instanced else "em_flat")
    b.set_camera(lookfrom=(0, 0.6, 8), lookat=(0, 1.2, 0), vfov=60)
    grey = b.add_matte((0.5, 0.5, 0.5))
    white = b.add_matte((0.73, 0.73, 0.73))
    b.add_rect_xz(-6, 6, -6, 6, 0, grey)
    rad = (8.0, 6.0, 4.0)
    placed = [((-1.5, 0, 0), 0.6, white, rad), ((1.8, 0.4, 0), 0.4, white, rad)]
    if instanced:
        b.add_instanced_mesh(panel, placed)
    else:
        for off, s, m, r in placed:
            refs = b.add_mesh(panel, m, offset=off, scale=s)
            b.add_area_light_mesh(refs, r)
    return b.build(use_bvh=False)


def test_emissive_instance_matches_flattened():
    """An emissive instance must light the scene like the same panels
    flattened into per-triangle area lights (both estimators are unbiased
    for direct light, so converged images agree)."""
    a = np.asarray(render(_build_emissive(True), 24, 24, spp=768, seed=3,
                          max_depth=2))
    bimg = np.asarray(render(_build_emissive(False), 24, 24, spp=768, seed=5,
                             max_depth=2))
    assert np.isfinite(a).all() and np.isfinite(bimg).all()
    assert a.mean() > 1e-3
    # global energy parity
    assert abs(a.mean() - bimg.mean()) / bimg.mean() < 0.06, (
        a.mean(), bimg.mean())
    # region-level parity (direct lighting dominates at depth 2)
    a4 = a.reshape(6, 4, 6, 4, 3).mean((1, 3))
    b4 = bimg.reshape(6, 4, 6, 4, 3).mean((1, 3))
    scale = b4.mean()
    assert (np.abs(a4 - b4) <= np.maximum(0.2 * b4, 0.2 * scale)).all(), (
        np.abs(a4 - b4).max() / scale)


def test_emissive_instance_mis_matches_nee():
    """mis=True over an emissive-instance scene must converge to the same
    image as the reference NEE estimator (r4 VERDICT task 5: pdf_li over
    instanced mesh lights, matching src/light.h:224-244 semantics through
    the instance transform — both estimators are unbiased)."""
    s = _build_emissive(True)
    nee = np.asarray(render(s, 24, 24, spp=768, seed=3, max_depth=2))
    mis = np.asarray(render(s, 24, 24, spp=768, seed=7, max_depth=2,
                            mis=True))
    assert np.isfinite(mis).all()
    assert abs(mis.mean() - nee.mean()) / nee.mean() < 0.06, (
        mis.mean(), nee.mean())
    m4 = mis.reshape(6, 4, 6, 4, 3).mean((1, 3))
    n4 = nee.reshape(6, 4, 6, 4, 3).mean((1, 3))
    scale = n4.mean()
    assert (np.abs(m4 - n4) <= np.maximum(0.2 * n4, 0.2 * scale)).all(), (
        np.abs(m4 - n4).max() / scale)


def test_emissive_instance_pdf_li_matches_sampler():
    """pdf_li(wi) must equal the pdf sample_li reports for the direction it
    sampled (consistency of the MIS weights)."""
    import jax.numpy as jnp
    from jet_pbrt_tpu.ops import lights as light_ops

    s = _build_emissive(True)
    li_idx = next(i for i, lm in enumerate(s.meta.lights)
                  if lm.shape_kind >= 4)
    rng = np.random.default_rng(5)
    shade = jnp.asarray(
        rng.uniform(-3, 3, (64, 3)) * np.array([1, 0, 1]) + [0, 0.02, 0],
        jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (64, 2)), jnp.float32)
    ls = light_ops.sample_li(s.meta, s.pack, li_idx, shade, u)
    pdf_re = light_ops.pdf_li(s.meta, s.pack, li_idx, shade, ls.wi)
    a = np.asarray(ls.pdf)
    b = np.asarray(pdf_re)
    ok = a > 0
    assert ok.mean() > 0.9
    # re-derived pdf agrees wherever the sampled triangle is the first hit
    # along wi (it can differ where another triangle of the same panel is
    # closer; demand bulk agreement)
    close = np.isclose(a[ok], b[ok], rtol=1e-3).mean()
    assert close > 0.9, close


def test_emissive_instance_visible_directly():
    """Rays that hit the emissive instance see its radiance: emitted()
    resolves inst_light through the TLAS instance permutation."""
    import jax.numpy as jnp
    from jet_pbrt_tpu.scene import pack as scene_pack

    s = _build_emissive(True)
    # straight up under each panel: hits the emitting (-y) face
    o = jnp.asarray([[-1.5, 0.01, 0.0], [1.8, 0.41, 0.0],
                     [5.0, 0.01, 5.0]], jnp.float32)
    d = jnp.asarray([[0, 1, 0], [0, 1, 0], [0, 1, 0]], jnp.float32)
    tmin = jnp.full((3,), 1e-3)
    tmax = jnp.full((3,), jnp.inf)
    hit = scene_pack.intersect(s.meta, s.pack, o, d, tmin, tmax)
    le = np.asarray(scene_pack.emitted(s.pack, hit))
    assert np.asarray(hit.valid)[0] and np.asarray(hit.valid)[1]
    assert np.asarray(hit.light_id)[0] >= 0
    assert np.asarray(hit.light_id)[1] >= 0
    np.testing.assert_allclose(le[0], [8.0, 6.0, 4.0], rtol=1e-5)
    np.testing.assert_allclose(le[1], [8.0, 6.0, 4.0], rtol=1e-5)
    assert not np.asarray(hit.valid)[2] or np.asarray(hit.light_id)[2] < 0


def test_multiple_instanced_mesh_families():
    """Two different meshes, each with its own instances and shared BLAS,
    must render like the fully flattened scene (r3 VERDICT task 5: the
    one-mesh-per-scene assert is gone)."""
    tris_a = _mesh(t=150, seed=21)
    tris_b = _mesh(t=90, seed=22) * 0.6

    def build(instanced: bool):
        b = SceneBuilder("multi_inst" if instanced else "multi_flat")
        b.set_camera(lookfrom=(0, 0, 9), lookat=(0, 0, 0), vfov=60)
        b.add_env_light((0.25, 0.3, 0.4))
        m0 = b.add_matte((0.7, 0.3, 0.2))
        m1 = b.add_matte((0.2, 0.6, 0.3))
        place_a = [((0, 0, 0), 1.0, m0), ((2.5, 0.5, 0), 1.4, m1)]
        place_b = [((-2.5, -0.5, 0.5), 1.0, m1), ((0, 2.6, -0.5), 1.7, m0)]
        if instanced:
            mesh_a, _ = b.add_instanced_mesh(tris_a, place_a)
            mesh_b, _ = b.add_instanced_mesh(tris_b, place_b)
            assert (mesh_a, mesh_b) == (0, 1)
        else:
            for off, s, m in place_a:
                b.add_mesh(tris_a, m, offset=off, scale=s)
            for off, s, m in place_b:
                b.add_mesh(tris_b, m, offset=off, scale=s)
        return b.build(use_bvh=not instanced)

    si, sf = build(True), build(False)
    assert len(si.meta.n_inst) == 2 and si.meta.n_inst == (2, 2)
    a = np.asarray(render(si, 48, 48, spp=1, integrator="debug"))
    bimg = np.asarray(render(sf, 48, 48, spp=1, integrator="debug"))
    np.testing.assert_allclose(a, bimg, rtol=1e-4, atol=1e-5)
    # and one shaded wave agrees statistically
    ia = np.asarray(render(si, 24, 24, spp=48, seed=2, max_depth=2))
    ib = np.asarray(render(sf, 24, 24, spp=48, seed=2, max_depth=2))
    assert abs(ia.mean() - ib.mean()) / ib.mean() < 0.08
