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
