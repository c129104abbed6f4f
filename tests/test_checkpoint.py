"""Checkpoint/resume: resumed render is bit-identical to an uninterrupted
one (counter-based RNG makes render state = film + wave counter)."""
import numpy as np

from jet_pbrt_tpu.scene.builder import SceneBuilder
from jet_pbrt_tpu.utils.checkpoint import (
    render_resumable, save_render_state, load_render_state,
)


def small_scene():
    b = SceneBuilder("ckpt")
    b.set_camera(lookfrom=(0, 2, 5), lookat=(0, 0, 0), vfov=45)
    m = b.add_matte((0.6, 0.5, 0.4))
    b.add_rect_xz(-5, 5, -5, 5, 0, m)
    b.add_point_light((0, 3, 0), (20.0, 20.0, 20.0))
    return b.build(use_bvh=False)


def test_save_load_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    film = np.random.default_rng(0).random((16, 3)).astype(np.float32)
    save_render_state(p, film, 7, 42, params={"mat_c0": np.ones((2, 3))})
    f2, waves, seed, params = load_render_state(p)
    np.testing.assert_array_equal(film, f2)
    assert waves == 7 and seed == 42
    np.testing.assert_array_equal(params["mat_c0"], np.ones((2, 3)))


def test_resume_matches_straight_render(tmp_path):
    scene = small_scene()
    p_full = str(tmp_path / "full.npz")
    p_resume = str(tmp_path / "resume.npz")

    img_full = render_resumable(scene, 8, 8, spp=6, checkpoint_path=p_full,
                                checkpoint_every=100, seed=3, clamp=False)

    # interrupted run: 3 waves, checkpointed, then resumed for the rest
    render_resumable(scene, 8, 8, spp=3, checkpoint_path=p_resume,
                     checkpoint_every=1, seed=3, clamp=False)
    # overwrite waves counter: the 3-spp run saved waves_done=3; resuming
    # with spp=6 continues at wave 3
    img_resumed = render_resumable(scene, 8, 8, spp=6,
                                   checkpoint_path=p_resume,
                                   checkpoint_every=100, seed=3, clamp=False)
    np.testing.assert_allclose(img_full, img_resumed, rtol=1e-6, atol=1e-7)
