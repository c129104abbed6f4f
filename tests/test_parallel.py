"""Sharded-rendering tests on the 8-virtual-device CPU mesh: sharded film
matches single-device render, spp-axis psum correctness, distributed
gradient fit."""
import numpy as np
import jax
import jax.numpy as jnp

from jet_pbrt_tpu.scene.scenes import cornell_box
from jet_pbrt_tpu.parallel.mesh import make_mesh
from jet_pbrt_tpu.parallel.render import render_sharded, build_sharded_render
from jet_pbrt_tpu.parallel.train import build_train_step
from jet_pbrt_tpu.models import camera as camera_mod
from jet_pbrt_tpu.diff import params as P


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"px": 8, "spp": 1}
    m2 = make_mesh(px=4, spp=2)
    assert m2.shape == {"px": 4, "spp": 2}


def test_sharded_matches_px_layouts():
    """Same seed, different mesh layouts -> identical images (the sample
    index / pixel id streams are layout-independent only along px)."""
    s = cornell_box(lambert_only=True, use_bvh=False)
    # clamped output bounds the heavy tail of direct emitter hits (L ~ 47)
    img_a = render_sharded(s, 16, 16, 64, make_mesh(px=8, spp=1), seed=5)
    img_b = render_sharded(s, 16, 16, 64, make_mesh(px=4, spp=1,
                                                    devices=jax.devices()[:4]),
                           seed=5)
    # px-sharding is pure data parallelism over pixels with per-shard keys —
    # fold_in(ip) differs between layouts, so compare statistically
    assert abs(img_a.mean() - img_b.mean()) / img_a.mean() < 0.05
    assert img_a.shape == img_b.shape == (16, 16, 3)
    assert np.all(np.isfinite(img_a))


def test_spp_axis_psum_means():
    """A (4,2) mesh averaging 8 spp equals statistically a (8,1) mesh."""
    s = cornell_box(lambert_only=True, use_bvh=False)
    img_a = render_sharded(s, 16, 16, 64, make_mesh(px=4, spp=2), seed=6)
    img_b = render_sharded(s, 16, 16, 64, make_mesh(px=8, spp=1), seed=6)
    assert abs(img_a.mean() - img_b.mean()) / img_a.mean() < 0.05


def test_sharded_grad_fit():
    """Distributed albedo fit on the 8-device mesh drives loss down."""
    s = cornell_box(lambert_only=True, use_bvh=False)
    mesh = make_mesh(px=4, spp=2)
    step, init, render, cam = build_train_step(
        s, mesh, 16, 16, 4, fields=("mat_c0",), lr=2.0, max_depth=2
    )
    target = render(s.pack, cam)
    # perturb the white-wall albedo
    wrong = s.pack.mat_c0.at[2].set(jnp.asarray([0.2, 0.9, 0.2]))
    params = {"mat_c0": wrong}
    losses = []
    for _ in range(25):
        params, loss = step(params, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1
    got = np.asarray(params["mat_c0"][2])
    assert np.allclose(got, [0.725, 0.71, 0.68], atol=0.1)
