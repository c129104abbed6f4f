"""Light-sampling tests: pdf measures, analytic direct lighting, one-sided
emission (math of reference src/light.h + src/shape.h sampling)."""
import numpy as np
import jax.numpy as jnp
import jax

from jet_pbrt_tpu.scene.builder import SceneBuilder
from jet_pbrt_tpu.ops import lights as L
from jet_pbrt_tpu.ops.linalg import PI


def simple_scene(light_kind="area_rect"):
    b = SceneBuilder("t")
    b.set_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0))
    white = b.add_matte((0.8, 0.8, 0.8))
    # floor plane (somewhere out of the way)
    b.add_rect_xz(-10, 10, -10, 10, -5, white)
    if light_kind == "area_rect":
        r = b.add_rect_xz(-1, 1, -1, 1, 2, white, flip_normal=True)
        b.add_area_light(r, (5.0, 5.0, 5.0))
    elif light_kind == "area_sphere":
        s = b.add_sphere((0, 4, 0), 1.0, white)
        b.add_area_light(s, (5.0, 5.0, 5.0))
    elif light_kind == "point":
        b.add_point_light((0, 2, 0), (5.0, 5.0, 5.0))
    elif light_kind == "env":
        b.add_env_light((0.3, 0.4, 0.5))
    return b.build(use_bvh=False)


def test_point_light_inverse_square():
    s = simple_scene("point")
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, -2.0, 0.0]])
    ls = L.sample_li(s.meta, s.pack, 0, pos, jnp.full((2, 2), 0.5))
    li = np.asarray(ls.li)
    # d=2 -> I/4 ; d=4 -> I/16 (reference: src/light.h:120)
    assert np.allclose(li[0], 5.0 / 4.0, rtol=1e-5)
    assert np.allclose(li[1], 5.0 / 16.0, rtol=1e-5)
    assert np.allclose(np.asarray(ls.pdf), 1.0)


def test_area_rect_pdf_solid_angle():
    """MC integral of pdf over its support must be ~1 in solid-angle measure:
    E_u[1] trivially; instead check pdf value at center: for a point straight
    under the light, pdf ~ dist^2/(cos*area) for points sampled near center."""
    s = simple_scene("area_rect")
    n = 200_000
    u = jax.random.uniform(jax.random.key(0), (n, 2))
    pos = jnp.zeros((n, 3))
    ls = L.sample_li(s.meta, s.pack, 0, pos, u)
    # estimator of the subtended solid angle: E[1/pdf]
    est = float(jnp.mean(1.0 / jnp.maximum(ls.pdf, 1e-9)))
    # analytic solid angle of a 2x2 square at height 2 over center
    # Omega = 4*arcsin( (a*b) / sqrt((a^2+4h^2)(b^2+4h^2)) ), a=b=2, h=2
    omega = 4 * np.arcsin(4.0 / np.sqrt(20.0 * 20.0))
    assert abs(est - omega) / omega < 5e-3
    # Li is one-sided: normal faces down (flip), shading point below => lit
    assert np.all(np.asarray(ls.li) > 0)


def test_area_rect_one_sided():
    s = simple_scene("area_rect")
    # shading point ABOVE the light (behind emitting side) gets black Li
    pos = jnp.asarray([[0.0, 4.0, 0.0]])
    ls = L.sample_li(s.meta, s.pack, 0, pos, jnp.asarray([[0.3, 0.6]]))
    assert np.allclose(np.asarray(ls.li), 0.0)


def test_sphere_cone_sampling_solid_angle():
    s = simple_scene("area_sphere")
    n = 200_000
    u = jax.random.uniform(jax.random.key(1), (n, 2))
    pos = jnp.zeros((n, 3))
    ls = L.sample_li(s.meta, s.pack, 0, pos, u)
    est = float(jnp.mean(1.0 / jnp.maximum(ls.pdf, 1e-9)))
    # analytic: cone solid angle = 2*pi*(1-cos_theta_max), sin = 1/4
    cos_max = np.sqrt(1 - (1.0 / 4.0) ** 2)
    omega = 2 * PI * (1 - cos_max)
    assert abs(est - omega) / omega < 5e-3
    # all sampled wi inside the cone
    cos_to_center = np.asarray(ls.wi)[:, 1]  # light straight up
    assert cos_to_center.min() >= cos_max - 1e-4


def test_env_light_pdf():
    s = simple_scene("env")
    n = 100_000
    u = jax.random.uniform(jax.random.key(2), (n, 2))
    ls = L.sample_li(s.meta, s.pack, 0, jnp.zeros((n, 3)), u)
    # E[1/pdf] over the lat-long warp = full sphere 4*pi
    est = float(jnp.mean(1.0 / jnp.maximum(ls.pdf, 1e-9)))
    assert abs(est - 4 * PI) / (4 * PI) < 5e-3
    le = L.env_radiance(s.meta, s.pack, 3)
    assert np.allclose(np.asarray(le), [0.3, 0.4, 0.5], atol=1e-6)


def test_pdf_li_matches_sample_rect():
    """pdf_li(wi) for sampled wi must equal the sampling pdf (rect light)."""
    s = simple_scene("area_rect")
    n = 10_000
    u = jax.random.uniform(jax.random.key(3), (n, 2))
    pos = jnp.zeros((n, 3))
    ls = L.sample_li(s.meta, s.pack, 0, pos, u)
    p2 = np.asarray(L.pdf_li(s.meta, s.pack, 0, pos, ls.wi))
    p1 = np.asarray(ls.pdf)
    ok = p1 > 0
    assert np.allclose(p1[ok], p2[ok], rtol=2e-3, atol=1e-4)
