"""Sampling-warp tests: PDFs integrate to 1, sampled moments match analytic
values. The reference ships no tests (SURVEY.md §4); these validate the warp
math of reference src/sampling.h:17-137 statistically."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jet_pbrt_tpu.ops import sampling
from jet_pbrt_tpu.ops.linalg import PI


@pytest.fixture(scope="module")
def u():
    return jax.random.uniform(jax.random.key(7), (200_000, 2))


def test_uniform_disk_in_unit_disk(u):
    p = np.asarray(sampling.sample_uniform_disk(u))
    r2 = (p ** 2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    # uniform => E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3


def test_concentric_disk_uniform(u):
    p = np.asarray(sampling.sample_concentric_disk(u))
    r2 = (p ** 2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    assert abs(r2.mean() - 0.5) < 5e-3
    # symmetric in both axes
    assert abs(p[:, 0].mean()) < 5e-3
    assert abs(p[:, 1].mean()) < 5e-3


def test_cosine_hemisphere_moments(u):
    w = np.asarray(sampling.sample_cosine_hemisphere(u))
    assert np.all(w[:, 2] >= 0)
    assert np.allclose((w ** 2).sum(-1), 1.0, atol=1e-4)
    # pdf = cos/pi => E[cos theta] = 2/3
    assert abs(w[:, 2].mean() - 2.0 / 3.0) < 5e-3


def test_uniform_hemisphere_sphere(u):
    wh = np.asarray(sampling.sample_uniform_hemisphere(u))
    ws = np.asarray(sampling.sample_uniform_sphere(u))
    assert np.all(wh[:, 2] >= 0)
    assert abs(wh[:, 2].mean() - 0.5) < 5e-3     # E[cos] = 1/2 on hemisphere
    assert abs(ws[:, 2].mean()) < 5e-3           # E[z] = 0 on sphere
    assert np.allclose((ws ** 2).sum(-1), 1.0, atol=1e-4)


def test_uniform_cone(u):
    cos_max = jnp.float32(0.8)
    w = np.asarray(sampling.sample_uniform_cone(u, cos_max))
    assert w[:, 2].min() >= 0.8 - 1e-5
    # uniform in cos => E[cos] = (1+cos_max)/2
    assert abs(w[:, 2].mean() - 0.9) < 5e-3
    pdf = float(sampling.pdf_uniform_cone(cos_max))
    assert abs(pdf - 1.0 / (2 * PI * 0.2)) < 1e-6


def test_uniform_triangle_barycentric(u):
    b = np.asarray(sampling.sample_uniform_triangle(u))
    assert np.all(b >= 0) and np.all(b.sum(-1) <= 1 + 1e-6)
    # uniform barycentrics: E[b0] = E[b1] = 1/3
    assert abs(b[:, 0].mean() - 1 / 3) < 5e-3
    assert abs(b[:, 1].mean() - 1 / 3) < 5e-3


def test_mis_heuristics():
    f, g = jnp.float32(0.3), jnp.float32(0.7)
    bal = float(sampling.balance_heuristic(1, f, 1, g))
    pow2 = float(sampling.power_heuristic(1, f, 1, g))
    assert abs(bal - 0.3 / 1.0) < 1e-6
    assert abs(pow2 - 0.09 / (0.09 + 0.49)) < 1e-6
    # weights of complementary strategies sum to 1
    assert abs(
        float(sampling.power_heuristic(1, f, 1, g))
        + float(sampling.power_heuristic(1, g, 1, f))
        - 1.0
    ) < 1e-6


def test_pdf_normalization_hemisphere():
    # integrate cosine pdf over hemisphere by MC with uniform sampling
    u2 = jax.random.uniform(jax.random.key(3), (400_000, 2))
    w = sampling.sample_uniform_hemisphere(u2)
    pdf_cos = np.asarray(sampling.pdf_cosine_hemisphere(w[:, 2]))
    integral = pdf_cos.mean() * 2 * PI  # /(1/2pi) uniform pdf
    assert abs(integral - 1.0) < 2e-2
