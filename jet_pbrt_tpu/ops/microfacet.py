"""Microfacet normal distributions: Trowbridge-Reitz (GGX) and Beckmann.

Equivalent of the reference's MicrofacetDistribution hierarchy
(reference: src/microfacet.h, src/microfacet.cc). Anisotropic (alpha_x,
alpha_y); visible-normal (VNDF) sampling is the default, matching the
reference's samplevis=true (reference: src/microfacet.h:51,70-71).

Design divergence (documented): the reference inverts the slope-space CDF
numerically (TrowbridgeReitzSample11 / BeckmannSample11 with polynomial fits
and Newton steps, reference: src/microfacet.cc:11-167, 256-357). For GGX we
instead use Heitz's 2018 spherical-cap VNDF construction — it samples the
*same* D_visible distribution (identical pdf) with ~10 flops and no data-
dependent iteration, which is exactly what the TPU VPU wants. Beckmann keeps
the analytic full-D sampling path (the reference's samplevis=false branch,
reference: src/microfacet.cc:212-232); no reference material instantiates
Beckmann (grep: materials use TrowbridgeReitz only, src/material.cc:26,40).

All directions are in the local shading frame (z = normal).
"""
from __future__ import annotations

import jax.numpy as jnp

from .linalg import PI, dot, normalize

GGX = 0
BECKMANN = 1


def roughness_to_alpha(roughness: jnp.ndarray) -> jnp.ndarray:
    """pbrt's log-polynomial remap (reference: src/microfacet.h:45-50)."""
    x = jnp.log(jnp.maximum(roughness, 1e-3))
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x ** 3
        + 0.000640711 * x ** 4
    )


def _trig(w):
    """Local-frame trig helpers (reference: src/bsdf.h:17-60)."""
    cos2 = jnp.clip(w[..., 2] ** 2, 0.0, 1.0)
    sin2 = 1.0 - cos2
    sin_theta = jnp.sqrt(sin2)
    safe_sin = jnp.maximum(sin_theta, 1e-12)
    cos_phi = jnp.where(sin_theta > 1e-12, w[..., 0] / safe_sin, 1.0)
    sin_phi = jnp.where(sin_theta > 1e-12, w[..., 1] / safe_sin, 0.0)
    return cos2, sin2, jnp.clip(cos_phi, -1, 1), jnp.clip(sin_phi, -1, 1)


def d_ggx(wh, ax, ay):
    """GGX NDF (reference: src/microfacet.cc:181-189)."""
    cos2, sin2, cphi, sphi = _trig(wh)
    tan2 = sin2 / jnp.maximum(cos2, 1e-12)
    e = (cphi ** 2 / jnp.maximum(ax ** 2, 1e-12) + sphi ** 2 / jnp.maximum(ay ** 2, 1e-12)) * tan2
    d = 1.0 / (PI * ax * ay * jnp.maximum(cos2, 1e-12) ** 2 * (1.0 + e) ** 2)
    return jnp.where(cos2 > 0.0, d, 0.0)


def lambda_ggx(w, ax, ay):
    """GGX masking Lambda, closed form (reference: src/microfacet.cc:202-210)."""
    cos2, sin2, cphi, sphi = _trig(w)
    abs_tan = jnp.sqrt(sin2 / jnp.maximum(cos2, 1e-12))
    alpha = jnp.sqrt(cphi ** 2 * ax ** 2 + sphi ** 2 * ay ** 2)
    a2t2 = (alpha * abs_tan) ** 2
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + a2t2))
    return jnp.where(cos2 > 1e-12, lam, 0.0)


def d_beckmann(wh, ax, ay):
    """Beckmann NDF (reference: src/microfacet.cc:172-179)."""
    cos2, sin2, cphi, sphi = _trig(wh)
    tan2 = sin2 / jnp.maximum(cos2, 1e-12)
    d = jnp.exp(
        -tan2 * (cphi ** 2 / jnp.maximum(ax ** 2, 1e-12) + sphi ** 2 / jnp.maximum(ay ** 2, 1e-12))
    ) / (PI * ax * ay * jnp.maximum(cos2, 1e-12) ** 2)
    return jnp.where(cos2 > 0.0, d, 0.0)


def lambda_beckmann(w, ax, ay):
    """Rational fit (reference: src/microfacet.cc:191-200)."""
    cos2, sin2, cphi, sphi = _trig(w)
    abs_tan = jnp.sqrt(sin2 / jnp.maximum(cos2, 1e-12))
    alpha = jnp.sqrt(cphi ** 2 * ax ** 2 + sphi ** 2 * ay ** 2)
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-12)
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    return jnp.where((a >= 1.6) | (cos2 <= 1e-12), 0.0, lam)


def d(kind, wh, ax, ay):
    return jnp.where(kind == GGX, d_ggx(wh, ax, ay), d_beckmann(wh, ax, ay))


def lam(kind, w, ax, ay):
    return jnp.where(kind == GGX, lambda_ggx(w, ax, ay), lambda_beckmann(w, ax, ay))


def g1(kind, w, ax, ay):
    """(reference: src/microfacet.h:22-25)"""
    return 1.0 / (1.0 + lam(kind, w, ax, ay))


def g(kind, wo, wi, ax, ay):
    """(reference: src/microfacet.h:26-28)"""
    return 1.0 / (1.0 + lam(kind, wo, ax, ay) + lam(kind, wi, ax, ay))


def _sample_ggx_vndf(wo_up, ax, ay, u):
    """Heitz 2018 spherical-cap VNDF sample; wo_up must have z >= 0."""
    vh = normalize(
        jnp.stack(
            [ax * wo_up[..., 0], ay * wo_up[..., 1], wo_up[..., 2]], axis=-1
        )
    )
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-20)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * PI * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    from .linalg import safe_sqrt

    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    pz = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + pz[..., None] * vh
    wh = normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)],
            axis=-1,
        )
    )
    return wh


def _sample_beckmann_full(ax, ay, u):
    """Analytic anisotropic full-D Beckmann sampling
    (reference: src/microfacet.cc:214-232, the samplevis=false branch)."""
    log_sample = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20))
    # anisotropic phi
    phi = jnp.arctan(ay / ax * jnp.tan(2.0 * PI * u[..., 1] + 0.5 * PI))
    phi = jnp.where(u[..., 1] > 0.5, phi + PI, phi)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    tan2 = -log_sample / (cp ** 2 / jnp.maximum(ax ** 2, 1e-12) + sp ** 2 / jnp.maximum(ay ** 2, 1e-12))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t ** 2))
    return jnp.stack([sin_t * cp, sin_t * sp, cos_t], axis=-1)


def sample_wh(kind, wo, ax, ay, u):
    """Sample a half-vector. GGX: VNDF with the hemisphere flip for wo.z<0
    (reference: src/microfacet.cc:326-357). Beckmann: full-D."""
    flip = wo[..., 2] < 0.0
    wo_up = jnp.where(flip[..., None], -wo, wo)
    wh_ggx = _sample_ggx_vndf(wo_up, ax, ay, u)
    wh_ggx = jnp.where(flip[..., None], -wh_ggx, wh_ggx)
    wh_beck = _sample_beckmann_full(ax, ay, u)
    return jnp.where((kind == GGX)[..., None], wh_ggx, wh_beck)


def pdf_wh(kind, wo, wh, ax, ay):
    """VNDF pdf for GGX, plain D·cosθ for Beckmann
    (reference: src/microfacet.cc:359-365)."""
    p_vis = (
        d(kind, wh, ax, ay)
        * g1(kind, wo, ax, ay)
        * jnp.abs(dot(wo, wh))
        / jnp.maximum(jnp.abs(wo[..., 2]), 1e-12)
    )
    p_full = d(kind, wh, ax, ay) * jnp.abs(wh[..., 2])
    return jnp.where(kind == GGX, p_vis, p_full)
