"""Fresnel reflectance terms, batched.

Equivalents of the reference's free functions + Fresnel objects
(reference: src/bsdf.h:91-197, src/bsdf.cc:15-24). Object polymorphism
(FresnelDielectric / FresnelConductor / NoOp) becomes plain functions plus a
per-lane select in the BSDF kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from .linalg import safe_sqrt


def fresnel_dielectric(cos_theta_i: jnp.ndarray, eta_i, eta_t) -> jnp.ndarray:
    """Exact unpolarized dielectric Fresnel (reference: src/bsdf.h:91-122).

    cos_theta_i may be signed; a negative value means the ray is on the
    transmitted side and the etas are swapped, as in the reference.
    Returns scalar reflectance in [0, 1] with the same batch shape.
    """
    ci = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = ci > 0.0
    etaI = jnp.where(entering, eta_i, eta_t)
    etaT = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(ci)
    sin_t = etaI / etaT * safe_sqrt(1.0 - ci * ci)
    tir = sin_t >= 1.0
    ct = safe_sqrt(1.0 - sin_t * sin_t)
    r_parl = (etaT * ci - etaI * ct) / jnp.maximum(etaT * ci + etaI * ct, 1e-20)
    r_perp = (etaI * ci - etaT * ct) / jnp.maximum(etaI * ci + etaT * ct, 1e-20)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_theta_i: jnp.ndarray, eta_i, eta_t, k) -> jnp.ndarray:
    """Full complex-IOR conductor Fresnel, per channel
    (reference: src/bsdf.h:174-197). eta_t, k are [..., 3]; cos_theta_i [...]."""
    c = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    c2 = c * c
    s2 = 1.0 - c2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(0.0, t0 * t0 + 4.0 * eta2 * etak2))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.0, 0.5 * (a2b2 + t0)))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def schlick_fresnel(cos_theta: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
    """Schlick approximation (reference: src/bsdf.h:125-170, the isReflectance
    variant); kept for API parity, unused by the reference materials."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)[..., None]
    return f0 + (1.0 - f0) * (m ** 5)
