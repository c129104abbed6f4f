"""Counter-based random streams for path tracing.

TPU-native replacement for the reference's stateful mt19937_64 samplers
(reference: src/sampler.h:16-185). Instead of mutable per-thread generator
state — which cannot exist inside a traced XLA program — every random number
is a pure function of (seed, sample_index, purpose, lane): we derive a
threefry key per (wave, purpose) and draw the whole wave's uniforms as one
batched tensor. This makes any (pixel, sample, bounce) recomputable, enables
checkpoint/resume by storing only integer counters, and — unlike the
reference, whose Clone() reuses seed 1234 so all tiles share one stream
(reference: src/sampler.h:135-138, src/integrator.cc:66) — gives every pixel,
sample and bounce an independent stream.

Stream layout per path vertex (one "bounce" of the iterative path integrator,
reference: src/integrator.cc:316-403):

    [0]              lobe/material stochastic pick (plastic Qd pick,
                     reference: src/material.cc:12-29)
    [1 : 1+2L]       2 uniforms per scene light for NEE Sample_Li
    [1+2L : 3+2L]    2 uniforms for BSDF sampling
    [3+2L]           russian-roulette coin
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Purpose tags folded into the wave key.
PURPOSE_CAMERA = 0
PURPOSE_PATH = 1
PURPOSE_PIXEL_SHUFFLE = 2


def wave_key(seed: int, sample_index) -> jax.Array:
    """Key for one wave = one sample-per-pixel pass over a pixel batch."""
    return jax.random.fold_in(jax.random.key(seed), sample_index)


def camera_jitter(key: jax.Array, n: int, sampler: str = "random",
                  sample_index=None, spp: int | None = None) -> jnp.ndarray:
    """In-pixel jitter [n, 2], the analogue of GetCameraSample's
    (x+u, y+u) offset (reference: src/sampler.h:148-155).

    sampler:
      "random"     — i.i.d. uniforms (reference FRandomSampler)
      "stratified" — jittered stratification of the pixel over the spp's
                     ceil(sqrt(spp))^2 grid. The reference declares
                     FStratifiedSampler but stubs it to random
                     (reference: src/sampler.h:158-185 'TODO'); this is the
                     real thing.
      "debug"      — constant 0.5 (reference FDebugSampler,
                     src/sampler.h:109-127, minus its missing-return bug)
    """
    k = jax.random.fold_in(key, PURPOSE_CAMERA)
    if sampler == "debug":
        return jnp.full((n, 2), 0.5, jnp.float32)
    u = jax.random.uniform(k, (n, 2), dtype=jnp.float32)
    if sampler == "stratified":
        assert spp is not None and sample_index is not None
        g = int(np.ceil(np.sqrt(spp)))
        stratum = jnp.asarray(sample_index) % (g * g)
        sx = (stratum % g).astype(jnp.float32)
        sy = (stratum // g).astype(jnp.float32)
        return (jnp.stack([sx, sy], axis=-1) + u) / g
    return u


def debug_path_uniforms(n: int, max_depth: int, n_lights: int) -> jnp.ndarray:
    """All-0.5 path uniforms — FDebugSampler semantics for the transport
    streams."""
    s = 4 + 2 * n_lights
    return jnp.full((n, max_depth + 1, s), 0.5, jnp.float32)


def path_uniforms(key: jax.Array, n: int, max_depth: int, n_lights: int) -> jnp.ndarray:
    """All per-vertex uniforms for a wave in one threefry call.

    Returns u[n, max_depth + 1, S] with S = 4 + 2 * n_lights following the
    module-docstring layout. Drawing the whole tensor up front is the
    TPU-idiomatic replacement for the reference's sequential GetFloat()
    calls: one big fused kernel instead of stateful scalar draws.
    """
    k = jax.random.fold_in(key, PURPOSE_PATH)
    s = 4 + 2 * n_lights
    return jax.random.uniform(k, (n, max_depth + 1, s), dtype=jnp.float32)


def stream_lobe(u_vertex: jnp.ndarray) -> jnp.ndarray:
    """u_vertex is [..., S]; scalar lobe-pick uniform."""
    return u_vertex[..., 0]


def stream_nee(u_vertex: jnp.ndarray, light_index: int) -> jnp.ndarray:
    """2-vector of uniforms for NEE of light `light_index` (static)."""
    return u_vertex[..., 1 + 2 * light_index : 3 + 2 * light_index]


def stream_bsdf(u_vertex: jnp.ndarray, n_lights: int) -> jnp.ndarray:
    base = 1 + 2 * n_lights
    return u_vertex[..., base : base + 2]


def stream_rr(u_vertex: jnp.ndarray, n_lights: int) -> jnp.ndarray:
    return u_vertex[..., 3 + 2 * n_lights]
