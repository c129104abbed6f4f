#!/usr/bin/env python
"""Benchmark: Cornell-box path tracing throughput on one chip.

Prints ONE JSON line:
  {"metric": "rays/s/chip (cornell path tracing)", "value": N,
   "unit": "rays/s", "vs_baseline": N / 100e6}

vs_baseline is against the driver-defined north-star target of 100M rays/s
per chip (BASELINE.md — the reference publishes no numbers). "Rays" counts
the casts the estimator actually needs: closest-hit casts on live path lanes
plus shadow casts with a non-zero potential contribution — the same rays a
scalar/CUDA tracer would trace for this estimator.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp



def main() -> None:
    from jet_pbrt_tpu.scene.scenes import cornell_box
    from jet_pbrt_tpu.models import camera as camera_mod
    from jet_pbrt_tpu.models.integrators import li_path
    from jet_pbrt_tpu.ops import rng

    width = height = 512
    max_depth = 5
    n = width * height
    scene = cornell_box(lambert_only=False, use_bvh=False)
    meta = scene.meta
    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (width, height),
    )
    ids = jnp.arange(n, dtype=jnp.int32)

    def step(film, rays, pack, s):
        """One spp wave with donated film accumulator. A Python loop of
        async-dispatched jitted waves pipelines better on this backend than
        lax.scan (measured ~30x; scan serializes against the remote host)."""
        keys = rng.lane_keys(0, s, ids)
        jitter = rng.camera_jitter(keys)
        x = (ids % width).astype(jnp.float32) + jitter[:, 0]
        y = (ids // width).astype(jnp.float32) + jitter[:, 1]
        o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))
        colors, st = li_path(meta, pack, o, d, keys, max_depth,
                             with_stats=True)
        return film + colors, rays + st["rays"]

    stepj = jax.jit(step, donate_argnums=(0, 1))
    film = jnp.zeros((n, 3), jnp.float32)
    rays = jnp.zeros((), jnp.float32)
    # warmup / compile
    film, rays = stepj(film, rays, scene.pack, jnp.int32(0))
    jax.block_until_ready((film, rays))

    n_waves = 32
    t0 = time.perf_counter()
    for s in range(1, n_waves + 1):
        film, rays = stepj(film, rays, scene.pack, jnp.int32(s))
    jax.block_until_ready((film, rays))
    dt = time.perf_counter() - t0

    # rays counter includes the warmup wave; scale it out
    rays_per_s = float(rays) * (n_waves / (n_waves + 1)) / dt
    print(json.dumps({
        "metric": "rays/s/chip (cornell path tracing)",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 100e6, 4),
    }))


if __name__ == "__main__":
    main()
