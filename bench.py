#!/usr/bin/env python
"""Benchmark: path-tracing throughput on one chip, TWO scene classes.

Prints TWO JSON lines:
  1. cornell box 512^2  (62 tris, brute-force intersection — VPU-bound)
  2. bunny 1024^2       (4 instanced bunnies, ~66k-tri shared BLAS,
                         MXU cull-sweep traversal + between-bounce ray
                         sorting, ops/sweep_bvh.py + ops/sort.py)

Each line: {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N/1e8}

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
import numpy as np


def _morton_ids(width: int) -> np.ndarray:
    """Pixel ids in 2D Morton order: a 128-lane ray packet becomes a compact
    square screen block instead of a scanline — fewer cull groups per
    packet in the sweep kernel (ops/sweep_bvh.py)."""
    xs = np.arange(width, dtype=np.uint32)

    def spread(v):
        v = v & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    gx, gy = np.meshgrid(xs, xs)
    code = spread(gx) | (spread(gy) << 1)
    flat = (gy * width + gx).ravel()
    return flat[np.argsort(code.ravel(), kind="stable")].astype(np.int32)


def bench_scene(scene, width: int, n_waves: int, max_depth: int = 5,
                morton: bool = False, sort_rays: bool | None = None) -> float:
    from jet_pbrt_tpu.models import camera as camera_mod
    from jet_pbrt_tpu.models.integrators import li_path
    from jet_pbrt_tpu.ops import rng

    meta = scene.meta
    n = width * width
    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (width, width),
    )
    ids = jnp.asarray(_morton_ids(width) if morton
                      else np.arange(n, dtype=np.int32))

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
                             with_stats=True, sort_rays=sort_rays)
        cls = jnp.stack([st["rays_primary"], st["rays_bounce"],
                         st["rays_shadow"]])
        return film + colors, rays + st["rays"], cls

    stepj = jax.jit(step, donate_argnums=(0,))
    film = jnp.zeros((n, 3), jnp.float32)
    rays = jnp.zeros((), jnp.float32)
    # warmup / compile
    film, rays, cls = stepj(film, rays, scene.pack, jnp.int32(0))
    jax.block_until_ready((film, rays))

    t0 = time.perf_counter()
    for s in range(1, n_waves + 1):
        film, rays, cls = stepj(film, jnp.zeros((), jnp.float32),
                                scene.pack, jnp.int32(s))
    jax.block_until_ready((film, rays))
    dt = time.perf_counter() - t0

    # `rays` holds one wave's count after the timing loop (reset per call)
    per_class = {
        k: round(float(v))
        for k, v in zip(("primary", "bounce", "shadow"), np.asarray(cls))
    }
    return float(rays) * n_waves / dt, per_class


def main() -> None:
    from jet_pbrt_tpu.scene.scenes import cornell_box, bunny_scene

    cornell = cornell_box(lambert_only=False, use_bvh=False)
    rps, cls = bench_scene(cornell, width=512, n_waves=32)
    print(json.dumps({
        "metric": "rays/s/chip (cornell path tracing)",
        "value": round(rps),
        "unit": "rays/s",
        "vs_baseline": round(rps / 100e6, 4),
        "rays_per_wave_by_class": cls,
    }), flush=True)

    bunny = bunny_scene()
    rps_b, cls_b = bench_scene(bunny, width=1024, n_waves=16, morton=True)
    print(json.dumps({
        "metric": "rays/s/chip (bunny 4x66k-tri instanced BVH path tracing)",
        "value": round(rps_b),
        "unit": "rays/s",
        "vs_baseline": round(rps_b / 100e6, 4),
        "rays_per_wave_by_class": cls_b,
    }), flush=True)


if __name__ == "__main__":
    main()
