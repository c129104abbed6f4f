"""Bisect where bunny wave time goes: primaries vs bounces vs NEE shadow
passes vs shading glue. Async-pipelined timing like bench.py (the axon
tunnel adds ~20ms to any synchronous per-call measurement)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _morton_ids  # noqa: E402


def run(scene, width, n_waves, max_depth, nee, sort_rays=False):
    from jet_pbrt_tpu.models import camera as camera_mod
    from jet_pbrt_tpu.models.integrators import li_path
    from jet_pbrt_tpu.ops import rng

    meta = scene.meta
    n = width * width
    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (width, width))
    ids = jnp.asarray(_morton_ids(width))

    def step(film, rays, pack, s):
        keys = rng.lane_keys(0, s, ids)
        jitter = rng.camera_jitter(keys)
        x = (ids % width).astype(jnp.float32) + jitter[:, 0]
        y = (ids // width).astype(jnp.float32) + jitter[:, 1]
        o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))
        colors, st = li_path(meta, pack, o, d, keys, max_depth,
                             nee=nee, with_stats=True, sort_rays=sort_rays)
        return film + colors, rays + st["rays"]

    stepj = jax.jit(step, donate_argnums=(0, 1))
    film = jnp.zeros((n, 3), jnp.float32)
    rays = jnp.zeros((), jnp.float32)
    film, rays = stepj(film, rays, scene.pack, jnp.int32(0))
    jax.block_until_ready((film, rays))
    t0 = time.perf_counter()
    for s in range(1, n_waves + 1):
        film, rays = stepj(film, rays, scene.pack, jnp.int32(s))
    jax.block_until_ready((film, rays))
    dt = (time.perf_counter() - t0) / n_waves
    r = float(rays) * (n_waves / (n_waves + 1))
    return dt, r / n_waves


def main():
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene = bunny_scene(bvh_leaf_size=16)
    configs = [
        ("primary only, no NEE  ", 0, False, False),
        ("primary + NEE         ", 0, True, False),
        ("depth 2, no NEE       ", 2, False, False),
        ("depth 5, no NEE       ", 5, False, False),
        ("depth 5 + NEE (=bench)", 5, True, False),
        ("depth 5 + NEE + sort  ", 5, True, True),
    ]
    if len(sys.argv) > 2:
        pick = [int(c) for c in sys.argv[2].split(",")]
        configs = [configs[i] for i in pick]
    for label, depth, nee, sort in configs:
        dt, rays = run(scene, width, 6, depth, nee, sort)
        print(f"{label}: {dt*1e3:8.1f} ms/wave  {rays/1e6:6.2f} M rays/wave "
              f"-> {rays/dt/1e6:7.2f} M rays/s", flush=True)


if __name__ == "__main__":
    main()
