"""Time li_path per max_depth to find where wave time goes."""
import time
import jax
import jax.numpy as jnp

from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod
from jet_pbrt_tpu.models.integrators import li_path
from jet_pbrt_tpu.ops import rng
from bench import _morton_ids

W = 1024
N = W * W
scene = bunny_scene(bvh_leaf_size=16)
meta, pack = scene.meta, scene.pack
cam = camera_mod.make_camera(scene.camera.lookfrom, scene.camera.front,
                             scene.camera.vup, scene.camera.vfov, (W, W))
ids = jnp.asarray(_morton_ids(W))
keys = rng.lane_keys(0, 0, ids)
jitter = rng.camera_jitter(keys)
x = (ids % W).astype(jnp.float32) + jitter[:, 0]
y = (ids // W).astype(jnp.float32) + jitter[:, 1]
o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))

for depth in [0, 1, 2, 3, 5]:
    f = jax.jit(lambda o, d, k, md=depth: li_path(
        meta, pack, o, d, k, md, with_stats=True))
    t0 = time.perf_counter()
    L, st = f(o, d, keys)
    jax.block_until_ready(L)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2):
        L, st = f(o, d, keys)
    jax.block_until_ready(L)
    dt = (time.perf_counter() - t0) / 2
    print(f"depth={depth}: wave={dt*1e3:8.1f} ms  rays={float(st['rays'])/1e6:.2f}M"
          f"  rays/s={float(st['rays'])/dt/1e6:7.2f}M  (compile {tc:.0f}s)",
          flush=True)
