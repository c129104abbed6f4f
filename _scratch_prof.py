"""Profile wide-BVH traversal on the bunny scene: primary vs bounce rays,
sorted vs unsorted, with per-tile pop stats."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod
from jet_pbrt_tpu.ops import wide_bvh, rng, sort as sort_ops
from bench import _morton_ids

W = 1024
N = W * W

scene = bunny_scene(bvh_leaf_size=16)
meta, pack = scene.meta, scene.pack
print("wide nodes:", pack.inst_w_meta.shape[0] // 8,
      "tris:", meta.n_blas_tris, "blas_root:", meta.wide_blas_root)

cam = camera_mod.make_camera(scene.camera.lookfrom, scene.camera.front,
                             scene.camera.vup, scene.camera.vfov, (W, W))
ids = jnp.asarray(_morton_ids(W))
keys = rng.lane_keys(0, 0, ids)
jitter = rng.camera_jitter(keys)
x = (ids % W).astype(jnp.float32) + jitter[:, 0]
y = (ids // W).astype(jnp.float32) + jitter[:, 1]
o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))
tmin = jnp.full((N,), 1e-3, jnp.float32)
tmax = jnp.full((N,), jnp.inf, jnp.float32)


def isect(o, d, tmin, tmax):
    return wide_bvh.intersect_wide(
        pack.inst_w_meta, pack.inst_w_bounds, pack.inst_w_tris,
        pack.inst_w_tbl, meta.n_blas_tris, o, d, tmin, tmax,
        leaf_size=meta.bvh_leaf_size, blas_root=meta.wide_blas_root,
        has_inst=True, with_stats=True)


isect_j = jax.jit(isect)


def bench(name, o, d, tmin, tmax, reps=3):
    (hit, stats) = isect_j(o, d, tmin, tmax)
    jax.block_until_ready(stats)
    t0 = time.perf_counter()
    for _ in range(reps):
        (hit, stats) = isect_j(o, d, tmin, tmax)
    jax.block_until_ready(stats)
    dt = (time.perf_counter() - t0) / reps
    s = np.asarray(stats)
    live = float(jnp.sum(jnp.isfinite(tmin)))
    print(f"{name}: {dt*1e3:8.2f} ms  {live/dt/1e6:8.2f} Mrays/s  "
          f"pops int mean={s[:,0].mean():7.1f} max={s[:,0].max():6d}  "
          f"leaf mean={s[:,1].mean():7.1f} max={s[:,1].max():6d}  "
          f"hit%={float(jnp.mean(hit.valid))*100:.1f}")
    return hit


hit = bench("primary (morton)", o, d, tmin, tmax)

# bounce rays: random cosine-ish directions from hit points
kb = jax.random.PRNGKey(1)
u = jax.random.uniform(kb, (N, 2))
phi = 2 * np.pi * u[:, 0]
ct = jnp.sqrt(u[:, 1])
st = jnp.sqrt(1 - u[:, 1] ** 2)
d2 = jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], axis=-1)
t_safe = jnp.where(hit.valid, hit.t, 1.0)
o2 = o + t_safe[:, None] * d
tmin2 = jnp.where(hit.valid, 1e-3, jnp.inf)
tmax2 = jnp.where(hit.valid, jnp.inf, -1.0)

bench("bounce unsorted   ", o2, d2, tmin2, tmax2)

world_lo = pack.world_center - pack.world_radius
world_inv = 1.0 / jnp.maximum(2.0 * pack.world_radius, 1e-12)
skey = sort_ops.ray_sort_key(hit.valid, o2, d2, world_lo,
                             jnp.broadcast_to(world_inv, (3,)))
perm = jnp.argsort(skey)
bench("bounce sorted     ", o2[perm], d2[perm], tmin2[perm], tmax2[perm])

# shadow-like rays: from hit points toward the area light (coherent dirs)
lt = jnp.asarray([0.0, 250.0, 0.0])
dl = lt[None, :] - o2
dln = dl / jnp.linalg.norm(dl, axis=-1, keepdims=True)
bench("shadowish unsorted", o2, dln, tmin2, tmax2)
