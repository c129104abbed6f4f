"""M3: does coherence sorting shrink unions on a fully-live incoherent wave?"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.ops import wide_bvh, sort as sort_ops

scene = bunny_scene(bvh_leaf_size=16)
meta, pack = scene.meta, scene.pack
N = 1024 * 1024
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
o = jax.random.uniform(k1, (N, 3), minval=-250, maxval=250) * jnp.asarray([[1., 0., 1.]])
d = jax.random.normal(k2, (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
d = d.at[:, 1].set(jnp.abs(d[:, 1]))
tmin = jnp.full((N,), 1e-3); tmax = jnp.full((N,), jnp.inf)
active = jnp.ones((N,), bool)

def isect(o, d, tmin, tmax):
    return wide_bvh.intersect_wide(
        pack.inst_w_meta, pack.inst_w_bounds, pack.inst_w_tris,
        pack.inst_w_tbl, meta.n_blas_tris, o, d, tmin, tmax,
        leaf_size=meta.bvh_leaf_size, blas_root=meta.wide_blas_root,
        has_inst=True, with_stats=True)
j = jax.jit(isect)

def run(name, o, d, tmin, tmax):
    hit, stats = j(o, d, tmin, tmax); jax.block_until_ready(stats)
    t0 = time.perf_counter()
    for _ in range(3): hit, stats = j(o, d, tmin, tmax)
    jax.block_until_ready(stats); dt = (time.perf_counter()-t0)/3
    s = np.asarray(stats)
    print(f"{name}: {dt*1e3:7.1f} ms {N/dt/1e6:7.2f} Mrays/s  pops int={s[:,0].mean():6.0f} leaf={s[:,1].mean():6.0f} total={s.sum()}")

run("unsorted                    ", o, d, tmin, tmax)

world_lo = pack.world_center - pack.world_radius
world_inv = jnp.broadcast_to(1.0 / jnp.maximum(2.0 * pack.world_radius, 1e-12), (3,))

# current key: octant-major then morton
key = sort_ops.ray_sort_key(active, o, d, world_lo, world_inv)
p = jnp.argsort(key)
run("octant-major, morton        ", o[p], d[p], tmin[p], tmax[p])

# origin-major (coarse 16^3 morton), then octant, then fine morton
q = jnp.clip(((o - world_lo) * world_inv * 128.0).astype(jnp.int32), 0, 127)
code = sort_ops.morton3(q)
coarse = sort_ops.morton3(q >> 3)  # 4^3... actually q>>3 in [0,15] -> morton 12 bits
octant = ((d[:, 0] > 0).astype(jnp.int32) | ((d[:, 1] > 0).astype(jnp.int32) << 1)
          | ((d[:, 2] > 0).astype(jnp.int32) << 2))
key2 = (coarse << 24) | (octant << 21) | code
p2 = jnp.argsort(key2)
run("origin-coarse, octant, fine ", o[p2], d[p2], tmin[p2], tmax[p2])

# finer direction: 6 bits of direction (octant + 3 more bits) then morton
dq = jnp.clip(((d * 0.5 + 0.5) * 4).astype(jnp.int32), 0, 3)
dir6 = (dq[:, 0] << 4) | (dq[:, 1] << 2) | dq[:, 2]
key3 = (dir6 << 21) | code
p3 = jnp.argsort(key3)
run("dir6-major, morton          ", o[p3], d[p3], tmin[p3], tmax[p3])
