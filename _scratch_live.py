"""M1: fully-live incoherent rays through the wide kernel."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.ops import wide_bvh

scene = bunny_scene(bvh_leaf_size=16)
meta, pack = scene.meta, scene.pack
N = 1024 * 1024
k = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(k)
# origins on the floor region, random directions everywhere (upper hemisphere)
o = jax.random.uniform(k1, (N, 3), minval=-250, maxval=250) * jnp.asarray([[1., 0., 1.]])
d = jax.random.normal(k2, (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
d = d.at[:, 1].set(jnp.abs(d[:, 1]))
tmin = jnp.full((N,), 1e-3); tmax = jnp.full((N,), jnp.inf)

def isect(o, d, tmin, tmax):
    return wide_bvh.intersect_wide(
        pack.inst_w_meta, pack.inst_w_bounds, pack.inst_w_tris,
        pack.inst_w_tbl, meta.n_blas_tris, o, d, tmin, tmax,
        leaf_size=meta.bvh_leaf_size, blas_root=meta.wide_blas_root,
        has_inst=True, with_stats=True)
j = jax.jit(isect)
hit, stats = j(o, d, tmin, tmax); jax.block_until_ready(stats)
t0 = time.perf_counter()
for _ in range(3): hit, stats = j(o, d, tmin, tmax)
jax.block_until_ready(stats); dt = (time.perf_counter()-t0)/3
s = np.asarray(stats)
print(f"fully-live incoherent: {dt*1e3:.1f} ms  {N/dt/1e6:.2f} Mrays/s")
print(f"pops/tile int mean={s[:,0].mean():.0f} leaf mean={s[:,1].mean():.0f} "
      f"total pops={s.sum()}  us/pop={dt*1e6/s.sum():.3f}  hit%={float(jnp.mean(hit.valid))*100:.1f}")
