import time, numpy as np, jax, jax.numpy as jnp
from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod
from jet_pbrt_tpu.ops.pallas_bvh import intersect_bvh_pallas
scene = bunny_scene(); pack = scene.pack; meta = scene.meta
width = height = 256; n = width*height
cam = camera_mod.make_camera(scene.camera.lookfrom, scene.camera.front, scene.camera.vup, scene.camera.vfov, (width, height))
ids = np.arange(n)
def morton(x, y, bits=9):
    out = np.zeros_like(x)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2*b) | ((y >> b) & 1) << (2*b+1)
    return out
x = ids % width; y = ids // width
perm = np.argsort(morton(x, y))
xs = (x[perm]).astype(np.float32)+0.5; ys=(y[perm]).astype(np.float32)+0.5
o, d = camera_mod.generate_rays(cam, jnp.asarray(np.stack([xs,ys],-1)))
o = np.asarray(o); d = np.asarray(d)
# spread: 128 real rays per 1024-tile (dead pad), 8x more tiles
n_big = n*8
o2 = np.zeros((n_big,3), np.float32); d2 = np.tile(np.array([1,0,0],np.float32),(n_big,1))
tmax2 = np.full((n_big,), -1.0, np.float32)  # dead
for t in range(n//128):
    s = t*1024
    o2[s:s+128] = o[t*128:(t+1)*128]
    d2[s:s+128] = d[t*128:(t+1)*128]
    tmax2[s:s+128] = np.inf
tmin2 = np.full((n_big,), 1e-3, np.float32)
f = jax.jit(lambda o,d,tmin,tmax: intersect_bvh_pallas(pack.bvh_nodes_pl, pack.bvh_tris_pl, meta.n_bvh_nodes, meta.n_bvh_tris, o, d, tmin, tmax))
h = f(jnp.asarray(o2), jnp.asarray(d2), jnp.asarray(tmin2), jnp.asarray(tmax2)); jax.block_until_ready(h)
t0=time.perf_counter(); reps=3
for _ in range(reps): h = f(jnp.asarray(o2), jnp.asarray(d2), jnp.asarray(tmin2), jnp.asarray(tmax2))
jax.block_until_ready(h); dt=(time.perf_counter()-t0)/reps
print("128-ray packets (8x tiles): per-cast:", round(dt*1e3,2), "ms for", n, "real rays ->", round(n/dt/1e6,2), "M rays/s, hits:", int(h.valid.sum()))
